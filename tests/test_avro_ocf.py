"""Avro Object Container File codec (functions/avro_ocf) spec conformance.

The writer/reader pair is pure Python from the public Avro 1.11 spec's
"Object Container Files" section; these tests pin the byte layout
independently of the reader (magic, zigzag-varint longs, metadata map,
sync-marker placement) so writer and reader can't drift in lockstep, plus
roundtrip and corruption behavior.
"""

from __future__ import annotations

import io
import json

import pytest

from avro_topic_replication_spark.functions.avro_codec import _read_long
from avro_topic_replication_spark.functions.avro_ocf import (
    MAGIC,
    read_ocf,
    write_ocf,
)

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Foo",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "name", "type": ["null", "string"], "default": None},
            {"name": "score", "type": "double"},
        ],
    }
)


def _recs(n):
    return [
        {"id": str(i), "name": None if i % 3 == 0 else f"n{i}", "score": i * 0.5}
        for i in range(n)
    ]


def test_roundtrip_multi_block():
    recs = _recs(2500)
    blob = write_ocf(recs, SCHEMA, tag="t", block_size=1000)
    schema_json, out = read_ocf(blob)
    assert out == recs
    assert json.loads(schema_json) == json.loads(SCHEMA)


def test_header_layout_per_spec():
    blob = write_ocf(_recs(3), SCHEMA, tag="x")
    buf = io.BytesIO(blob)
    assert buf.read(4) == MAGIC
    # metadata: map<bytes> — one block of 2 entries (avro.schema, avro.codec)
    assert _read_long(buf) == 2
    meta = {}
    for _ in range(2):
        k = buf.read(_read_long(buf)).decode()
        meta[k] = buf.read(_read_long(buf))
    assert _read_long(buf) == 0  # end-of-map
    assert meta["avro.codec"] == b"null"
    assert json.loads(meta["avro.schema"].decode()) == json.loads(SCHEMA)
    sync = buf.read(16)
    # first data block: count, byteSize, payload, then the SAME sync marker
    count = _read_long(buf)
    size = _read_long(buf)
    assert count == 3
    buf.read(size)
    assert buf.read(16) == sync
    assert buf.read() == b""  # exactly one block for 3 records


def test_deterministic_bytes():
    assert write_ocf(_recs(10), SCHEMA, tag="a") == write_ocf(
        _recs(10), SCHEMA, tag="a"
    )
    # distinct partition tags produce distinct sync markers
    assert write_ocf(_recs(10), SCHEMA, tag="a") != write_ocf(
        _recs(10), SCHEMA, tag="b"
    )


def test_empty_file_roundtrips():
    blob = write_ocf([], SCHEMA, tag="e")
    schema_json, out = read_ocf(blob)
    assert out == []


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"NOPE" + b"\x00" * 32)


def test_sync_corruption_detected():
    blob = bytearray(write_ocf(_recs(5), SCHEMA, tag="s"))
    blob[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bytes(blob))


def test_unsupported_codec_gated():
    blob = write_ocf(_recs(2), SCHEMA, tag="c")
    # splice the metadata value "null" -> "noll" is still 4 bytes: rewrite
    # the codec entry by rebuilding the header is overkill — just patch the
    # bytes of the value in place (it appears exactly once in the header).
    patched = blob.replace(b"\x08null", b"\x08zstd", 1)
    assert patched != blob
    with pytest.raises(NotImplementedError, match="codec"):
        read_ocf(patched)
