"""Avro Object Container File (OCF) writer/reader, pure Python from the
public Avro 1.11 spec ("Object Container Files" section) — no fastavro,
no spark-avro jar.

Layout (spec): 4-byte magic ``Obj\\x01``; file metadata as an Avro
``map<bytes>`` (must carry ``avro.schema``; ``avro.codec`` defaults to
``null``); a 16-byte sync marker; then data blocks of
``(long count, long byteSize, <count serialized objects>, sync)`` until
EOF. Longs are zigzag varints — the same primitives functions/avro_codec
implements for the Confluent wire format (that module frames single
records with a registry schema id; this one frames self-describing files,
the HDFS/S3-native Avro layout Spark's `format("avro")` reads).

Only the ``null`` codec is implemented (deflate/snappy are optional per
spec); the writer emits deterministic bytes (fixed sync derived from the
schema + a caller tag) so file fixtures are reproducible across runs.
"""

from __future__ import annotations

import hashlib
import io
import json

from .avro_codec import _read_long, _write_long, encode, parse_schema

MAGIC = b"Obj\x01"


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _sync_marker(schema_json: str, tag: str) -> bytes:
    return hashlib.md5((schema_json + "|" + tag).encode()).digest()


def write_ocf(records, schema, tag: str = "", block_size: int = 1000) -> bytes:
    """Serialize ``records`` into one OCF byte string under ``schema``.

    ``tag`` seeds the (deterministic) sync marker so distinct partition
    files differ; ``block_size`` records per data block (spec allows any
    positive count per block)."""
    schema_json = json.dumps(schema) if not isinstance(schema, str) else schema
    parsed = parse_schema(schema_json)
    sync = _sync_marker(schema_json, tag)
    out = io.BytesIO()
    out.write(MAGIC)
    # file metadata: map<bytes> — one block of entries, then end-of-map 0
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    buf: list[bytes] = []
    for rec in records:
        buf.append(encode(rec, parsed))
        if len(buf) >= block_size:
            _flush_block(out, buf, sync)
            buf = []
    if buf:
        _flush_block(out, buf, sync)
    return out.getvalue()


def _flush_block(out: io.BytesIO, encoded: list[bytes], sync: bytes) -> None:
    body = b"".join(encoded)
    _write_long(out, len(encoded))
    _write_long(out, len(body))
    out.write(body)
    out.write(sync)


def read_ocf(data: bytes):
    """Parse one OCF byte string → (schema_json, list of records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise NotImplementedError(f"OCF codec {codec!r} not supported (spec optional)")
    schema_json = meta["avro.schema"].decode()
    parsed = parse_schema(schema_json)
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        block = io.BytesIO(buf.read(size))
        for _ in range(count):
            records.append(_decode_stream(block, parsed))
        if buf.read(16) != sync:
            raise ValueError("OCF sync marker mismatch (corrupt block boundary)")
    return schema_json, records


def _decode_stream(block: io.BytesIO, parsed):
    """Decode one record from a shared block buffer (objects are
    concatenated without per-record length prefixes, so the codec's
    single-datum ``decode`` is driven through a shared stream)."""
    from .avro_codec import _decode

    return _decode(block, parsed)
