"""Multimodal (binary-payload) column handling (SURVEY.md §2.2 LLM ops).

Pattern for image/audio/video at 100 TB: the payload is an opaque
BinaryType column + a typed metadata struct; decode / feature-extract runs
as Arrow-batched pandas iterators (mapInPandas) so bytes move executor-side
in columnar batches and never touch the driver. The actual media decode is
STUBBED (no image/audio libraries in this container — decode_payload raises
NotImplementedError unless the deterministic fake is requested); everything
Spark-side — schema, batching, partitioning, UDF signatures — is real and
tested.

Reference parity: the reference treats Kafka values as opaque bytes +
external schema (application.yml:11-12) — the same opaque-payload pattern
applied here to media columns; [EXT] north-star surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def decode_payload(payload: bytes, fake: bool = False) -> dict:
    """Decode one media payload into features.

    Real decode (PIL / librosa / ffmpeg) is unavailable in this
    environment — STUB. The deterministic fake derives pseudo-dimensions
    from the payload bytes so the pipeline shape is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    h = 0
    for b in payload[:16]:
        h = (h * 31 + b) & 0x7FFFFFFF
    return {"width": 64 + h % 1024, "height": 64 + (h // 1024) % 1024}


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: one pandas frame per batch, payload bytes in,
    feature columns out. This is the exact shape a real image decode
    (resize / frame-sample) plugs into — swap decode_payload's body."""
    for pdf in it:
        feats = [decode_payload(p, fake=True) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
            }
        )


@query(
    "mm_binary_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5,
               substring(md5(text), 1, 8) AS fp8,
               lang AS media_kind
        FROM documents WHERE doc_id < 200
    """,
    tags=("llm", "multimodal"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload metadata extraction: byte length + content hash of a
    BinaryType column (text bytes stand in for media bytes — the plan is
    identical for real blobs). Pure column expressions; nothing decodes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.substring(F.md5(payload), 1, 8).alias("fp8"),
        F.col("lang").alias("media_kind"),
    )


@query("mm_decode_features", oracle=None, tags=("llm", "multimodal"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → features via Arrow-batched mapInPandas (the decode
    body is the stub; the batching / schema / partition plumbing is the
    production shape). Rows-only: the fake features are engine-defined."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payloads.mapInPandas(
        _decode_batches, schema="doc_id long, n_bytes long, width long, height long"
    )


def resize_image(payload: bytes, target_w: int, target_h: int, fake: bool = False) -> bytes:
    """Resize one image payload to (target_w, target_h).

    Real resize (PIL.Image.resize / cv2) is unavailable here — STUB. The
    deterministic fake emits a payload whose length encodes the target
    box so batch-shape tests can assert the transform ran per-row."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/cv2, not present in this environment; "
            "pass fake=True for the deterministic stub"
        )
    # deterministic: first 8 bytes of source + the box, so output depends
    # on both input content and parameters
    return payload[:8] + target_w.to_bytes(2, "big") + target_h.to_bytes(2, "big")


def sample_frames(payload: bytes, every_n: int, fake: bool = False) -> list[bytes]:
    """Sample every Nth frame from one video payload.

    Real frame extraction (ffmpeg/PyAV) is unavailable here — STUB. The
    deterministic fake chunks the payload into fixed 32-byte pseudo-frames
    and keeps every Nth, preserving order."""
    if not fake:
        raise NotImplementedError(
            "frame sampling requires ffmpeg/PyAV, not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    frames = [payload[i : i + 32] for i in range(0, len(payload), 32)]
    return frames[::every_n]


@query("mm_resize_batch", oracle=None, tags=("llm", "multimodal"))
def mm_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image resize through mapInPandas: payload in, resized payload
    + old/new byte sizes out — the thumbnail/normalize step of a vision
    training pipeline. The Arrow plumbing (binary column in, binary column
    out, no driver transfer) is the production shape; the resize kernel is
    the env-gated stub. Rows-only (stub output is engine-defined)."""

    def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [resize_image(p, 224, 224, fake=True) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": [len(p) for p in pdf["payload"]],
                    "resized": out,
                    "resized_bytes": [len(r) for r in out],
                }
            )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payloads.mapInPandas(
        resize_batches,
        schema="doc_id long, orig_bytes long, resized binary, resized_bytes long",
    )


@query(
    "mm_frame_sample",
    oracle="""
        WITH chunks AS (
            SELECT doc_id,
                   CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT) AS n_frames
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id, n_frames,
               CAST(ceil(n_frames / 4.0) AS BIGINT) AS n_sampled
        FROM chunks
    """,
    tags=("llm", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through mapInPandas: payload → every-4th
    pseudo-frame, exploded one row per kept frame then re-counted — the
    clip-sampling step of a video training pipeline. The fake framer is
    deterministic (fixed 32-byte chunks), so frame COUNTS are
    oracle-checkable even though the kernel is stubbed: n_frames =
    ceil(bytes/32), n_sampled = ceil(n_frames/4). At 100 TB the explode
    multiplies rows executor-side only; frames never visit the driver."""

    def frame_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            frames = [sample_frames(p, 4, fake=True) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": [(len(p) + 31) // 32 for p in payloads],
                    "frames": frames,
                }
            )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    sampled = payloads.mapInPandas(
        frame_batches, schema="doc_id long, n_frames long, frames array<binary>"
    )
    return (
        # explode_outer + count(frame): an empty/NULL payload yields zero
        # frames but must still emit a (doc_id, 0, 0) row like the oracle
        sampled.select(
            "doc_id", "n_frames", F.explode_outer("frames").alias("frame")
        )
        .groupBy("doc_id", "n_frames")
        .agg(F.count("frame").alias("n_sampled"))
        .select("doc_id", "n_frames", "n_sampled")
    )
