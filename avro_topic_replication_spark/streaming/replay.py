"""Replay the `events` table as a Structured Streaming source.

The driver testdata is bounded parquet; Structured Streaming needs a
file-stream source. ``events_stream`` replays events.parquet through
``readStream`` with the same ns→µs timestamp normalization the batch
catalog applies, and ``run_to_memory`` executes any streaming DataFrame
to completion (Trigger.AvailableNow) into a memory sink and hands back
the result as a batch DataFrame — which is how the driver's correctness
harness (batch-only) can exercise streaming operators.

Scale note: locally this is one micro-batch over one file; on a cluster
the identical plan runs over a Kafka source or a file drop-box with
per-trigger incremental offsets — nothing in the operator chain changes.
"""

from __future__ import annotations

import hashlib
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_runtime_conf

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def scratch_tag(sf_dir: str, tables: "tuple[str, ...]") -> str:
    """Collision-safe scratch cache tag for fixtures derived from ``sf_dir``.

    ``basename(sf_dir)`` alone is NOT a safe cache key: pytest tmp basenames
    repeat across sessions (``ttfuzz0``, ``ttfuzz1`` …) with different random
    contents, so a basename-keyed ``_done`` marker silently serves a stale
    fixture built from a different source table — a reproducible false
    failure, and worse, a stale hit could mask a real regression. The tag
    therefore binds the full real path plus a content fingerprint of every
    source table the fixture derives from (file list + sizes + mtime_ns —
    parquet writers always create fresh files, so mtime_ns moves), giving a
    changed or regenerated source its own cache slot while the fixed
    ``/root/testdata`` dirs keep hitting their warm ones.

    The result is identifier-safe (``[A-Za-z0-9_]`` only) so it can also
    name catalog tables (the bucketed-layout queries do).
    """
    norm = os.path.realpath(sf_dir)
    h = hashlib.md5(norm.encode())
    for t in tables:
        p = os.path.join(norm, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table: fingerprint the part files.
            for fname in sorted(os.listdir(p)):
                if fname.startswith(("_", ".")):
                    continue
                st = os.stat(os.path.join(p, fname))
                h.update(f"|{t}/{fname}:{st.st_size}:{st.st_mtime_ns}".encode())
        elif os.path.exists(p):
            st = os.stat(p)
            h.update(f"|{t}:{st.st_size}:{st.st_mtime_ns}".encode())
        else:
            h.update(f"|{t}:absent".encode())
    base = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(norm))
    # Fixtures for ephemeral sources (pytest tmp dirs — anything outside the
    # persistent testdata roots) are garbage once the source dir is deleted;
    # the tmp_ prefix lets gc_scratch() sweep them at the next session start
    # instead of accumulating one content-keyed dir per fuzz example.
    roots = os.environ.get(
        "SPARK_GRAFT_PERSISTENT_SF_ROOTS", "/root/testdata"
    ).split(":")
    persistent = any(norm.startswith(os.path.realpath(r) + os.sep) for r in roots)
    prefix = "" if persistent else "tmp_"
    return f"{prefix}{base}_{h.hexdigest()[:10]}"


def gc_scratch() -> int:
    """Sweep ephemeral fixture caches (``tmp_``-tagged — built from pytest
    tmp source dirs that no longer exist) from the scratch tree. Called at
    pytest session start; safe to call any time — persistent testdata
    caches are never touched. Returns the number of dirs removed."""
    import shutil

    removed = 0
    if not os.path.isdir(SCRATCH):
        return 0
    for sub in os.listdir(SCRATCH):
        subdir = os.path.join(SCRATCH, sub)
        if not os.path.isdir(subdir):
            continue
        for tag in os.listdir(subdir):
            if tag.startswith("tmp_"):
                shutil.rmtree(os.path.join(subdir, tag), ignore_errors=True)
                removed += 1
    return removed


def _stage_replay(
    spark: SparkSession, sf_dir: str, table: str, subdir: str
) -> DataFrame:
    """Stage <table>.parquet once into a scratch replay dir (the file
    source tails a directory listing) and open it with readStream.
    Shared by every replay source so staleness/caching behavior stays in
    one place: the stage dir is content-keyed via ``scratch_tag``, so a
    regenerated or different source table stages fresh automatically."""
    import shutil

    ensure_runtime_conf(spark)
    path = os.path.join(sf_dir, f"{table}.parquet")
    sf_tag = scratch_tag(sf_dir, (table,))
    replay_dir = os.path.join(SCRATCH, subdir, sf_tag)
    staged = os.path.join(replay_dir, f"{table}.parquet")
    if not os.path.exists(staged):
        os.makedirs(replay_dir, exist_ok=True)
        shutil.copyfile(path, staged)
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).format("parquet").load(replay_dir)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming DataFrame (event-time ts, µs NTZ).

    The file-stream source requires a directory (it tails the listing for
    new files); the testdata is a single file, so it is staged once into a
    scratch replay dir — the cluster equivalent is a drop-box directory or
    a Kafka topic, with an identical downstream plan."""
    df = _stage_replay(spark, sf_dir, "events", "replay")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    # Watermarks require TIMESTAMP (not NTZ); the session runs UTC, so the
    # cast is value-identical.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a streaming DataFrame — the ingest-time view
    of the corpus (each micro-batch is a crawl drop). Same staging
    mechanics as events_stream; documents carry no event time, so
    consumers either run time-agnostic operators (filters, unbounded
    dedup) or attach an ingest timestamp at the source."""
    return _stage_replay(spark, sf_dir, "documents", "replay_docs")


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 120,
    state_partitions: int = 8,
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink; return
    the sink contents as a batch DataFrame.

    Stateful operators create one state store per shuffle partition; the
    partition count is pinned into the checkpoint at first start. For
    these bounded local replays 8 stores beat 32 (store open/commit
    overhead dominates tiny state); a real deployment sizes this to
    cluster cores × keys instead. The session conf is restored after
    start so batch queries in the same session are unaffected."""
    spark = sdf.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(SCRATCH, "ckpt", name)
    # effective-value fetch (never None) so the restore is unconditional
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    return spark.table(name)
