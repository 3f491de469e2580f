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

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_runtime_conf

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def _stage_replay(
    spark: SparkSession, sf_dir: str, table: str, subdir: str
) -> DataFrame:
    """Stage <table>.parquet once into a scratch replay dir (the file
    source tails a directory listing) and open it with readStream.
    Shared by every replay source so staleness/caching behavior stays in
    one place: the staged copy persists for the process lifetime; delete
    the scratch dir if the testdata is regenerated."""
    import shutil

    ensure_runtime_conf(spark)
    path = os.path.join(sf_dir, f"{table}.parquet")
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
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
