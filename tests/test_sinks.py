"""Debug-sink coverage: console and foreach sinks (SURVEY.md §2.2
"Memory/console sink"). The memory sink is exercised by every live
streaming query; console/foreach are demonstrated here (their output is
side-effecting, so they live in tests rather than the query registry)."""

from __future__ import annotations

from avro_topic_replication_spark.streaming.replay import events_stream


def test_console_sink_runs(spark, sf_dir):
    q = (
        events_stream(spark, sf_dir)
        .select("event_id", "event_type", "ts")
        .limit(5)
        .writeStream.format("console")
        .option("numRows", 5)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(60)
    finally:
        q.stop()


def test_foreach_sink_collects_rows(spark, sf_dir):
    seen = spark.sparkContext.accumulator(0)

    def row_sink(row):
        nonlocal_counter = seen  # accumulator add from executors
        nonlocal_counter.add(1)

    q = (
        events_stream(spark, sf_dir)
        .select("event_id")
        .writeStream.foreach(row_sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    assert seen.value > 0


def test_corrupt_csv_modes(spark, sf_dir):
    """The three CSV malformed-row policies: PERMISSIVE quarantines (5
    parsed + 2 captured), DROPMALFORMED drops to 5, FAILFAST raises."""
    import pytest
    from pyspark.sql import functions as F
    from avro_topic_replication_spark.queries.sources_sinks import (
        _corrupt_csv_fixture,
        source_csv_corrupt_records,
    )

    counts = {
        r["status"]: r["n_rows"]
        for r in source_csv_corrupt_records(spark, sf_dir).collect()
    }
    assert counts == {"parsed": 5, "quarantined": 2}

    path = _corrupt_csv_fixture()
    dropped = (
        spark.read.schema("id bigint, qty double, flag string")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    # collect, not count: count() prunes every column off the CSV scan, so
    # nothing is parsed and malformed rows are never detected/dropped
    assert len(dropped.collect()) == 5

    failfast = (
        spark.read.schema("id bigint, qty double, flag string")
        .option("mode", "FAILFAST")
        .csv(path)
    )
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        failfast.collect()


def test_stream_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Kill a throttled stream mid-flight, restart it on the SAME
    checkpoint, and the sink must hold every input row exactly once —
    the R8/R9 semantics (failed/interrupted work replays from the last
    committed offset; committed batches never re-emit) on the file
    source. Uses a durable parquet sink (the memory sink dies with the
    query) and maxFilesPerTrigger=1 so the run spans 4 commits."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    spark.range(1000).select(
        F.col("id"), F.pmod("id", F.lit(4)).alias("slice")
    ).write.partitionBy("slice").parquet(src)
    schema = "id bigint"

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/slice=*")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    # let at least one micro-batch commit, then kill mid-run
    deadline = __import__("time").time() + 60
    while not q.recentProgress and __import__("time").time() < deadline:
        __import__("time").sleep(0.2)
    q.stop()
    q.awaitTermination(30)

    q2 = start()  # restart on the same checkpoint
    q2.awaitTermination(120)

    out = spark.read.parquet(sink)
    assert out.count() == 1000  # no loss, no duplicates
    assert out.select("id").distinct().count() == 1000


def test_streaming_upsert_equals_batch_answer(spark, sf_dir):
    """stream_live_upsert: the per-user totals merged incrementally over
    four throttled micro-batches must equal the one-pass batch aggregate
    value-for-value (decimal sums are exactly mergeable — the property
    that makes incremental MERGE correct at all)."""
    import pyspark.sql.functions as F

    from avro_topic_replication_spark.catalog import load_table
    from avro_topic_replication_spark.queries import all_queries

    live = all_queries()["stream_live_upsert"].fn(spark, sf_dir)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("total_value"),
        )
    )
    assert live.exceptAll(batch).count() == 0
    assert batch.exceptAll(live).count() == 0


def test_upsert_merge_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: if a crash lands after the state
    swap but before the checkpoint commit, the SAME batch_id replays.
    _merge_upsert_batch must detect the already-applied id via the
    _last_batch marker swapped with the state and no-op — otherwise the
    replay double-counts the delta and breaks the exactly-once story."""
    from avro_topic_replication_spark.queries.streaming_batch import (
        _merge_upsert_batch,
    )

    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 2.0)], "user_id long, value double"
    )
    _merge_upsert_batch(b0, 0, state)

    def snap():
        return {
            r["user_id"]: (r["n_events"], str(r["total_value"]))
            for r in spark.read.parquet(state).collect()
        }

    first = snap()
    assert first[1] == (2, "15.0000") and first[2] == (1, "2.0000")

    _merge_upsert_batch(b0, 0, state)  # crash-window replay of batch 0
    assert snap() == first  # no double-count

    b1 = spark.createDataFrame([(2, 1.0), (3, 7.0)], "user_id long, value double")
    _merge_upsert_batch(b1, 1, state)  # a genuinely new batch still applies
    second = snap()
    assert second[2] == (2, "3.0000") and second[3] == (1, "7.0000")
    _merge_upsert_batch(b1, 1, state)  # and its replay is also a no-op
    assert snap() == second


def test_streaming_doc_curation_equals_batch(spark, sf_dir):
    """The streamed quality-gate + fingerprint-dedup + per-language counts
    must equal the identical gates run in one batch pass."""
    from pyspark.sql import functions as F

    from avro_topic_replication_spark.catalog import load_table
    from avro_topic_replication_spark.queries import all_queries

    from avro_topic_replication_spark.queries.llm_text import quality_gate

    live = {
        (r["lang"], r["n_admitted"])
        for r in all_queries()["stream_live_doc_curation"]
        .fn(spark, sf_dir)
        .collect()
    }
    d = load_table(spark, sf_dir, "documents")
    batch = {
        (r["lang"], r["n"])
        for r in d.filter(quality_gate())
        .withColumn("fp", F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")))
        .groupBy("fp")
        .agg(F.min_by("lang", "doc_id").alias("lang"))
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    }
    assert live == batch


def test_streaming_dynamic_session_equals_batch(spark, sf_dir):
    """The live dynamic-gap session windows (r6) must equal the
    oracle-checked batch twin exactly — same merge rule, same per-row
    gap, watermark wide enough that the bounded replay evicts nothing."""
    from avro_topic_replication_spark.queries import all_queries

    qs = all_queries()
    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start"], r["session_end"], r["n_events"]
    )
    live = {key(r) for r in qs["stream_live_dynamic_session"].fn(spark, sf_dir).collect()}
    batch = {key(r) for r in qs["stream_dynamic_session_window"].fn(spark, sf_dir).collect()}
    assert live == batch
