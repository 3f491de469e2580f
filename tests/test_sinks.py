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
