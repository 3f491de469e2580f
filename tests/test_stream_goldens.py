"""Golden bindings for every remaining rows-only ``stream_live_*`` arm.

r8 bound the streaming DLQ arm to its driver-hash-verified batch twin
(test_stream_dlq_golden.py); this suite finishes the job for the other
live arms. Each test runs the REAL registered streaming query (file
replay -> watermark -> state -> memory sink, AvailableNow) and checks it
value-for-value against a batch computation of the same semantics on
the SAME fixture — so "rows-only by design" now means "its sink layout
is engine-defined", never "its values are unchecked".

Semantics per mode, encoded explicitly so the assertions can't
overclaim:

- complete-mode aggregates (tumbling / session / static-join /
  multibatch) equal the batch aggregate EXACTLY — complete mode re-emits
  full state, so a bounded replay must reproduce the one-pass answer.
- append-mode stateless/dedup output equals the batch answer exactly
  when source keys are unique (asserted against the fixture).
- append-mode WATERMARKED stateful output (chained dedup+window) is
  bounded two-sided: everything emitted must equal its batch row, and
  every window the final watermark provably closed must have been
  emitted; only windows ending within the watermark boundary microbatch
  may be withheld.
- stream-stream INNER join equals the batch join exactly (state eviction
  may never drop a valid match on in-order replay); the LEFT OUTER arm's
  matched rows equal the inner join, and every emitted null-row must be
  genuinely unmatched in batch (null rows still inside the lateness
  horizon at end-of-stream are legitimately withheld).
- update-mode arbitrary state (applyInPandasWithState): the memory sink
  accumulates one row per (key, update); the LAST update per key (the
  max of the monotone count) must equal the batch per-key aggregate.
"""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F

from avro_topic_replication_spark.catalog import load_table
from avro_topic_replication_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
QS = all_queries()


def _events(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_live_tumbling_equals_batch(spark):
    live = QS["stream_live_tumbling"].fn(spark, SF_DIR)
    batch = (
        _events(spark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("wstart"), "event_type", "n_events")
    )
    assert _same(live, batch)


def test_live_session_equals_batch(spark):
    """session_window is available in batch mode too — the live arm's
    complete-mode output must equal the one-pass session merge."""
    live = QS["stream_live_session"].fn(spark, SF_DIR)
    batch = (
        _events(spark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    assert _same(live, batch)


def test_live_static_join_equals_batch(spark):
    live = QS["stream_live_static_join"].fn(spark, SF_DIR)
    dim = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = (
        _events(spark)
        .join(dim, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert _same(live, batch)


def test_live_multibatch_equals_batch(spark):
    """Four throttled micro-batches with state carried between them must
    still produce the single-pass 6-hour windowed aggregate."""
    live = QS["stream_live_multibatch"].fn(spark, SF_DIR)
    batch = (
        _events(spark)
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("wstart"), "event_type", "n_events")
    )
    assert _same(live, batch)


def test_live_dedup_arms_equal_batch_distinct(spark):
    """Both dedup arms (within-watermark and unbounded) must emit exactly
    one row per event_id; the fixture's event_ids are unique (asserted,
    so survivor nondeterminism can't blur the check) and therefore the
    full row set equals the source."""
    ev = _events(spark).select("event_id", "user_id", "event_type", "ts")
    n = ev.count()
    assert ev.select("event_id").distinct().count() == n  # fixture premise
    for name in ("stream_live_dedup", "stream_live_dedup_unbounded"):
        live = QS[name].fn(spark, SF_DIR)
        assert _same(live, ev), name


def _click_view_batch(spark):
    ev = _events(spark)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    return clicks, joined


def test_live_stream_join_equals_batch(spark):
    """Watermark-bounded state eviction must never drop a valid match on
    an in-order bounded replay: the inner stream-stream join equals the
    batch self-join row-for-row."""
    live = QS["stream_live_stream_join"].fn(spark, SF_DIR)
    _, joined = _click_view_batch(spark)
    batch = joined.select(
        "click_id", "view_id", "c_user", "click_ts", "view_ts"
    )
    assert _same(live, batch)


def test_live_stream_outer_join_bounds(spark):
    """LEFT OUTER: matched rows equal the inner batch join exactly; every
    emitted null-row is a click with genuinely no in-window view (checked
    against batch), and null rows are only allowed to be withheld — never
    invented — at end-of-stream."""
    live = QS["stream_live_stream_outer_join"].fn(spark, SF_DIR)
    clicks, joined = _click_view_batch(spark)
    matched = live.filter(~F.col("unmatched")).select(
        "click_id", "c_user", "click_ts", "view_id"
    )
    batch_matched = joined.select("click_id", "c_user", "click_ts", "view_id")
    assert _same(matched, batch_matched)
    batch_unmatched = clicks.join(
        joined.select("click_id"), "click_id", "left_anti"
    ).select("click_id", "c_user", "click_ts")
    emitted_unmatched = live.filter(F.col("unmatched")).select(
        "click_id", "c_user", "click_ts"
    )
    # emitted ⊆ truly-unmatched; no fabricated null rows
    assert emitted_unmatched.exceptAll(batch_unmatched).count() == 0


def test_live_chained_stateful_watermark_bounds(spark):
    """Dedup -> window chained through one propagated watermark: every
    emitted row equals its batch twin, and every window whose end the
    final watermark (max ts - 1h lateness) strictly passed MUST have been
    emitted — only boundary windows may be withheld (append semantics)."""
    live = QS["stream_live_chained_stateful"].fn(spark, SF_DIR)
    ev = _events(spark)
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("wstart"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    assert live.exceptAll(batch).count() == 0  # nothing invented
    wm = ev.agg(F.max("ts")).collect()[0][0] - dt.timedelta(hours=1)
    closed = batch.filter(
        F.col("wstart") + F.expr("INTERVAL 1 HOUR") < F.lit(wm)
    )
    assert closed.exceptAll(live).count() == 0  # nothing dropped


def test_live_stateful_final_update_equals_batch(spark):
    """applyInPandasWithState in update mode: the memory sink holds one
    row per (user, micro-batch update); the final update per user — the
    row with that user's maximum monotone count — must equal the batch
    per-user (count, max value)."""
    live = QS["stream_live_stateful"].fn(spark, SF_DIR)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        live.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "max_value")
    )
    batch = (
        _events(spark)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max(F.col("value").cast("double")).alias("max_value"),
        )
    )
    assert _same(final, batch)
