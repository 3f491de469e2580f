"""Engine-surface tests that go beyond the oracle hash: observe() metric
values, and the runtime bloom-filter injection the join query claims."""

from __future__ import annotations

from avro_topic_replication_spark.queries import all_queries

QS = all_queries()


def test_observe_metrics_match_table_totals(spark, sf_dir):
    """agg_observe_metrics: after one action, the Observation must report
    the table's true row count and max price — metrics from the same job,
    no second scan."""
    from avro_topic_replication_spark.catalog import load_table
    from avro_topic_replication_spark.queries.engine4 import agg_observe_metrics

    df = QS["agg_observe_metrics"].fn(spark, sf_dir)
    df.collect()
    got = agg_observe_metrics.last_observation.get
    o = load_table(spark, sf_dir, "orders")
    want_rows = o.count()
    want_max = o.agg({"o_totalprice": "max"}).collect()[0][0]
    assert got["rows_read"] == want_rows
    assert got["max_price"] == want_max


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """join_runtime_bloom_filter: the executed plan captured while the
    forced thresholds were active must contain the bloom_filter_agg
    creation subquery and the injected might_contain predicate on the
    fact scan, and the join must have stayed a shuffle join."""
    from avro_topic_replication_spark.queries.engine4 import (
        join_runtime_bloom_filter,
    )

    QS["join_runtime_bloom_filter"].fn(spark, sf_dir)
    plan = join_runtime_bloom_filter.last_plan
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan
    assert "BroadcastHashJoin" not in plan
    # restored confs: later queries broadcast again
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"
