"""Focused pins for the r13 optimization-round changes:

- catalog.column_max (parquet footer statistics, zero Spark jobs);
- graph_common_neighbors' packed-long guard + struct-key fallback
  (r12 verdict item 7: the 2^31 precondition is now enforced in code);
- the tracked-persist release hook (r12 verdict item 9: intra-query
  persists must be releasable in sessions that never clearCache).
"""

from __future__ import annotations

import pytest

from avro_topic_replication_spark import catalog
from avro_topic_replication_spark.queries import all_queries
from avro_topic_replication_spark.session import (
    _TRACKED_PERSISTS,
    release_tracked_persists,
    track_persist,
)


def test_column_max_reads_footer_stats(sf_dir):
    mx = catalog.column_max(sf_dir, "orders", "o_custkey")
    assert isinstance(mx, int) and 0 < mx < 2**31


def test_column_max_unknowns_return_none(sf_dir, tmp_path):
    assert catalog.column_max(str(tmp_path), "orders", "o_custkey") is None
    assert catalog.column_max(sf_dir, "orders", "no_such_column") is None


def test_common_neighbors_fallback_matches_packed(spark, sf_dir, monkeypatch):
    """The struct-key fallback (taken when max(custkey) >= 2^31 or footer
    stats are unavailable) must produce exactly the packed-long path's
    rows — the guard changes byte width, never results."""
    fn = all_queries()["graph_common_neighbors"].fn
    packed = [tuple(r) for r in fn(spark, sf_dir).collect()]
    monkeypatch.setattr(catalog, "column_max", lambda *a, **k: None)
    fallback = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert packed == fallback
    assert len(packed) == 20


def test_release_tracked_persists_empties_cache(spark, sf_dir):
    """After a query with intra-query persists runs, release must leave
    the session's CacheManager empty (verdict item 9's done-criterion)."""
    # clean slate: earlier tests in the session may legitimately hold
    # non-tracked caches (sql_cache_table's CACHE TABLE), which are not
    # this hook's to release — the assertion below is about TRACKED ones.
    spark.catalog.clearCache()
    release_tracked_persists()
    fn = all_queries()["dedup_minhash_banded"].fn
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert _TRACKED_PERSISTS, "query no longer routes persists through tracker"
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert not cache_mgr.isEmpty()
    released = release_tracked_persists()
    assert released >= 1
    assert cache_mgr.isEmpty()
    assert not _TRACKED_PERSISTS


def test_track_persist_returns_persisted_df(spark):
    df = track_persist(spark.range(10))
    try:
        assert df.storageLevel.useMemory
        assert df.count() == 10
    finally:
        release_tracked_persists()
