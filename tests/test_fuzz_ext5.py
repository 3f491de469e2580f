"""Property fuzzing for the r8 hash-verified twins (analytics_ext5) —
the r9 driver-window candidates, pre-fuzzed before the driver sees them
(the r7/r8 pattern). Each test runs the REAL registered query against
its REAL oracle SQL on randomized tmp-parquet fixtures targeting the
contracts that could silently diverge across engines: empty gram sets
and forced signature collisions (MinHash), degenerate graphs — single
edge, stars, mod-10-empty (fixed-point PageRank / labelprop / k-core),
sub-k samples and duplicate-heavy keys (CMS / bottom-k / HLL).
"""

from __future__ import annotations

import os

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from avro_topic_replication_spark.queries import all_queries
from tests.oracle import compare

QS = all_queries()

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _write(spark, base, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, f"{name}.parquet"))


def _con(base, *names):
    con = duckdb.connect()
    for n in names:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM read_parquet("
            f"'{os.path.join(base, n + '.parquet')}/*.parquet')"
        )
    return con


@given(
    texts=st.lists(
        # 3-word vocabulary, lengths straddling the 6-gram boundary:
        # sub-6-word docs have EMPTY gram sets (must silently drop from
        # signatures in both engines), duplicated docs force identical
        # signatures -> guaranteed band collisions -> jaccard-1.0 pairs
        st.lists(
            st.sampled_from(["a", "bb", "c"]), min_size=1, max_size=14
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_minhash_banded_collision_fuzz(spark, tmp_path_factory, texts):
    """dedup_minhash_banded on tiny-vocabulary corpora: empty gram sets,
    systematic band collisions (the 3-word vocab makes near-identical
    gram sets everywhere), and the exact-Jaccard verify filtering weak
    candidates — pair set and jaccard values hash-checked."""
    q = QS["dedup_minhash_banded"]
    base = str(tmp_path_factory.mktemp("mhfuzz"))
    _write(
        spark, base, "documents",
        list(enumerate(texts)), "doc_id long, text string",
    )
    problems = compare(q.fn(spark, base), _con(base, "documents"), q.oracle)
    assert not problems, (texts[:4], problems)


_GRAPH_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),   # l_suppkey
        st.integers(min_value=0, max_value=60),   # l_partkey
    ),
    min_size=1,
    max_size=60,
)


@given(rows=_GRAPH_ROWS)
@settings(**_SETTINGS)
def test_graph_fixed_point_twins_fuzz(spark, tmp_path_factory, rows):
    """The three fixed-point graph twins on random small bipartite
    graphs: single-edge graphs (PageRank mass concentrates), stars,
    duplicate (s, p) rows (the DISTINCT must collapse first), mod-10
    draws where labelprop's partitioned graph is EMPTY, and k=40
    unreachable so both peel rounds report zeros — all three compared
    hash-exact against their unrolled-CTE oracles."""
    base = str(tmp_path_factory.mktemp("graphfuzz"))
    _write(spark, base, "lineitem", rows, "l_suppkey long, l_partkey long")
    con = _con(base, "lineitem")
    for name in (
        "graph_pagerank_fixed_point",
        "graph_labelprop_min_rounds",
        "graph_kcore_peel_rounds",
    ):
        q = QS[name]
        problems = compare(q.fn(spark, base), con, q.oracle)
        assert not problems, (name, rows[:6], problems)


@given(
    users=st.lists(
        # heavy duplication + negative ids (cast-to-string must agree)
        st.sampled_from([-3, 0, 1, 2, 7, 7, 7, 42, 999999999999]),
        min_size=1,
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_cms_and_hll_twins_fuzz(spark, tmp_path_factory, users):
    """sketch_cms_verified + sketch_hll_verified on duplicate-heavy,
    negative, and 12-digit keys: CMS cell counts (including engineered
    collisions), min-probe results, HLL register states and the exact
    integer harmonic sum must all agree bitwise."""
    base = str(tmp_path_factory.mktemp("cmsfuzz"))
    _write(spark, base, "events", [(u,) for u in users], "user_id long")
    con = _con(base, "events")
    for name in ("sketch_cms_verified", "sketch_hll_verified"):
        q = QS[name]
        problems = compare(q.fn(spark, base), con, q.oracle)
        assert not problems, (name, users[:8], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000_000),  # event_id
            st.sampled_from([-5.5, 0.0, 0.0, 1.25, 99.9, 4000.0]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    )
)
@settings(**_SETTINGS)
def test_bottomk_sub_k_sample_fuzz(spark, tmp_path_factory, rows):
    """sketch_bottomk_verified with n << k=256: the sample is the whole
    table, rank readout ceil(p*n) lands on real rows for every prob
    (n=1 maps all four probs to the same row), tied values order by the
    hash-rank tiebreak identically in both engines."""
    q = QS["sketch_bottomk_verified"]
    base = str(tmp_path_factory.mktemp("bkfuzz"))
    _write(
        spark, base, "events", rows, "event_id long, value double",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:6], problems)
