"""Property fuzzing for the r9 ml_kmeans_fixed_point oracle twin (the
defer-sample discipline: fuzz BEFORE the r10 driver window can reach
it). Drives the places the two-round Lloyd contract can diverge: EMPTY
CLUSTERS (duplicate/identical embeddings make every seed after the
first win nothing in round 1 — the keep-previous-centroid branch must
fire identically in both engines), fewer vectors than k (the seed
window yields < 4 centroids), heavy distance ties (assignment must
break toward the lower centroid id), negative dims through the
floor-division centroid mean, and quantization at floor boundaries.
Runs the REAL registered query against its REAL oracle SQL on
randomized tmp-parquet fixtures."""

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

# A tiny value alphabet makes identical vectors (=> empty clusters) and
# exact distance ties the COMMON case; -0.25/0.5 are exact in float32 so
# the quantization boundary floor(x*1000) lands on whole integers.
_VALS = [0.0, 0.5, -0.25, 0.1234, -0.987]


def _con(base):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'embeddings.parquet')}/*.parquet')"
    )
    return con


@given(
    vecs=st.lists(
        st.lists(st.sampled_from(_VALS), min_size=64, max_size=64),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_kmeans_fixed_point_empty_cluster_fuzz(
    spark, tmp_path_factory, vecs
):
    q = QS["ml_kmeans_fixed_point"]
    base = str(tmp_path_factory.mktemp("kmfuzz"))
    rows = [(i, v, i % 3) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (len(vecs), problems)

@given(
    val=st.sampled_from(_VALS),
    n=st.integers(min_value=1, max_value=10),
)
@settings(**_SETTINGS)
def test_kmeans_all_points_identical_collapse_fuzz(
    spark, tmp_path_factory, val, n
):
    """The r10-window degenerate end: every embedding is the SAME
    vector, so all seed centroids coincide, every point ties to all of
    them and assignment must collapse to cid 0 in BOTH Lloyd rounds —
    clusters 1..k-1 are empty twice over and must keep their seed
    centroids via the keep-previous branch identically in both
    engines."""
    q = QS["ml_kmeans_fixed_point"]
    base = str(tmp_path_factory.mktemp("kmcollapse"))
    rows = [(i, [val] * 64, i % 3) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (val, n, problems)
