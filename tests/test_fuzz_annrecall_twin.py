"""Property fuzzing for the r10 vec_ann_recall_verified oracle twin
(the defer-sample discipline: fuzz BEFORE the r11 driver window can
reach it). Drives the eval harness's divergence points: ALL-IDENTICAL
vectors (seed centroids coincide, every assignment and both top-10s
decided purely by id tiebreaks, probed cells beyond cell 0 EMPTY),
corpora smaller than the 3 probe queries and than the 4 coarse cells,
exact sets smaller than 10 (n_exact < k), and zero-hit arms (a probe
whose 1-probe cell holds none of its true neighbors — the recall loss
itself is part of the checked hash). Runs the REAL registered query
against its REAL oracle SQL on randomized tmp-parquet fixtures."""

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

_VALS = [0.0, 0.25, -0.25, 0.3]


def _con(base):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'embeddings.parquet')}/*.parquet')"
    )
    return con


def _run(spark, tmp_path_factory, vecs, tag):
    q = QS["vec_ann_recall_verified"]
    base = str(tmp_path_factory.mktemp(tag))
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    return compare(q.fn(spark, base), _con(base), q.oracle)


@given(
    vecs=st.lists(
        st.lists(st.sampled_from(_VALS), min_size=64, max_size=64),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_ann_recall_small_corpus_tie_fuzz(spark, tmp_path_factory, vecs):
    problems = _run(spark, tmp_path_factory, vecs, "annrfuzz")
    assert not problems, (len(vecs), problems)


@given(
    val=st.sampled_from(_VALS),
    n=st.integers(min_value=2, max_value=10),
)
@settings(**_SETTINGS)
def test_ann_recall_identical_vectors_fuzz(spark, tmp_path_factory, val, n):
    """All embeddings identical: centroids coincide, probed cells past
    cell 0 are empty, every rank is an id tiebreak, and recall must be
    id-tiebreak-perfect in both engines."""
    problems = _run(
        spark, tmp_path_factory, [[val] * 64 for _ in range(n)], "annrsame"
    )
    assert not problems, (val, n, problems)
