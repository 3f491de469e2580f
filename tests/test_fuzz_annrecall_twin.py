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


def _run_rows(spark, tmp_path_factory, vecs, tag):
    """compare() problems plus the Spark result values, keyed
    (qid, n_probes) -> (n_exact, n_hit), for direct degenerate asserts."""
    q = QS["vec_ann_recall_verified"]
    base = str(tmp_path_factory.mktemp(tag))
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    df = q.fn(spark, base)
    vals = {
        (r["qid"], r["n_probes"]): (r["n_exact"], r["n_hit"])
        for r in df.collect()
    }
    return compare(q.fn(spark, base), _con(base), q.oracle), vals


def _hash_order(n):
    """The query's probe/centroid rank: ORDER BY md5(str(vec_id)), vec_id
    — hashlib.md5 hexdigest matches Spark's and DuckDB's md5() exactly."""
    import hashlib

    return sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))


def test_ann_recall_corpus_smaller_than_k(spark, tmp_path_factory):
    """n=4 distinct vectors (== number of coarse cells): every vector is
    its own cell's sole member, so n_exact = 3 < k=10 and nprobe=1 finds
    ZERO candidates after self-exclusion — the n_hit=0 row must still be
    emitted for every (probe, arm) pair in both engines."""
    vecs = [[0.25] * 64, [0.5] * 64, [-0.25] * 64, [0.0] * 64]
    problems, vals = _run_rows(spark, tmp_path_factory, vecs, "annrk4")
    assert not problems, problems
    assert len(vals) == 6  # 3 probes x 2 arms, no row dropped
    assert all(ne == 3 for ne, _ in vals.values())
    assert all(hit == 0 for (_, np_), (_, hit) in vals.items() if np_ == 1)


def test_ann_recall_lone_cell_probe_zero_hits(spark, tmp_path_factory):
    """The hash-rank-first probe gets a far-outlier vector: it is cid 0's
    sole member, so its nprobe=1 candidate set is EMPTY after
    self-exclusion (n_hit=0 row still emitted) while nprobe=2 reaches the
    zero-vector cell and recovers full recall. The zero-vector probes
    exercise the opposite end: their second-probed cell is EMPTY, so
    nprobe=2 adds nothing and recall stays 6/7."""
    n = 8
    order = _hash_order(n)
    far = order[0]
    vecs = [[8.0] * 64 if i == far else [0.0] * 64 for i in range(n)]
    problems, vals = _run_rows(spark, tmp_path_factory, vecs, "annrlone")
    assert not problems, problems
    assert vals[(far, 1)] == (7, 0)
    assert vals[(far, 2)] == (7, 7)
    for qid in order[1:3]:
        assert vals[(qid, 1)] == (7, 6)
        assert vals[(qid, 2)] == (7, 6)  # second probed cell is empty


def test_ann_recall_identical_vectors_equal_arms(spark, tmp_path_factory):
    """All-identical corpus: every vector ties into cell 0, cells 1-3 are
    empty, so nprobe=2 probes an empty cell and recall is EQUAL at both
    arms (and id-tiebreak-perfect: n_hit == n_exact == n-1)."""
    n = 6
    problems, vals = _run_rows(
        spark, tmp_path_factory, [[0.25] * 64 for _ in range(n)], "annreq"
    )
    assert not problems, problems
    for qid in _hash_order(n)[:3]:
        assert vals[(qid, 1)] == (n - 1, n - 1)
        assert vals[(qid, 2)] == vals[(qid, 1)]
