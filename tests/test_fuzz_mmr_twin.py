"""Property fuzzing for the r9 vec_mmr_fixed_steps oracle twin (the
defer-sample discipline: fuzz BEFORE the r10 driver window can reach
it). Drives the greedy contract's divergence points: pools SMALLER than
the three picks (1-3 candidates — steps past the pool size must emit
nothing, not error), all-identical vectors (every distance ties, so all
three argmaxes are decided purely by the vec_id tiebreak), and score
ties between diversity and relevance (a tiny value alphabet makes
equal-score candidates the common case). Runs the REAL registered query
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

_VALS = [0.0, 0.25, -0.25, 0.111]


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
        min_size=2,  # probe + at least one candidate
        max_size=9,
    )
)
@settings(**_SETTINGS)
def test_mmr_fixed_steps_small_pool_tie_fuzz(spark, tmp_path_factory, vecs):
    q = QS["vec_mmr_fixed_steps"]
    base = str(tmp_path_factory.mktemp("mmrfuzz"))
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (len(vecs), problems)

@given(
    vecs=st.lists(
        st.lists(st.sampled_from(_VALS), min_size=64, max_size=64),
        min_size=1,
        max_size=3,
    )
)
@settings(**_SETTINGS)
def test_mmr_pool_smaller_than_steps_fuzz(spark, tmp_path_factory, vecs):
    """The r10-window degenerate end: at most 3 total vectors = probe
    plus at most 2 candidates for the 3 greedy steps — the steps past
    the pool size must be ABSENT (not null-padded, not errored) in both
    engines, including the 1-vector probe-only pool where every step
    vanishes."""
    q = QS["vec_mmr_fixed_steps"]
    base = str(tmp_path_factory.mktemp("mmrtiny"))
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (len(vecs), problems)
