"""Property fuzzing for the r9 vec_pq_adc_verified oracle twin (the
defer-sample discipline: fuzz BEFORE the r10 driver window can reach
it). Drives the contract's divergence points: encode TIES (identical
subspace distances to several codewords must all break toward the lower
code in both engines — a tiny value alphabet makes ties common), fewer
than 11 candidates (top-10 over a 2-vector table), the probe itself
excluded from its own neighbor list, and all-identical vectors (every
candidate at the same ADC distance — ranking then depends entirely on
the vec_id tiebreak). Runs the REAL registered query against its REAL
oracle SQL on randomized tmp-parquet fixtures."""

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

_VALS = [0.0, 0.25, -0.25, 0.3, -0.1]


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
        min_size=2,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_pq_adc_tie_and_small_table_fuzz(spark, tmp_path_factory, vecs):
    q = QS["vec_pq_adc_verified"]
    base = str(tmp_path_factory.mktemp("pqfuzz"))
    rows = [(i, v, i % 2) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (len(vecs), problems)

@given(
    subs=st.lists(
        st.lists(st.sampled_from(_VALS), min_size=8, max_size=8),
        min_size=2,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_pq_adc_all_equal_subvectors_fuzz(spark, tmp_path_factory, subs):
    """The r10-window degenerate end: each vector tiles ONE 8-dim
    subvector across all 8 subspaces, so a vector's 8 per-subspace
    encodes face identical distance profiles and any per-subspace
    argmin-tiebreak drift between the engines multiplies 8x into the
    ADC sum instead of averaging out (the codebooks differ per
    subspace, so codes still vary by m — only the INPUT side
    degenerates)."""
    q = QS["vec_pq_adc_verified"]
    base = str(tmp_path_factory.mktemp("pqtile"))
    rows = [(i, sub * 8, i % 2) for i, sub in enumerate(subs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (len(subs), problems)
