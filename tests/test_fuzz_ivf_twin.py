"""Property fuzzing for the r9 vec_ivf_verified oracle twin (the
defer-sample discipline: fuzz BEFORE the r10 driver window can reach
it). Drives the inverted-file contract's divergence points: fewer
vectors than the 4 coarse cells (assignment and nprobe selection over a
short centroid list), all-identical vectors (every assignment and the
probe-cell choice decided purely by id tiebreaks), duplicate embeddings
across cells, and candidate pools smaller than top-5. The probe is by
construction also centroid 0, so the self-exclusion path runs in every
example. Runs the REAL registered query against its REAL oracle SQL on
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

_VALS = [0.0, 0.25, -0.25, 0.3]


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
def test_ivf_short_cells_and_tie_fuzz(spark, tmp_path_factory, vecs):
    q = QS["vec_ivf_verified"]
    base = str(tmp_path_factory.mktemp("ivffuzz"))
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (len(vecs), problems)

@given(
    val=st.sampled_from(_VALS),
    n=st.integers(min_value=2, max_value=10),
)
@settings(**_SETTINGS)
def test_ivf_empty_probed_cell_fuzz(spark, tmp_path_factory, val, n):
    """The r10-window degenerate end: all embeddings identical, so the
    seed centroids coincide, every vector ties to every cell and
    assigns to cell 0 — probed cell 1 (nprobe=2, ties toward the lower
    cid) is EMPTY by construction. The candidate set must come entirely
    from cell 0, with no error and no phantom rows for the empty cell,
    identically in both engines."""
    q = QS["vec_ivf_verified"]
    base = str(tmp_path_factory.mktemp("ivfempty"))
    rows = [(i, [val] * 64, 0) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (val, n, problems)
