"""Property fuzzing for the r9 ml_als_fixed_point oracle twin (the
defer-sample discipline: fuzz BEFORE the r10 driver window can reach
it). The twin's whole contract is that both engines replay the SAME
integer algebra, so the fuzz drives the places that algebra can diverge:
the rating cap (duplicate lineitems past _ALS_RCAP), degenerate matrices
(a single user, a single item — the Cramer denominator at its
lambda^2*S^4 floor), sampled users who have rated EVERY item (empty
unseen set — the user must vanish, not error), custkey 0 (0 % 50 == 0,
the first sampled user), and dangling orderkeys dropped by the fact
join. Runs the REAL registered query against its REAL oracle SQL on
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
    max_examples=10,
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
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # orderkey
            # custkeys 0/50/100 are %50-sampled; 1/2/3 are not
            st.sampled_from([0, 1, 2, 3, 50, 100]),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    lines=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),  # 10/11 dangle
            st.integers(min_value=1, max_value=4),   # suppkey (tiny: ties)
        ),
        min_size=1,
        max_size=80,  # heavy duplication drives counts past the r-cap
    ),
)
@settings(**_SETTINGS)
def test_als_fixed_point_degenerate_matrices_fuzz(
    spark, tmp_path_factory, orders, lines
):
    """ml_als_fixed_point on tiny adversarial matrices: with <= 4 items
    and <= 6 users the Cramer denominators sit near the ridge floor and
    factors routinely hit the clamp — both engines must still agree
    bit-for-bit on every floor division, and a sampled user with no
    unseen items must simply produce no rows."""
    q = QS["ml_als_fixed_point"]
    base = str(tmp_path_factory.mktemp("alsfuzz"))
    _write(spark, base, "orders", orders, "o_orderkey long, o_custkey long")
    _write(spark, base, "lineitem", lines, "l_orderkey long, l_suppkey long")
    problems = compare(
        q.fn(spark, base), _con(base, "orders", "lineitem"), q.oracle
    )
    assert not problems, (orders, lines[:15], problems)

@given(
    n_items=st.integers(min_value=1, max_value=4),
    extra=st.lists(
        # custkeys 1/2/3 are unsampled, 100 IS sampled (100 % 50 == 0)
        st.sampled_from([1, 2, 3, 100]),
        max_size=6,
    ),
)
@settings(**_SETTINGS)
def test_als_sampled_user_rated_everything_fuzz(
    spark, tmp_path_factory, n_items, extra
):
    """The r10-window degenerate end: custkey 0 (always %50-sampled)
    holds orderkey 0, which carries a lineitem for EVERY item in the
    table — user 0's unseen set is EMPTY, so it must produce zero
    recommendation rows (vanish, not error, not null-recommend) in both
    engines, while other sampled users (custkey 50 via orderkey 1, and
    any custkey-100 extras) still recommend from their real unseen
    sets. Extras rate only items inside user 0's set so the full-
    coverage property survives the randomization."""
    q = QS["ml_als_fixed_point"]
    base = str(tmp_path_factory.mktemp("alsfull"))
    orders = [(0, 0), (1, 50)] + [
        (2 + i, c) for i, c in enumerate(extra)
    ]
    lines = (
        [(0, s) for s in range(1, n_items + 1)]  # user 0 rates everything
        + [(1, 1)]                               # user 50 rates item 1 only
        + [(2 + i, 1 + (i % n_items)) for i in range(len(extra))]
    )
    _write(spark, base, "orders", orders, "o_orderkey long, o_custkey long")
    _write(spark, base, "lineitem", lines, "l_orderkey long, l_suppkey long")
    problems = compare(
        q.fn(spark, base), _con(base, "orders", "lineitem"), q.oracle
    )
    assert not problems, (orders, lines, problems)
