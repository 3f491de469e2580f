"""Property fuzzing for the round-8 driver sample window — the four
in-window queries with no targeted test anywhere else (verified by
grepping tests/ for every window name): SCD2 point-in-time joins on
version-boundary timestamps, time-interval RANGE frames under heavy
timestamp ties, null-aware NOT IN three-valued logic, and the 7-day
windowed funnel's strict/inclusive deadline edges. Each test runs the
REAL registered query against its REAL oracle SQL on randomized
tmp-parquet fixtures (the r7 pattern that caught the fn_try_arithmetic
ANSI bug before the driver did).
"""

from __future__ import annotations

import datetime as dt
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


# The SCD2 dimension migrates custkey%3==0 customers at exactly
# 1995-06-01 00:00:00; order dates straddle that boundary by one
# microsecond on each side, sit exactly ON it (v2's inclusive
# valid_from AND v1's exclusive valid_to — the order must land in v2,
# never both, never neither), and fall before v1's 1990 valid_from
# (matching NO version at all).
_MIG = dt.datetime(1995, 6, 1, 0, 0, 0)
_SCD2_DATES = [
    dt.datetime(1989, 12, 31, 23, 59, 59),  # before every version
    dt.datetime(1990, 1, 1, 0, 0, 0),       # exactly v1.valid_from
    dt.datetime(1992, 7, 4, 12, 0, 0),
    _MIG - dt.timedelta(microseconds=1),     # last instant of v1
    _MIG,                                    # exactly the boundary
    _MIG + dt.timedelta(microseconds=1),     # first strict-v2 instant
    dt.datetime(1998, 3, 15, 6, 30, 0),
]


@given(
    custkeys=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=8,
        unique=True,
    ),
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),  # some keys dangle
            st.sampled_from(_SCD2_DATES),
            st.sampled_from([0.0, 12.34, 9999.99]),
        ),
        min_size=1,
        max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_scd2_version_boundary_fuzz(spark, tmp_path_factory, custkeys, orders):
    """join_scd2_point_in_time on order dates concentrated on the
    1995-06-01 migration boundary: an order at exactly the boundary must
    match ONLY v2 ([valid_from, valid_to) semantics — inclusive from,
    exclusive to), one microsecond earlier only v1, pre-1990 orders no
    version, dangling custkeys no row; revenue goes through the decimal
    hop so the grouped sums hash bit-exact."""
    q = QS["join_scd2_point_in_time"]
    base = str(tmp_path_factory.mktemp("scd2fuzz"))
    _write(
        spark,
        base,
        "customer",
        [(k, seg) for k, seg in zip(custkeys, ["BUILDING", "AUTOMOBILE"] * 4)],
        "c_custkey long, c_mktsegment string",
    )
    _write(
        spark,
        base,
        "orders",
        orders,
        "o_custkey long, o_orderdate timestamp_ntz, o_totalprice double",
    )
    problems = compare(
        q.fn(spark, base), _con(base, "customer", "orders"), q.oracle
    )
    assert not problems, (custkeys, orders[:5], problems)


_T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
# Nine timestamps engineered for RANGE-frame edges: exact ties (peers
# must enter the frame together), rows exactly ONE HOUR apart (the
# trailing INTERVAL 1 HOUR PRECEDING bound is inclusive in both
# engines), and one-microsecond misses on each side of that bound.
_TR_TS = [
    _T0,
    _T0,  # duplicated: guaranteed tie pressure
    _T0 + dt.timedelta(hours=1),
    _T0 + dt.timedelta(hours=1, microseconds=-1),
    _T0 + dt.timedelta(hours=1, microseconds=1),
    _T0 + dt.timedelta(hours=2),
    _T0 + dt.timedelta(minutes=30),
    _T0 + dt.timedelta(days=2),
    _T0 - dt.timedelta(hours=1),
]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user (all < 40)
            st.sampled_from(_TR_TS),
            st.sampled_from([0.0, -1.5, 7.25, 100.0]),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_time_range_frame_ties_fuzz(spark, tmp_path_factory, rows):
    """win_time_range_frame under heavy timestamp ties and exact
    one-hour spacings: RANGE peers (identical ts) must contribute to
    each other's frame regardless of row order, a row exactly 1h back
    is IN the trailing frame while 1h+1us is OUT, and the rolling sum
    is decimal-exact so tied-frame outputs hash identically."""
    q = QS["win_time_range_frame"]
    base = str(tmp_path_factory.mktemp("trfuzz"))
    _write(
        spark,
        base,
        "events",
        [(i, u, ts, v) for i, (u, ts, v) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    customers=st.lists(
        st.tuples(
            # keys cluster on multiples of 50 so NULLIF(k % 50, 0)
            # produces NULL in some draws and not others
            st.sampled_from([0, 1, 7, 49, 50, 51, 100, 150, 23]),
            st.sampled_from(["BUILDING", "MACHINERY"]),
        ),
        min_size=0,
        max_size=20,
    ),
    orders=st.lists(
        st.one_of(
            st.sampled_from([0, 1, 7, 49, 50, 51, 100, 23]),
            st.none(),  # NULL probe key: UNKNOWN against any non-empty set
        ),
        min_size=1,
        max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_not_in_null_aware_fuzz(spark, tmp_path_factory, customers, orders):
    """sql_not_in_null_aware across the full 3VL matrix: a NULL in the
    subquery (any BUILDING key with k%50==0) must empty the null_in_set
    count entirely, an EMPTY subquery (no BUILDING customers) makes NOT
    IN vacuously true even for NULL probe keys, and NULL o_custkey rows
    never count against a non-empty set."""
    q = QS["sql_not_in_null_aware"]
    base = str(tmp_path_factory.mktemp("ninfuzz"))
    _write(
        spark,
        base,
        "customer",
        customers,
        "c_custkey long, c_mktsegment string",
    )
    _write(
        spark,
        base,
        "orders",
        [(k,) for k in orders],
        "o_custkey long",
    )
    problems = compare(
        q.fn(spark, base), _con(base, "customer", "orders"), q.oracle
    )
    assert not problems, (customers[:5], orders[:8], problems)


_F0 = dt.datetime(2024, 1, 1, 0, 0, 0)
_WEEK = dt.timedelta(days=7)
# Funnel deadline edges relative to a stage-1 anchor at _F0: same
# instant (excluded — strict >), exactly +7 days (included — <=), and
# one microsecond past the deadline (excluded).
_FUNNEL_TS = [
    _F0,
    _F0 + dt.timedelta(seconds=1),
    _F0 + _WEEK,
    _F0 + _WEEK + dt.timedelta(microseconds=1),
    _F0 + _WEEK + dt.timedelta(seconds=1),
    _F0 + 2 * _WEEK,
    _F0 + 2 * _WEEK + dt.timedelta(microseconds=1),
    _F0 - dt.timedelta(days=1),  # stage-2 events BEFORE any view
]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(_FUNNEL_TS),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_funnel_windowed_deadline_fuzz(spark, tmp_path_factory, rows):
    """events_funnel_windowed on timestamps pinned to the 7-day deadline
    edges: a click at exactly t_view+7d converts (<=), at +7d+1us it
    does not, a purchase at the same instant as the click never counts
    (strict >), clicks BEFORE the first view are ignored, and users with
    later-stage events but no view contribute to no stage."""
    q = QS["events_funnel_windowed"]
    base = str(tmp_path_factory.mktemp("funnelfuzz"))
    _write(
        spark,
        base,
        "events",
        [(u, ts, et) for u, ts, et in rows],
        "user_id long, ts timestamp_ntz, event_type string",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:6], problems)
