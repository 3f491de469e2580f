"""Property fuzzing for the analytics_ext4 audit/data-quality family:
each test runs the REAL registered query against its REAL oracle SQL on
randomized tmp-parquet fixtures — dominance ties for the skyline, digit
boundaries for Benford, NULL-riddled rows for the profiler and the
expectation suite, arbitrary key patterns for the CDC diff.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest
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
    rows=st.lists(
        st.tuples(
            # tiny domains force exact-tie points (equal size AND equal
            # price), frontier ties, and dominated duplicates
            st.integers(min_value=1, max_value=5),
            st.sampled_from([1.0, 1.0, 2.5, 2.5, 7.75, 100.0]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_pareto_frontier_ties_fuzz(spark, tmp_path_factory, rows):
    """pareto_frontier_parts' window rewrite vs the oracle's NOT-EXISTS
    on tie-heavy point sets: equal points must ALL stay on the frontier
    (they don't dominate each other), a strictly cheaper point at the
    same size must evict its peers, and a duplicate of a frontier point
    must appear twice in the output."""
    q = QS["pareto_frontier_parts"]
    base = str(tmp_path_factory.mktemp("paretofuzz"))
    _write(
        spark,
        base,
        "part",
        [(i, f"part{i}", s, p) for i, (s, p) in enumerate(rows)],
        "p_partkey long, p_name string, p_size int, p_retailprice double",
    )
    problems = compare(q.fn(spark, base), _con(base, "part"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    prices=st.lists(
        # exact powers of ten sit ON the ladder thresholds; values < 1
        # are excluded by the query's own filter (mirrored in the oracle)
        st.sampled_from(
            [0.5, 1.0, 9.9999, 10.0, 99.5, 100.0, 999.99, 1000.0,
             123456.78, 999999.9, 1000000.0, 55555555.5]
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_benford_digit_ladder_fuzz(spark, tmp_path_factory, prices):
    """stat_benford_law's threshold-ladder digit extraction on values
    sitting exactly on powers of ten (the inputs where a log10-based
    digit could flip), skewed distributions where some digits have zero
    observations, and sub-1 values the filter must drop identically."""
    q = QS["stat_benford_law"]
    base = str(tmp_path_factory.mktemp("benfuzz"))
    _write(
        spark,
        base,
        "orders",
        [(p,) for p in prices],
        "o_totalprice double",
    )
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (prices[:8], problems)


@given(
    rows=st.lists(
        st.tuples(
            # keys chosen to hit the %7 / %10 / %13 derivation classes,
            # including the %7-and-%13 overlap (removed with old status P)
            # and %7-and-%10 (stale status row absent from v1)
            st.integers(min_value=0, max_value=2000),
            st.sampled_from(["O", "F", "P"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    )
)
@settings(**_SETTINGS)
def test_cdc_snapshot_diff_fuzz(spark, tmp_path_factory, rows):
    """cdc_snapshot_diff on arbitrary key/status tables: every
    combination of the %7 (updated), %10 (added), %13 (removed)
    derivation classes, including keys in several classes at once and
    rows whose 'stale' status equals the current one (NOT a change —
    must be filtered on both engines)."""
    q = QS["cdc_snapshot_diff"]
    base = str(tmp_path_factory.mktemp("cdcfuzz"))
    _write(
        spark,
        base,
        "orders",
        rows,
        "o_orderkey long, o_orderstatus string",
    )
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (rows[:8], problems)


@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # dup-heavy keys
            st.one_of(st.none(), st.integers(min_value=0, max_value=8)),
            st.one_of(st.none(), st.sampled_from(["O", "F", "P", "X"])),
            st.sampled_from([-5.0, 0.0, 100.5, 2000.0]),
            st.sampled_from(
                [dt.datetime(1995, 3, 1), dt.datetime(2029, 12, 31),
                 dt.datetime(2030, 1, 2), dt.datetime(2031, 6, 15)]
            ),
        ),
        min_size=1,
        max_size=50,
    ),
    custkeys=st.sets(st.integers(min_value=0, max_value=8), max_size=9),
)
@settings(**_SETTINGS)
def test_dq_expectations_fuzz(spark, tmp_path_factory, orders, custkeys):
    """dq_expectations on tables that actually VIOLATE: duplicate keys,
    NULL custkeys, NULL and out-of-domain statuses (NULL must count as a
    violation — the three-valued-logic trap), zero/negative prices,
    boundary future dates, and customers missing referenced keys."""
    q = QS["dq_expectations"]
    base = str(tmp_path_factory.mktemp("dqfuzz"))
    _write(
        spark,
        base,
        "orders",
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz",
    )
    _write(
        spark,
        base,
        "customer",
        [(k,) for k in sorted(custkeys)],
        "c_custkey long",
    )
    problems = compare(
        q.fn(spark, base), _con(base, "orders", "customer"), q.oracle
    )
    assert not problems, (orders[:6], sorted(custkeys), problems)


@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # basket (order) key
            st.integers(min_value=0, max_value=20),  # part key
        ),
        min_size=1,
        max_size=80,
    ),
    nbrands=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_association_rules_fuzz(spark, tmp_path_factory, items, nbrands):
    """mba_association_rules on random baskets: repeated (order, part)
    lines (the DISTINCT basket collapse must dedup before counting),
    single-item baskets (no pairs), every-item baskets (lift exactly
    1/support boundary), and a support filter that trims to empty."""
    q = QS["mba_association_rules"]
    base = str(tmp_path_factory.mktemp("mbafuzz"))
    _write(
        spark,
        base,
        "lineitem",
        [(o, p) for o, p in items],
        "l_orderkey long, l_partkey long",
    )
    _write(
        spark,
        base,
        "part",
        [(p, f"Brand#{p % nbrands}") for p in range(21)],
        "p_partkey long, p_brand string",
    )
    problems = compare(
        q.fn(spark, base), _con(base, "lineitem", "part"), q.oracle
    )
    assert not problems, (items[:8], nbrands, problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
            # 4-value domain → massive tied blocks spanning both samples;
            # the tie term and the averaged ranks get no slack
            st.sampled_from([-100.0, 0.0, 0.0, 42.5, 42.5, 9999.0]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_mannwhitney_ties_fuzz(spark, tmp_path_factory, rows):
    """stat_mannwhitney_u on tie-saturated two-sample data: all-tied
    inputs (variance 0 → z NULL via NULLIF on both engines), one-sided
    samples (n2=0), and single-row inputs (N(N-1)=0 in the tie
    correction)."""
    q = QS["stat_mannwhitney_u"]
    base = str(tmp_path_factory.mktemp("mwfuzz"))
    _write(
        spark,
        base,
        "customer",
        rows,
        "c_mktsegment string, c_acctbal double",
    )
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from([0.0, 49999.99, 50000.0, 125000.0, 499999.5]),
            st.sampled_from(
                [dt.datetime(1996, 1, 1), dt.datetime(1998, 5, 31, 23, 59),
                 dt.datetime(1998, 6, 1), dt.datetime(2000, 12, 31)]
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_psi_drift_fuzz(spark, tmp_path_factory, rows):
    """stat_psi_drift on adversarial period splits: one-sided periods
    (every row before/after the cut — the smoothing must keep ln finite
    with n_a or n_b = 0), prices exactly ON the 50000 band boundary,
    and single-band inputs (PSI ≈ 0 but not bit-trivially)."""
    q = QS["stat_psi_drift"]
    base = str(tmp_path_factory.mktemp("psifuzz"))
    _write(
        spark,
        base,
        "orders",
        rows,
        "o_totalprice double, o_orderdate timestamp_ntz",
    )
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(
                [dt.datetime(1997, m, d) for m in (1, 2, 3, 7) for d in (1, 15)]
            ),
            st.sampled_from([-500.0, 0.0, 1000.25, 1000.25, 77777.77]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_theil_sen_fuzz(spark, tmp_path_factory, rows):
    """stat_theil_sen_trend on degenerate series: a single month (zero
    pairs → NULL slope, not an index error), constant revenue (slope
    exactly 0 through tied medians), calendar gaps (slopes divide by
    month distances > 1), and even/odd pair counts (the two median
    branches)."""
    q = QS["stat_theil_sen_trend"]
    base = str(tmp_path_factory.mktemp("tsfuzz"))
    _write(
        spark,
        base,
        "orders",
        rows,
        "o_orderdate timestamp_ntz, o_totalprice double",
    )
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000_000),  # doc_id
            st.sampled_from(["en", "de"]),
            # weight extremes: w=1 (key = u itself), huge w (key → 1,
            # rounding ties resolved by doc_id), w=0 rows filtered out
            st.sampled_from([0, 1, 1, 5, 100000]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    )
)
@settings(**_SETTINGS)
def test_weighted_reservoir_fuzz(spark, tmp_path_factory, rows):
    """sample_weighted_reservoir on weight extremes: w=1, w huge (keys
    crowd toward 1.0 and the 9-dp rounding produces ties broken by
    doc_id — the cross-engine flip risk this test hunts), w=0 (filtered
    identically), groups smaller than k."""
    q = QS["sample_weighted_reservoir"]
    base = str(tmp_path_factory.mktemp("wrfuzz"))
    _write(
        spark,
        base,
        "documents",
        rows,
        "doc_id long, lang string, n_chars long",
    )
    problems = compare(q.fn(spark, base), _con(base, "documents"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_k_anonymity_boundary_fuzz(spark, tmp_path_factory, rows):
    """dq_k_anonymity with group sizes hovering at the k=5 policy
    boundary (size exactly 5 is NOT a violation, 4 is), single-group
    tables (k_anonymity = n), and all-singleton tables (every row at
    risk, fraction exactly 1.0)."""
    q = QS["dq_k_anonymity"]
    base = str(tmp_path_factory.mktemp("kafuzz"))
    _write(
        spark,
        base,
        "customer",
        rows,
        "c_mktsegment string, c_nationkey int",
    )
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # user
            st.integers(min_value=0, max_value=30),  # day offset
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_survival_km_fuzz(spark, tmp_path_factory, rows):
    """events_survival_km on random activity patterns: single-event
    users (duration 0), everyone censored (all events in the last 7
    days — survival stays 1.0 through factor 1 - 0/n), everyone
    churned, and duplicate (user, day) events. The ordered-fold
    cumulative product must match DuckDB's list_reduce bit-for-bit."""
    q = QS["events_survival_km"]
    base = str(tmp_path_factory.mktemp("kmfuzz"))
    _write(
        spark,
        base,
        "events",
        [(u, dt.datetime(2024, 4, 1, 12) + dt.timedelta(days=d)) for u, d in rows],
        "user_id long, ts timestamp_ntz",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:8], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # user (parity = group)
            st.sampled_from(
                [dt.datetime(2024, 2, 28), dt.datetime(2024, 2, 29, 23, 59),
                 dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 15)]
            ),
            st.sampled_from([-10.0, 0.0, 5.25, 5.25, 999.75]),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_diff_in_diff_cells_fuzz(spark, tmp_path_factory, rows):
    """stat_diff_in_diff with empty cells (no treatment users, no
    pre-period rows → NULLIF keeps the estimate NULL on both engines),
    boundary timestamps one minute before the cut, and negative
    values."""
    q = QS["stat_diff_in_diff"]
    base = str(tmp_path_factory.mktemp("didfuzz"))
    _write(
        spark,
        base,
        "events",
        rows,
        "user_id long, ts timestamp_ntz, value double",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
            st.sampled_from([-7.5, 0.0, 0.0, 3.25, 3.25, 888.0]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_qq_deciles_fuzz(spark, tmp_path_factory, rows):
    """stat_qq_deciles type-1 quantile selection on tie-heavy samples:
    n < 10 (several deciles share one value), one-sided samples (that
    segment's column all NULL), and rank boundaries landing exactly on
    cumulative-count edges."""
    q = QS["stat_qq_deciles"]
    base = str(tmp_path_factory.mktemp("qqfuzz"))
    _write(
        spark,
        base,
        "customer",
        rows,
        "c_mktsegment string, c_acctbal double",
    )
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.sampled_from(
                [dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 29, 23, 59),
                 dt.datetime(2024, 3, 1), dt.datetime(2024, 4, 1)]
            ),
            st.sampled_from([-3.5, 0.0, 1.25, 1.25, 400.0]),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_cuped_moments_fuzz(spark, tmp_path_factory, rows):
    """stat_cuped_adjusted on degenerate experiments: constant pre-period
    covariate (var(X)=0 → theta NULL via NULLIF), users with only
    pre- or only post-period events (the COALESCE(0) per-user sums),
    and one-armed experiments (empty treatment → NULL lift)."""
    q = QS["stat_cuped_adjusted"]
    base = str(tmp_path_factory.mktemp("cupedfuzz"))
    _write(
        spark,
        base,
        "events",
        rows,
        "user_id long, ts timestamp_ntz, value double",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.integers(min_value=0, max_value=20),  # day (gaps + dup days)
            st.sampled_from([-50.0, 0.0, 10.5, 10.5, 3000.0]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_snaive_backtest_fuzz(spark, tmp_path_factory, rows):
    """ts_snaive_backtest on gappy calendars: a day whose lag-7 day is
    missing must be UNSCORED (calendar join, not row offset), zero
    actuals (WAPE NULL via NULLIF when all actuals are 0), and negative
    revenue (ABS on exact decimals)."""
    q = QS["ts_snaive_backtest"]
    base = str(tmp_path_factory.mktemp("snfuzz"))
    _write(
        spark,
        base,
        "events",
        [
            (t, dt.datetime(2024, 5, 1, 8) + dt.timedelta(days=day), v)
            for t, day, v in rows
        ],
        "event_type string, ts timestamp_ntz, value double",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    value=st.sampled_from([0.25, 1.0, 5.5, 9.999, 10.0, 777.0, 1000000.0]),
    n=st.integers(min_value=1, max_value=60),
)
@settings(**_SETTINGS)
def test_benford_all_equal_amounts_fuzz(spark, tmp_path_factory, value, n):
    """stat_benford_law's fully degenerate corpus: every amount identical,
    so at most ONE first digit survives (fewer than 9 distinct digits —
    the chi-square must come from that single cell, with n == observed),
    and a sub-1 constant empties the table entirely after the >= 1
    filter. Both ends must match the oracle bit-exactly."""
    q = QS["stat_benford_law"]
    base = str(tmp_path_factory.mktemp("benequal"))
    _write(spark, base, "orders", [(value,)] * n, "o_totalprice double")
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (value, n, problems)


@given(
    keys=st.sets(
        # keys in NO derivation class: k % 7, % 10, % 13 all nonzero, so
        # v1 == v2 exactly (identical snapshots)
        st.integers(min_value=1, max_value=3000).filter(
            lambda k: k % 7 and k % 10 and k % 13
        ),
        min_size=1,
        max_size=60,
    ),
    status=st.sampled_from(["O", "F", "P"]),
)
@settings(**_SETTINGS)
def test_cdc_identical_snapshots_fuzz(spark, tmp_path_factory, keys, status):
    """cdc_snapshot_diff when the two derived snapshots are IDENTICAL
    (no key hits the %7/%10/%13 classes): the full outer join matches
    every row to itself, the unchanged-row filter drops everything, and
    both engines must emit exactly zero rows."""
    q = QS["cdc_snapshot_diff"]
    base = str(tmp_path_factory.mktemp("cdcid"))
    _write(
        spark,
        base,
        "orders",
        [(k, status) for k in sorted(keys)],
        "o_orderkey long, o_orderstatus string",
    )
    sdf = q.fn(spark, base)
    assert sdf.count() == 0  # identical snapshots -> empty diff
    problems = compare(sdf, _con(base, "orders"), q.oracle)
    assert not problems, (sorted(keys)[:8], problems)


@given(
    baskets=st.dictionaries(
        st.integers(min_value=0, max_value=40),  # order key
        st.integers(min_value=0, max_value=20),  # its single part
        min_size=1,
        max_size=40,
    ),
    dup=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_association_rules_single_item_baskets_fuzz(
    spark, tmp_path_factory, baskets, dup
):
    """mba_association_rules when EVERY basket holds exactly one distinct
    part (repeated `dup` times — the DISTINCT collapse must still leave a
    single item): there is no pair to count, so the rule set is empty on
    both engines regardless of the support threshold."""
    q = QS["mba_association_rules"]
    base = str(tmp_path_factory.mktemp("mbasingle"))
    _write(
        spark,
        base,
        "lineitem",
        [(o, p) for o, p in baskets.items() for _ in range(dup)],
        "l_orderkey long, l_partkey long",
    )
    _write(
        spark,
        base,
        "part",
        [(p, f"Brand#{p % 3}") for p in range(21)],
        "p_partkey long, p_brand string",
    )
    sdf = q.fn(spark, base)
    assert sdf.count() == 0  # single-item baskets -> no pairs, no rules
    problems = compare(
        sdf, _con(base, "lineitem", "part"), q.oracle
    )
    assert not problems, (list(baskets.items())[:8], dup, problems)


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
            st.one_of(st.none(), st.sampled_from(["O", "F", "P"])),
            st.one_of(st.none(), st.sampled_from(["1-URGENT", "5-LOW"])),
            st.one_of(st.none(), st.sampled_from([0.0, 1.5, 99.99, 4321.0])),
            st.one_of(
                st.none(),
                st.sampled_from(
                    [dt.datetime(1995, 3, 1), dt.datetime(1998, 8, 2)]
                ),
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_profile_columns_null_riddled_fuzz(spark, tmp_path_factory, rows):
    """profile_table_columns (r7 per-column two-phase rewrite) on tables
    where any column can be entirely NULL: null counts, exact distinct
    counts (NULLs excluded), and the VARCHAR-rendered min/max (NULL when
    a column is all-NULL) must match the oracle bit-exactly — including
    the all-rows-NULL column whose distinct count is zero."""
    q = QS["profile_table_columns"]
    base = str(tmp_path_factory.mktemp("proffuzz"))
    _write(
        spark,
        base,
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderpriority string, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    )
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=20),   # order key
            st.integers(min_value=0, max_value=6),    # cust (via order)
            st.integers(min_value=0, max_value=8),    # part
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_common_neighbors_fuzz(spark, tmp_path_factory, edges):
    """graph_common_neighbors (rewritten twice in r7: map-side pair
    explode, then top-20-before-degree-joins) against the oracle's
    self-join + NOT-EXISTS-free formulation on tiny random bipartite
    graphs: duplicate (cust, part) edges must collapse, tied
    common_parts at the top-20 boundary must break on (cust_a, cust_b),
    and single-buyer parts must contribute no pairs."""
    q = QS["graph_common_neighbors"]
    base = str(tmp_path_factory.mktemp("cnfuzz"))
    _write(
        spark,
        base,
        "orders",
        [(o, c) for o, c, _ in edges],
        "o_orderkey long, o_custkey long",
    )
    _write(
        spark,
        base,
        "lineitem",
        [(o, p) for o, _, p in edges],
        "l_orderkey long, l_partkey long",
    )
    problems = compare(
        q.fn(spark, base), _con(base, "orders", "lineitem"), q.oracle
    )
    assert not problems, (edges[:8], problems)
