"""Property fuzzing for the round-9 driver sample window — the r8
verdict's five highest-risk rotation entries, each on the degenerate
inputs its oracle contract is most likely to get wrong: Benford audits
of all-same-first-digit / sub-threshold / power-of-ten-boundary amounts,
time-travel reads where a %3 residue class is empty (a vacuumed-boundary
snapshot whose manifest pins a file with zero rows), association rules
over single-item baskets and sub-support pairs, Q-Q deciles under ties
heavy enough to collapse brackets (plus a one-sided-empty sample), and
k-anonymity with k=1 singletons / everything-violating tables. Each test
runs the REAL registered query against its REAL oracle SQL on randomized
tmp-parquet fixtures (the r7/r8 pattern that caught the
fn_try_arithmetic ANSI bug and the fn_math -0.0 divergence before the
driver did)."""

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


# Amounts engineered for the first-digit threshold ladder: sub-threshold
# (< 1.0, filtered in both engines), NULL, exact powers of ten (digit
# must be 1, never 9 from a 1-ulp slip), last-representable-before-10^k
# doubles, >= 1e10 (off the ladder, digit NULL, filtered), and ordinary
# mid-decade values. The all-same-digit hazard (chi-square against a
# single surviving group) comes free when the sampler picks one value.
_BENFORD_VALS = [
    None, 0.0, 0.5, 0.9999999999999999, 1.0, 2.5, 9.999999999999998,
    10.0, 55.5, 99.99999999999999, 100.0, 123.456, 1e5, 9.5e8,
    999999999.9999999, 1e9, 9.999999999e9, 1e10, 5e12,
]


@given(
    prices=st.lists(st.sampled_from(_BENFORD_VALS), min_size=1, max_size=40)
)
@settings(**_SETTINGS)
def test_benford_degenerate_digits_fuzz(spark, tmp_path_factory, prices):
    """stat_benford_law on boundary/degenerate amounts: every
    power-of-ten must classify as digit 1 in BOTH engines (the ladder's
    reason to exist), sub-1.0 and >=1e10 rows drop identically, and an
    all-same-digit table (1 surviving group) still hashes — including
    the case where NO row survives the >= 1.0 filter (empty result,
    not an error)."""
    q = QS["stat_benford_law"]
    base = str(tmp_path_factory.mktemp("benford"))
    _write(spark, base, "orders", [(p,) for p in prices],
           "o_totalprice double")
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (prices, problems)


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=30), min_size=0, max_size=25,
        unique=True,
    ),
    status_seed=st.integers(min_value=0, max_value=2),
)
@settings(**_SETTINGS)
def test_time_travel_empty_residue_class_fuzz(
    spark, tmp_path_factory, keys, status_seed
):
    """source_time_travel when a whole %3 residue class is absent (the
    vacuumed-boundary hazard: the v1 manifest pins data_part0/part1 and
    the reader must scan an EMPTY pinned file without error, and must
    never leak part2 rows back in), down to a fully empty source table.
    Each example gets a fresh scratch fixture (unique tmp basename)."""
    q = QS["source_time_travel"]
    base = str(tmp_path_factory.mktemp("ttfuzz"))
    statuses = ["O", "F", "P"]
    rows = [
        (k, statuses[(k + status_seed) % 3], float(k) * 1.5 + 0.25)
        for k in keys
    ]
    _write(spark, base, "orders", rows,
           "o_orderkey long, o_orderstatus string, o_totalprice double")
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (keys, problems)


@given(
    lines=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),   # basket (order)
            st.integers(min_value=0, max_value=11),  # partkey, some dangle
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_mba_single_item_baskets_fuzz(spark, tmp_path_factory, lines):
    """mba_association_rules on adversarial basket shapes: single-item
    baskets (no pairs at all — empty result, not an error), duplicate
    (order, part) lines that the DISTINCT must collapse before counting,
    dangling partkeys dropped by the dimension join, and pair counts
    hovering around the n_pair >= 5 support threshold (8 baskets x 4
    brands makes threshold-straddling counts the common case)."""
    q = QS["mba_association_rules"]
    base = str(tmp_path_factory.mktemp("mba"))
    _write(spark, base, "lineitem", lines, "l_orderkey long, l_partkey long")
    # parts 0..9 exist (brands cycle over 4), 10..11 dangle
    _write(spark, base, "part",
           [(k, f"Brand#{k % 4}") for k in range(10)],
           "p_partkey long, p_brand string")
    problems = compare(
        q.fn(spark, base), _con(base, "lineitem", "part"), q.oracle
    )
    assert not problems, (lines, problems)


@given(
    rows=st.lists(
        st.tuples(
            # 4 distinct balances: guaranteed heavy ties, deciles collapse
            st.sampled_from([-3.0, 0.0, 1.5, 2.75]),
            # AUTOMOBILE rows are filtered; a draw may leave either (or
            # both) compared segments EMPTY — t=0 must yield NULL
            # quantiles on that side, 9 rows always.
            st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_qq_deciles_tie_collapse_fuzz(spark, tmp_path_factory, rows):
    """stat_qq_deciles under tie pressure: with <= 4 distinct values,
    most of the 9 deciles select the SAME order statistic, and the
    (cumulative >= rank AND prior-cumulative < rank) bracket must pick
    exactly one value per decile in both engines; an empty segment
    yields NULL for its column on all 9 rows."""
    q = QS["stat_qq_deciles"]
    base = str(tmp_path_factory.mktemp("qq"))
    _write(spark, base, "customer", rows,
           "c_acctbal double, c_mktsegment string")
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (rows[:10], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_k_anonymity_singleton_fuzz(spark, tmp_path_factory, rows):
    """dq_k_anonymity with k=1 singleton quasi-identifier classes, the
    all-groups-violating case (frac_rows_at_risk exactly 1.0 — an IEEE
    n/n division both engines must print identically), and the
    no-violations case (COALESCE'd zero sums, frac 0.0)."""
    q = QS["dq_k_anonymity"]
    base = str(tmp_path_factory.mktemp("kanon"))
    _write(spark, base, "customer", rows,
           "c_mktsegment string, c_nationkey int")
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (rows, problems)
