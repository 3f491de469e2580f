"""Property fuzzing for the analytics_ext3 families (VERDICT r5 item 7's
discipline applied to the r6 additions): each test runs the REAL
registered query against its REAL oracle SQL on randomized tmp-parquet
fixtures, hunting the inputs the fixed corpus can't reach — constant
columns, ties, negative values, empty strata, degenerate weights.
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
            st.sampled_from(["A", "N", "R"]),
            # few distinct prices force heavy ties; weights include the
            # boundary case where one value carries >= half the total
            st.sampled_from([10.0, 10.0, 25.5, 25.5, 99.99, 0.01]),
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_weighted_median_fuzz(spark, tmp_path_factory, rows):
    """agg_weighted_median on random (flag, price, weight) rows: massive
    ties (6-value price domain), zero weights, single-row groups. The
    2*cumw >= totw boundary is exercised constantly — the off-by-one
    that picks the wrong side of an even split can't hide."""
    q = QS["agg_weighted_median"]
    base = str(tmp_path_factory.mktemp("wmfuzz"))
    _write(
        spark,
        base,
        "lineitem",
        [(f, p, w) for f, p, w in rows],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    problems = compare(q.fn(spark, base), _con(base, "lineitem"), q.oracle)
    assert not problems, (rows[:5], problems)


@given(
    series=st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.integers(min_value=0, max_value=25),  # day offset (gaps, dups)
            st.sampled_from([0.0, 1.5, 1.5, -3.25, 100.0]),  # tie-heavy values
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_rolling_and_hampel_median_fuzz(spark, tmp_path_factory, series):
    """ts_rolling_median + ts_hampel_outliers on random daily series:
    calendar gaps (frames span missing days), repeated days (the daily
    aggregate must collapse first), constant frames (MAD = 0 — the
    is_outlier comparison against 0 must agree), negative revenue."""
    base = str(tmp_path_factory.mktemp("rmfuzz"))
    rows = [
        (t, dt.datetime(2024, 5, 1, 9, 0) + dt.timedelta(days=day, minutes=7), v)
        for t, day, v in series
    ]
    _write(
        spark,
        base,
        "events",
        rows,
        "event_type string, ts timestamp_ntz, value double",
    )
    con = _con(base, "events")
    for name in ("ts_rolling_median", "ts_hampel_outliers"):
        q = QS[name]
        problems = compare(q.fn(spark, base), con, q.oracle)
        assert not problems, (name, series[:5], problems)


@given(
    docs=st.lists(
        st.text(
            alphabet="ab .!?xyz",
            min_size=0,
            max_size=60,
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_zipf_ngram_readability_fuzz(spark, tmp_path_factory, docs):
    """text_zipf_fit + text_ngram_topk + text_readability on adversarial
    tiny corpora: empty docs, punctuation-only docs, single-token docs,
    vocabularies below the >= 5 frequency floor (zipf must emit NULLs on
    an n <= 1 regression, identically in both engines)."""
    base = str(tmp_path_factory.mktemp("zipffuzz"))
    _write(
        spark,
        base,
        "documents",
        [(i, t, "en", "web", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    con = _con(base, "documents")
    for name in ("text_zipf_fit", "text_ngram_topk", "text_readability"):
        q = QS[name]
        problems = compare(q.fn(spark, base), con, q.oracle)
        assert not problems, (name, docs[:3], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
            # duplicate-heavy balances crossing band boundaries (bands are
            # floor(val/500)), including negatives and exact multiples of 500
            st.sampled_from([-999.5, -500.0, 0.0, 0.0, 499.99, 500.0, 1234.56, 9999.99]),
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_ks_banded_cumsum_fuzz(spark, tmp_path_factory, rows):
    """stat_ks_test's banded two-phase ECDF vs the oracle's plain window
    on random two-sample data: values sitting exactly ON band boundaries
    (floor(500.0/500) vs floor(499.99/500)), negative bands, one-sided
    samples (a segment with zero rows divides by NULL identically in
    both engines). The property under test: banded == global cumsum."""
    q = QS["stat_ks_test"]
    base = str(tmp_path_factory.mktemp("ksfuzz"))
    _write(
        spark,
        base,
        "customer",
        [(seg, bal) for seg, bal in rows],
        "c_mktsegment string, c_acctbal double",
    )
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (rows[:5], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000_000),
            st.floats(min_value=0.01, max_value=500000.0, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda r: r[0],
    )
)
@settings(**_SETTINGS)
def test_bootstrap_poisson_fuzz(spark, tmp_path_factory, rows):
    """stat_bootstrap_poisson_ci on random order tables: arbitrary key
    values (the md5-uniform must agree for ANY key, not just the
    sequential fixture ids) and sizes small enough that some replicates
    draw zero rows (mean_r NULL — sort_array/list_sort must place NULLs
    identically; ci selection must survive)."""
    q = QS["stat_bootstrap_poisson_ci"]
    base = str(tmp_path_factory.mktemp("bootfuzz"))
    _write(
        spark,
        base,
        "orders",
        [(k, v) for k, v in rows],
        "o_orderkey long, o_totalprice double",
    )
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (rows[:5], problems)
