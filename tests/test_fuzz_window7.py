"""Property fuzzing for intricate queries in the round-7 driver sample
window: corpus-wide line-dedup rewrite (order-pinned reassembly),
last-touch attribution (timestamp ties + self-attribution exclusion), and
the try_* error-tolerant scalar layer. Each test runs the REAL registered
query against its REAL oracle SQL on randomized tmp-parquet fixtures.
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


@given(
    texts=st.lists(
        # a 3-word vocabulary makes 10-word chunks collide across (and
        # within) documents constantly; lengths straddle the chunk size
        # so documents end in short tail chunks
        st.lists(
            st.sampled_from(["a", "b", "cc"]), min_size=1, max_size=25
        ).map(" ".join),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_line_rewrite_collision_fuzz(spark, tmp_path_factory, texts):
    """dedup_line_rewrite on tiny-vocabulary corpora: duplicate chunks
    everywhere (keep-first must pick by (doc_id, chunk_idx) order),
    repeated chunks WITHIN one document, sub-10-word documents whose
    single short chunk may still be a corpus-wide duplicate, and the
    rewritten text must reassemble surviving chunks in original order —
    hash-checked character-for-character against the oracle."""
    q = QS["dedup_line_rewrite"]
    base = str(tmp_path_factory.mktemp("linefuzz"))
    _write(
        spark,
        base,
        "documents",
        list(enumerate(texts)),
        "doc_id long, text string",
    )
    problems = compare(q.fn(spark, base), _con(base, "documents"), q.oracle)
    assert not problems, (texts[:5], problems)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            # four timestamps force same-instant click/purchase ties,
            # where ROWS ... 1 PRECEDING + event_id ordering decides
            st.sampled_from(
                [
                    dt.datetime(2024, 1, 1, 9, 0, 0),
                    dt.datetime(2024, 1, 1, 9, 0, 1),
                    dt.datetime(2024, 1, 1, 10, 30, 0),
                    dt.datetime(2024, 2, 1, 0, 0, 0),
                ]
            ),
            st.sampled_from(["click", "purchase", "view"]),
            st.sampled_from([0.0, 1.25, 99.99, 4000.5]),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_last_touch_attribution_ties_fuzz(spark, tmp_path_factory, events):
    """events_attribution_last_touch on random event streams with heavy
    timestamp ties: a purchase at the same instant as a click must only
    attribute to it when the click's event_id orders FIRST (the 1
    PRECEDING frame), purchases before any click stay unattributed, and
    the attributed revenue goes through the decimal hop."""
    q = QS["events_attribution_last_touch"]
    base = str(tmp_path_factory.mktemp("ltafuzz"))
    _write(
        spark,
        base,
        "events",
        [
            (u, ts, i, et, v)
            for i, (u, ts, et, v) in enumerate(events)
        ],
        "user_id long, ts timestamp_ntz, event_id long, "
        "event_type string, value double",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (events[:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # %3 == 0 -> NULL ratio
            # name-shaped strings only: integer-ish segments around '#'
            # (arbitrary strings would probe TRY_CAST semantics the query
            # contract doesn't promise, e.g. DuckDB rounds '12.5'->13)
            st.sampled_from(
                [
                    "Customer#000000007",
                    "Customer#42",
                    "Customer#",
                    "#123",
                    "Customer",
                    "",
                    "42#7#9",
                    "007",
                    "12#x",
                ]
            ),
            st.sampled_from([-999.99, 0.0, 1.5, 4321.25]),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_try_arithmetic_edges_fuzz(spark, tmp_path_factory, rows):
    """fn_try_arithmetic on malformed names and zero divisors: missing
    '#' (out-of-bounds element -> NULL), empty segment after '#'
    (try_cast('') -> NULL), extra segments (element 3 present), purely
    numeric names (bad_parse actually parses), and custkey % 3 == 0
    (try_divide -> NULL, NULLIF twin on the oracle side)."""
    q = QS["fn_try_arithmetic"]
    base = str(tmp_path_factory.mktemp("tryfuzz"))
    _write(
        spark,
        base,
        "customer",
        rows,
        "c_custkey long, c_name string, c_acctbal double",
    )
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (rows[:6], problems)


@given(
    ids=st.lists(
        # negatives probe %-sign agreement between engines (both keep the
        # dividend's sign, so all negative ids fall to the ELSE variant)
        st.integers(min_value=-200, max_value=200),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_url_canonical_variant_classes_fuzz(spark, tmp_path_factory, ids):
    """dedup_url_canonical over arbitrary doc_id sets: every %4 variant
    class (scheme, www-case, tracking params, fragment) must collapse to
    the same canonical key per page, keeper is MIN(doc_id) — including
    negative ids, where the %-of-negative convention has to agree
    between the engines for both the variant class and the page id."""
    q = QS["dedup_url_canonical"]
    base = str(tmp_path_factory.mktemp("urlfuzz"))
    _write(
        spark,
        base,
        "documents",
        [(i,) for i in ids],
        "doc_id long",
    )
    problems = compare(q.fn(spark, base), _con(base, "documents"), q.oracle)
    assert not problems, (ids[:8], problems)


@given(
    suffixes=st.lists(
        # 9-digit suffixes over {0,1,2} at 3 varying positions: dense
        # distance-1 neighborhoods, duplicates (distance 0 — excluded),
        # and distance-2 pairs the mask join must NOT emit
        st.tuples(
            st.sampled_from("012"), st.sampled_from("012"), st.sampled_from("012")
        ).map(lambda t: f"000{t[0]}0{t[1]}0{t[2]}0"),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_fuzzy_name_blocking_complete_fuzz(spark, tmp_path_factory, suffixes):
    """join_fuzzy_name_match's wildcard-mask blocking vs the oracle's
    exhaustive n^2 levenshtein join on fixed-width names (the query's
    stated contract): every substitution-distance-1 pair must surface
    through a shared mask (completeness), duplicates (distance 0) and
    distance-2+ pairs must not (the verify filter), and pairs must
    dedup across the L masks they can share."""
    q = QS["join_fuzzy_name_match"]
    base = str(tmp_path_factory.mktemp("fuzzyfuzz"))
    _write(
        spark,
        base,
        "customer",
        [(i, f"Customer#{s}") for i, s in enumerate(suffixes)],
        "c_custkey long, c_name string",
    )
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (suffixes[:8], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            # 4-value quantity domain -> constant count ties; the mode
            # must break them on the smallest quantity in both engines
            st.sampled_from([1.0, 2.0, 3.0, 50.0]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_mode_tie_break_fuzz(spark, tmp_path_factory, rows):
    """agg_mode_deterministic on tie-heavy count tables: when several
    quantities share the max frequency within a return flag, both
    engines must return the smallest quantity (the deterministic
    tie-break that replaces Spark's arbitrary native mode())."""
    q = QS["agg_mode_deterministic"]
    base = str(tmp_path_factory.mktemp("modefuzz"))
    _write(
        spark,
        base,
        "lineitem",
        rows,
        "l_returnflag string, l_quantity double",
    )
    problems = compare(q.fn(spark, base), _con(base, "lineitem"), q.oracle)
    assert not problems, (rows[:8], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            # keys straddle the 32768-bit bitmap bucket boundary so the
            # per-bucket construct + popcount merge is actually exercised
            st.sampled_from(
                [0, 1, 7, 32767, 32768, 32769, 65535, 65536, 70000]
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_bitmap_distinct_bucket_boundary_fuzz(spark, tmp_path_factory, rows):
    """agg_bitmap_distinct on keys that sit exactly on bitmap bucket
    boundaries (…32767|32768…): the OR-merged popcount per group must
    equal the classic exact distinct count for every return flag, with
    heavy duplicate keys inside and across buckets."""
    q = QS["agg_bitmap_distinct"]
    base = str(tmp_path_factory.mktemp("bmfuzz"))
    _write(
        spark,
        base,
        "lineitem",
        rows,
        "l_returnflag string, l_suppkey long",
    )
    problems = compare(q.fn(spark, base), _con(base, "lineitem"), q.oracle)
    assert not problems, (rows[:8], problems)


@given(
    rows=st.lists(
        st.tuples(
            # keys above 500 must be filtered identically; unique keys keep
            # the NULLS FIRST ranking a total order (the real PK contract)
            st.integers(min_value=0, max_value=600),
            # repeated prices create x-ties the o_orderkey tiebreak resolves
            st.sampled_from([10.0, 10.0, 77.5, 4321.25]),
            st.sampled_from(["O", "F", "P"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    )
)
@settings(**_SETTINGS)
def test_null_semantics_3vl_fuzz(spark, tmp_path_factory, rows):
    """fn_null_semantics on random key sets: the %3/%5 NULL classes hit
    x-NULL-only, y-NULL-only, both-NULL (null-safe TRUE, plain NULL) and
    neither; NULLS FIRST ranking must agree across engines whose default
    null placement differs, with price ties broken on the key."""
    q = QS["fn_null_semantics"]
    base = str(tmp_path_factory.mktemp("nullfuzz"))
    _write(
        spark,
        base,
        "orders",
        rows,
        "o_orderkey long, o_totalprice double, o_orderstatus string",
    )
    problems = compare(q.fn(spark, base), _con(base, "orders"), q.oracle)
    assert not problems, (rows[:8], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # user
            # day offsets straddle the WAU (6/7) and MAU (29/30) lag
            # boundaries and leave >30-day gaps the trim must handle
            st.sampled_from([0, 1, 6, 7, 29, 30, 31, 45]),
            st.sampled_from([3, 12, 23]),  # hour within the day
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_dau_wau_mau_lag_boundary_fuzz(spark, tmp_path_factory, rows):
    """events_dau_wau_mau on sparse activity spanning lag boundaries: a
    user active on day d must count toward WAU through d+6 but not d+7,
    toward MAU through d+29 but not d+30, multiple same-day events must
    collapse to one (user, day) contribution, and target days past the
    last observed day must be trimmed."""
    q = QS["events_dau_wau_mau"]
    base = str(tmp_path_factory.mktemp("daufuzz"))
    _write(
        spark,
        base,
        "events",
        [
            (u, dt.datetime(2024, 1, 1, h) + dt.timedelta(days=off))
            for u, off, h in rows
        ],
        "user_id long, ts timestamp_ntz",
    )
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:8], problems)
