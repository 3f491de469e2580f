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
