"""Property fuzzing for the four r1-era scalar queries (fn_math,
fn_array, fn_json_from_json, fn_map) ahead of their r9 driver
re-enqueue (VERDICT r7 item 2): their only driver rows are r1-era
failures fixed long ago, so they get the pre-window fuzz treatment the
r7/r8 windows got. This suite already earned its keep while being
written: it exposed the -0.0 divergence (Spark round(-0.0, 1) = 0.0 vs
DuckDB -0.0; Spark signum(-0.0) = -0.0 vs DuckDB sign = 0) that
fn_math now normalizes away with the `+ 0.0` IEEE identity.
"""

from __future__ import annotations

import json
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


# Adversarial doubles: negative zero (the r8 find), exact round-half
# points on representable binary fractions (1.25, -2.75), a classic
# repr-boundary value (2.675 is NOT representable — rounds down), huge
# and tiny magnitudes through the transcendental paths.
_BALS = [
    -0.0, 0.0, 1.25, -1.25, 2.75, -2.75, 2.675, -2.675,
    0.05, -999.99, 9999.99, 1e-8, -1e-8, 123456.78,
]


@given(
    bals=st.lists(st.sampled_from(_BALS), min_size=1, max_size=30)
)
@settings(**_SETTINGS)
def test_fn_math_negative_zero_and_round_half_fuzz(
    spark, tmp_path_factory, bals
):
    """fn_math on -0.0 / exact .x5 round-half inputs: the +0.0
    normalization must make round/floor/ceil/sign/sq agree bitwise, and
    the 6-digit-rounded transcendentals must agree on every value in
    the adversarial set."""
    q = QS["fn_math"]
    base = str(tmp_path_factory.mktemp("mathfuzz"))
    _write(
        spark, base, "customer",
        list(enumerate(bals)), "c_custkey long, c_acctbal double",
    )
    problems = compare(q.fn(spark, base), _con(base, "customer"), q.oracle)
    assert not problems, (bals[:6], problems)


@given(
    vecs=st.lists(
        st.lists(
            # ties (for the head-3 median sort), zeros, negatives; 64
            # dims exactly — the query's element_at(emb, 64) is the
            # fixture contract and THROWS under ANSI on shorter arrays
            st.sampled_from([-2.5, -1.0, 0.0, 0.0, 1.5, 1.5, 3.25]),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_fn_array_ties_fuzz(spark, tmp_path_factory, vecs):
    """fn_array on tie-heavy 64-dim vectors: sort_array vs list_sort
    must agree on duplicate-laden head-3 medians, filter counts on
    boundary zeros, and the float->double cast path."""
    q = QS["fn_array"]
    base = str(tmp_path_factory.mktemp("arrfuzz"))
    _write(
        spark, base, "embeddings",
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    problems = compare(q.fn(spark, base), _con(base, "embeddings"), q.oracle)
    assert not problems, (vecs[0][:6], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view", "purchase"]),
            st.one_of(
                st.integers(min_value=-50, max_value=50).map(
                    lambda k: json.dumps({"k": k})
                ),
                st.just('{"x": 3}'),      # k absent -> NULL in both
                st.just('{"k": null}'),   # explicit null
                st.just("{}"),
                st.none(),                # NULL props row
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_fn_json_from_json_nulls_fuzz(spark, tmp_path_factory, rows):
    """fn_json_from_json on well-formed-but-sparse props: absent keys,
    explicit JSON nulls, empty objects, and NULL rows must all reduce
    to SQL NULL before the SUM in both engines; negative k values sum
    exactly (bigint domain)."""
    q = QS["fn_json_from_json"]
    base = str(tmp_path_factory.mktemp("jsonfuzz"))
    _write(spark, base, "events", rows, "event_type string, props string")
    problems = compare(q.fn(spark, base), _con(base, "events"), q.oracle)
    assert not problems, (rows[:5], problems)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            # names with commas and spaces stress the joined-string
            # serialization; empty string is a legal map value
            st.sampled_from(["ALG,ERIA", "  pad  ", "", "UNITED STATES", "a,b,c"]),
            st.integers(min_value=-3, max_value=7),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    )
)
@settings(**_SETTINGS)
def test_fn_map_serialization_fuzz(spark, tmp_path_factory, rows):
    """fn_map on names containing the join delimiter, empty strings,
    and negative region keys: map construction, element_at, and the
    sorted keys/values serialization must agree character-exact."""
    q = QS["fn_map"]
    base = str(tmp_path_factory.mktemp("mapfuzz"))
    _write(
        spark, base, "nation", rows,
        "n_nationkey long, n_name string, n_regionkey int",
    )
    problems = compare(q.fn(spark, base), _con(base, "nation"), q.oracle)
    assert not problems, (rows[:5], problems)
