"""Property-based oracle fuzzing: randomized predicate + aggregation
trees executed by BOTH engines from the same SQL text.

The reference ships a single golden e2e test and no randomized testing
(SURVEY §5.1); the driver's oracle harness checks fixed queries. This
closes the gap between them: hypothesis generates small but arbitrary
WHERE trees (comparisons over numeric/string lineitem columns composed
with AND/OR/NOT) and the harness asserts Spark and DuckDB agree on the
filtered row count and a decimal-domain aggregate — the same
order-independence discipline the registry uses (functions/numeric).

Runs at sf0.001 (~6k lineitem rows) so each example is a sub-second
Spark job; 25 examples keep the suite fast while walking a far larger
predicate space than any fixed query set.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_orderkey"]
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
OPS = ["<", "<=", ">", ">=", "=", "<>"]


def _num_pred(draw) -> str:
    col = draw(st.sampled_from(NUM_COLS))
    op = draw(st.sampled_from(OPS))
    if col == "l_orderkey":
        lit = str(draw(st.integers(min_value=0, max_value=7000)))
    elif col in ("l_discount", "l_tax"):
        lit = f"{draw(st.floats(min_value=0.0, max_value=0.12, allow_nan=False)):.4f}"
    elif col == "l_quantity":
        lit = f"{draw(st.floats(min_value=0.0, max_value=55.0, allow_nan=False)):.2f}"
    else:
        lit = f"{draw(st.floats(min_value=0.0, max_value=120000.0, allow_nan=False)):.2f}"
    return f"({col} {op} {lit})"


def _str_pred(draw) -> str:
    col = draw(st.sampled_from(sorted(STR_COLS)))
    op = draw(st.sampled_from(["=", "<>"]))
    lit = draw(st.sampled_from(STR_COLS[col]))
    return f"({col} {op} '{lit}')"


@st.composite
def predicates(draw, depth: int = 0) -> str:
    kind = draw(st.integers(min_value=0, max_value=5 if depth < 2 else 3))
    if kind <= 2:
        return _num_pred(draw)
    if kind == 3:
        return _str_pred(draw)
    a = draw(predicates(depth=depth + 1))
    b = draw(predicates(depth=depth + 1))
    junction = draw(st.sampled_from(["AND", "OR"]))
    neg = "NOT " if draw(st.booleans()) else ""
    return f"{neg}({a} {junction} {b})"


@pytest.fixture(scope="module")
def fuzz_env(spark):
    sf_dir = "/root/testdata/sf0.001"
    from avro_topic_replication_spark.catalog import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_fuzz")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem_fuzz AS "
        f"SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return spark, con


@given(pred=predicates())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_predicates_agree(fuzz_env, pred):
    spark, con = fuzz_env
    sql = f"""
        SELECT COUNT(*) AS n,
               CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE)
                 AS qty
        FROM lineitem_fuzz WHERE {pred}
    """
    srow = spark.sql(sql).collect()[0]
    drow = con.execute(sql).fetchone()
    assert srow["n"] == drow[0], pred
    assert srow["qty"] == pytest.approx(drow[1], abs=0), pred


@given(pred=predicates())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_grouped_aggregates_agree(fuzz_env, pred):
    spark, con = fuzz_env
    sql = f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total
        FROM lineitem_fuzz WHERE {pred}
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    drows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert srows == drows, pred


@pytest.fixture(scope="module")
def fuzz_join_env(fuzz_env):
    spark, con = fuzz_env
    from avro_topic_replication_spark.catalog import load_table

    load_table(spark, "/root/testdata/sf0.001", "orders").createOrReplaceTempView(
        "orders_fuzz"
    )
    con.execute(
        "CREATE VIEW orders_fuzz AS "
        "SELECT * FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    return spark, con


@given(pred=predicates(), how=st.sampled_from(["JOIN", "LEFT JOIN"]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_aggregates_agree(fuzz_join_env, pred, how):
    """Random predicate under a lineitem⋈orders equi-join: both engines
    must agree on per-priority counts and a decimal revenue sum. LEFT
    JOIN keeps order rows whose lines were all filtered out, exercising
    null-extension; the WHERE applies to the probe side only so the
    left-join semantics stay visible."""
    spark, con = fuzz_join_env
    sql = f"""
        SELECT o.o_orderpriority,
               COUNT(l.l_orderkey) AS n_lines,
               CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 0)
                    AS DOUBLE) AS total
        FROM orders_fuzz o
        {how} (SELECT * FROM lineitem_fuzz WHERE {pred}) l
          ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    drows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert srows == drows, (pred, how)


# --- window-frame fuzzing -------------------------------------------------

_PART_COLS = ["l_returnflag", "l_linestatus", "l_orderkey % 7"]
_ORDER_NUM_COLS = ["l_quantity", "l_extendedprice", "l_orderkey"]


@st.composite
def window_specs(draw) -> str:
    """Random PARTITION BY / ORDER BY / frame. ROWS frames order by every
    column the test observes (synthetic lineitem has no unique key, so
    rows still tied after the full tiebreak are identical in all observed
    columns — engine-swappable under the multiset compare); RANGE frames
    may keep a tied numeric key (all peers are included either way)."""
    part = draw(st.sampled_from(_PART_COLS))
    kind = draw(st.sampled_from(["ROWS", "RANGE"]))
    lo = draw(st.sampled_from(["UNBOUNDED PRECEDING", "5 PRECEDING",
                               "2 PRECEDING", "CURRENT ROW"]))
    hi = draw(st.sampled_from(["CURRENT ROW", "2 FOLLOWING", "5 FOLLOWING",
                               "UNBOUNDED FOLLOWING"]))
    if lo == "CURRENT ROW" and hi == "CURRENT ROW":
        hi = "UNBOUNDED FOLLOWING"
    ordr = draw(st.sampled_from(_ORDER_NUM_COLS))
    if kind == "ROWS":
        order_by = f"{ordr}, l_orderkey, l_linenumber, l_quantity, l_extendedprice"
    else:
        order_by = ordr
    return f"(PARTITION BY {part} ORDER BY {order_by} {kind} BETWEEN {lo} AND {hi})"


@given(spec=window_specs(), agg=st.sampled_from(
    ["SUM(CAST(l_quantity AS DECIMAL(18,4)))", "COUNT(*)",
     "MIN(l_extendedprice)", "MAX(l_extendedprice)"]))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_frames_agree(fuzz_env, spec, agg):
    """Random partition/order/frame specs (ROWS and RANGE, every bound
    combination) must produce identical per-row frame aggregates in both
    engines — the discipline that keeps the windows.py family honest
    generalized over the whole spec space."""
    spark, con = fuzz_env
    sql = f"""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               CAST({agg} OVER w AS DOUBLE) AS wval
        FROM lineitem_fuzz
        WINDOW w AS {spec}
    """
    # multiset compare: lineitem has no unique key, so output order on
    # tied keys is engine-defined even though every frame value is not
    srows = sorted(tuple(r) for r in spark.sql(sql).collect())
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == drows, (spec, agg)


# --- grouping-sets fuzzing ------------------------------------------------

_GROUP_SPECS = [
    "CUBE (l_returnflag, l_linestatus)",
    "ROLLUP (l_returnflag, l_linestatus)",
    "ROLLUP (l_linestatus, l_returnflag)",
    "GROUPING SETS ((l_returnflag), (l_linestatus))",
    "GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())",
    "GROUPING SETS ((), (l_returnflag, l_linestatus))",
]


@given(pred=predicates(), spec=st.sampled_from(_GROUP_SPECS))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_grouping_sets_agree(fuzz_env, pred, spec):
    """Random predicates under every multi-grain grouping shape: counts,
    decimal sums and GROUPING() flags must match row-for-row (rows
    compared as sorted multisets — NULL group keys sort engine-neutrally
    python-side).

    Known engine divergence, found by this fuzzer and excluded by the
    non-empty assume: on EMPTY input the SQL standard (and DuckDB) emit
    one row for the () grouping set — like a global aggregate — while
    Spark's cube/rollup/grouping-sets emit zero rows."""
    from hypothesis import assume

    spark, con = fuzz_env
    assume(con.execute(f"SELECT count(*) FROM lineitem_fuzz WHERE {pred}").fetchone()[0] > 0)
    sql = f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE)
                 AS qty,
               CAST(GROUPING(l_returnflag) AS INT) AS g1,
               CAST(GROUPING(l_linestatus) AS INT) AS g2
        FROM lineitem_fuzz WHERE {pred}
        GROUP BY {spec}
    """
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    srows = sorted((tuple(r) for r in spark.sql(sql).collect()), key=key)
    drows = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=key)
    assert srows == drows, (pred, spec)


def test_token_gram_helper_cross_engine_parity(spark):
    """The llm_curation token-n-gram helper must produce identical gram
    sets in Spark (split + transform/slice) and DuckDB (string_split +
    list_transform/list_slice) on adversarial inputs: empty strings,
    leading/trailing/double spaces (empty tokens are KEPT by both
    engines' splitters — parity matters more than prettiness), unicode
    tokens, and texts shorter than n."""
    import duckdb
    import pandas as pd

    from avro_topic_replication_spark.queries.llm_curation import (
        _token_grams,
        _token_grams_sql,
    )
    from pyspark.sql import functions as F

    texts = [
        "",
        " ",
        "one",
        "a b",
        "a b c d e f g h",
        "a  b   c",  # runs of spaces -> empty tokens
        " lead and trail ",
        "héllo wörld ünïcode tökens here now",
        "x " * 50,
        "same same same same same",
    ]
    for n in (2, 4, 8):
        sdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id int, text string"
        ).select("id", _token_grams(F.col("text"), n).alias("g"))
        got = {r["id"]: sorted(r["g"]) for r in sdf.collect()}
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"id": range(len(texts)), "text": texts}))
        sql = f"SELECT id, {_token_grams_sql('text', n)} AS g FROM t"
        want = {int(r[0]): sorted(r[1]) for r in con.execute(sql).fetchall()}
        assert got == want, f"n={n}: {got} != {want}"


def test_array_higher_order_cross_engine_parity(spark):
    """Higher-order array functions over randomized int arrays (fixed
    seed): Spark's transform/filter/aggregate/zip_with/slice/distinct/
    sort against DuckDB's list_* dialect — the array surface the scalar
    registry queries rely on, swept over 60 random arrays including
    empties and duplicates."""
    import duckdb
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    arrays = [
        rng.integers(-20, 20, size=rng.integers(0, 12)).tolist() for _ in range(60)
    ]
    pdf = pd.DataFrame({"id": range(len(arrays)), "a": arrays})
    sdf = spark.createDataFrame(pdf.assign(a=pdf.a.map(list)))
    sdf.createOrReplaceTempView("arr_t")
    con = duckdb.connect()
    con.register("arr_t", pdf)

    # second dialect difference from this sweep: DuckDB's
    # array_to_string returns NULL for an empty list where Spark's
    # array_join returns '' — the coalesces below pin that down
    cases = [  # (spark SQL expr, duckdb SQL expr)
        ("size(a)", "len(a)"),
        # dialect difference found by this sweep: DuckDB's list_reduce
        # ERRORS on an empty list (Spark's seeded aggregate returns the
        # seed) — any oracle using list_reduce must guard emptiness
        ("aggregate(a, CAST(0 AS BIGINT), (acc, x) -> acc + x)",
         "CASE WHEN len(a) = 0 THEN 0 ELSE list_reduce(a, (acc, x) -> acc + x) END"),
        ("array_join(transform(a, x -> x * 2 + 1), ',')",
         "coalesce(array_to_string(list_transform(a, x -> x * 2 + 1), ','), '')"),
        ("array_join(filter(a, x -> x > 0), ',')",
         "coalesce(array_to_string(list_filter(a, x -> x > 0), ','), '')"),
        ("array_join(slice(a, 1, 3), ',')",
         "coalesce(array_to_string(list_slice(a, 1, 3), ','), '')"),
        ("array_join(array_sort(array_distinct(a)), ',')",
         "coalesce(array_to_string(list_sort(list_distinct(a)), ','), '')"),
        ("array_join(zip_with(a, a, (x, y) -> x + y), ',')",
         "coalesce(array_to_string(list_transform(a, x -> x + x), ','), '')"),
        ("array_max(a)", "list_aggregate(a, 'max')"),
        ("array_position(a, 3)", "coalesce(list_position(a, 3), 0)"),
        ("array_contains(a, 7)", "list_contains(a, 7)"),
    ]
    for s_expr, d_expr in cases:
        got = {r["id"]: r["v"] for r in
               spark.sql(f"SELECT id, {s_expr} AS v FROM arr_t").collect()}
        want = {int(r[0]): r[1] for r in
                con.execute(f"SELECT id, {d_expr} AS v FROM arr_t").fetchall()}
        norm = lambda v: None if v is None else (int(v) if isinstance(v, (bool, int)) and not isinstance(v, bool) else v)
        for i in got:
            g, w = got[i], want[i]
            if isinstance(g, bool) or isinstance(w, bool):
                assert bool(g) == bool(w), (s_expr, i, g, w)
            else:
                assert (g is None and w is None) or g == w or (
                    g is not None and w is not None and int(g) == int(w)
                ), (s_expr, i, g, w)


def test_set_operations_cross_engine_parity(spark):
    """Set-operation fuzz: all six operators (UNION / UNION ALL /
    INTERSECT [ALL] / EXCEPT [ALL]) over randomized two-column tables
    (fixed seed) that include NULLs and duplicate rows — pinning the
    NULL-equality and multiplicity semantics the setops registry family
    relies on, across 8 random table pairs."""
    import duckdb
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    con = duckdb.connect()
    ops = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
           "EXCEPT", "EXCEPT ALL"]
    for trial in range(8):
        def mk(n):
            a = rng.integers(0, 4, size=n).astype(object)
            a[rng.random(n) < 0.2] = None
            b = rng.integers(0, 3, size=n).astype(object)
            b[rng.random(n) < 0.2] = None
            return pd.DataFrame({"a": a, "b": b})

        ta, tb = mk(int(rng.integers(5, 25))), mk(int(rng.integers(5, 25)))
        spark.createDataFrame(ta.astype("object"), "a long, b long") \
            .createOrReplaceTempView("fz_sa")
        spark.createDataFrame(tb.astype("object"), "a long, b long") \
            .createOrReplaceTempView("fz_sb")
        con.register("fz_da", ta)
        con.register("fz_db", tb)
        for op in ops:
            got = sorted(
                ((r["a"], r["b"]) for r in spark.sql(
                    f"SELECT a, b FROM fz_sa {op} SELECT a, b FROM fz_sb"
                ).collect()),
                key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
            )
            want = sorted(
                ((None if pd.isna(x) else int(x), None if pd.isna(y) else int(y))
                 for x, y in con.execute(
                     f"SELECT a, b FROM fz_da {op} SELECT a, b FROM fz_db"
                 ).fetchall()),
                key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
            )
            got = [(None if x is None else int(x),
                    None if y is None else int(y)) for x, y in got]
            assert got == want, (trial, op, got, want)


@given(data=st.lists(
    st.tuples(st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                        width=32),
              st.integers(min_value=0, max_value=500)),
    min_size=1, max_size=60,
))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_banded_two_phase_cumsum_equals_global_window(spark, data):
    """The banded two-phase prefix sum used by sample_token_budget (and
    pack_sequences_chunks) must equal a naive single-partition global
    window for arbitrary (score, n_tokens) inputs — including duplicate
    scores, zero counts, and scores landing exactly on band boundaries
    (floor(50·score) edges), where a band-vs-order mismatch would
    misattribute the offset."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, float(s), int(n)) for i, (s, n) in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    banded = df.withColumn("band", (-F.floor(F.col("score") * 50)).cast("int"))
    local = Window.partitionBy("band").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).rowsBetween(Window.unboundedPreceding, -1)
    totals = banded.groupBy("band").agg(F.sum("n_tokens").alias("tot"))
    off_w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "band", F.coalesce(F.sum("tot").over(off_w), F.lit(0)).alias("offset")
    )
    two_phase = (
        banded.withColumn(
            "cum_local", F.coalesce(F.sum("n_tokens").over(local), F.lit(0))
        )
        .join(F.broadcast(offsets), "band")
        .select("doc_id", (F.col("offset") + F.col("cum_local")).alias("cum"))
    )
    naive_w = Window.orderBy(F.desc("score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = df.select(
        "doc_id", F.coalesce(F.sum("n_tokens").over(naive_w), F.lit(0)).alias("cum")
    )
    got = {r["doc_id"]: r["cum"] for r in two_phase.collect()}
    want = {r["doc_id"]: r["cum"] for r in naive.collect()}
    assert got == want


@given(raw=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),   # user key
              st.integers(min_value=0, max_value=40),  # ts
              st.booleans()),                          # is_click
    min_size=1, max_size=40,
))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_carry_forward_matches_duckdb_asof_join(spark, raw):
    """The union+carry-forward as-of join (join_asof_click_view's
    algorithm) must agree with DuckDB's NATIVE ASOF LEFT JOIN — an
    independent implementation, not a SQL re-statement of ours — on
    arbitrary event sets. View (user, ts) pairs are deduplicated so the
    ASOF match is unique and both sides are deterministic."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    clicks, views = [], {}
    for i, (u, ts, is_click) in enumerate(raw):
        if is_click:
            clicks.append((i, u, ts))
        else:
            views[(u, ts)] = (i, u, ts)  # unique (user, ts) per view
    views = list(views.values())
    if not clicks:
        return

    # Spark: tagged union + one carry-forward window per user
    rows = [(eid, u, ts, 1, None) for eid, u, ts in clicks] + [
        (eid, u, ts, 0, eid) for eid, u, ts in views
    ]
    df = spark.createDataFrame(
        rows, "eid long, user long, ts long, is_click int, vid long"
    )
    w = (
        Window.partitionBy("user")
        .orderBy("ts", "is_click", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["eid"]: r["v"]
        for r in df.withColumn("v", F.last("vid", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE c(eid BIGINT, u BIGINT, ts BIGINT)")
    con.execute("CREATE TABLE v(eid BIGINT, u BIGINT, ts BIGINT)")
    con.executemany("INSERT INTO c VALUES (?,?,?)", clicks)
    if views:
        con.executemany("INSERT INTO v VALUES (?,?,?)", views)
    want = {
        eid: vid
        for eid, vid in con.execute(
            """
            SELECT c.eid, v.eid FROM c
            ASOF LEFT JOIN v ON c.u = v.u AND v.ts <= c.ts
            """
        ).fetchall()
    }
    assert got == want


@given(docs=st.lists(
    st.lists(
        st.sampled_from(["aa", "b", "cc", "d", "é", "zz"]),
        min_size=0, max_size=8,
    ).map(" ".join),
    min_size=1, max_size=12,
))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lm_perplexity_fuzz_random_corpora(spark, tmp_path_factory, docs):
    """The REAL text_lm_perplexity query function against its REAL oracle
    SQL on adversarial random corpora: empty documents, one-token docs
    (no bigrams), all-identical docs, non-ASCII tokens, and train/held
    splits where either side can be empty. Catches smoothing and
    split-boundary bugs the fixed synthetic corpus can't reach."""
    from avro_topic_replication_spark.queries import all_queries
    from tests.oracle import compare

    q = all_queries()["text_lm_perplexity"]
    base = str(tmp_path_factory.mktemp("lmfuzz"))
    rows = [(i, t, "en", "fuzz", len(t)) for i, t in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'documents.parquet')}/*.parquet')"
    )
    problems = compare(q.fn(spark, base), con, q.oracle)
    assert not problems, (docs, problems)
    # same adversarial corpus through the char-entropy signal (r6):
    # empty docs, single-char docs, non-ASCII, constant stretches
    q2 = all_queries()["text_char_entropy"]
    problems = compare(q2.fn(spark, base), con, q2.oracle)
    assert not problems, (docs, problems)


@given(
    vals=st.lists(
        st.one_of(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
            st.just(42.0),  # bias toward ties / constant stretches
        ),
        min_size=1,
        max_size=40,
    ),
    qlo=st.floats(min_value=0.0, max_value=0.5, allow_nan=False),
    qhi=st.floats(min_value=0.5, max_value=1.0, allow_nan=False),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_percentile_two_phase_fuzz(spark, vals, qlo, qhi):
    """The scale-safe two-phase bucket-rank percentile (r6 replacement
    for agg_winsorized_mean's single-buffer percentile()) against
    DuckDB's quantile_cont on random distributions: constant columns,
    ties, single values, negative ranges, arbitrary quantiles. An
    off-by-one in the rank→bucket routing or the interpolation frac
    shows up far above the 1e-9 tolerance (the registry's oracle gate
    separately pins bit-exactness on the real data)."""
    from avro_topic_replication_spark.queries.aggregates import (
        _exact_percentiles_scalable,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = _exact_percentiles_scalable(
        spark, df, "v", {"lo": qlo, "hi": qhi}
    ).first()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        "SELECT quantile_cont(v, ?) AS lo, quantile_cont(v, ?) AS hi FROM t",
        [qlo, qhi],
    ).fetchone()
    for g, w in zip((got["lo"], got["hi"]), want):
        assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (vals, qlo, qhi, got, want)


@given(
    gaps=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),    # user id
            st.integers(min_value=0, max_value=30),   # day offset
            st.integers(min_value=0, max_value=2),    # events that day
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_activity_streaks_fuzz_random_gaps(spark, tmp_path_factory, gaps):
    """The REAL events_activity_streaks query vs its REAL oracle SQL on
    random gap patterns: repeated days (multiple events per day must
    collapse), isolated days, runs that tie in length (earliest-start
    tie-break), and users whose entire history is one day. Catches
    anchor-arithmetic and tie-break bugs the fixed corpus can't reach."""
    import datetime as dt

    from avro_topic_replication_spark.queries import all_queries
    from tests.oracle import compare

    q = all_queries()["events_activity_streaks"]
    base = str(tmp_path_factory.mktemp("streakfuzz"))
    rows = []
    i = 0
    for user, day, n_ev in gaps:
        for k in range(n_ev + 1):
            rows.append(
                (
                    f"u{user}",
                    dt.datetime(2024, 3, 1, 8, 0, 0)
                    + dt.timedelta(days=day, minutes=13 * k),
                    "click",
                    i,
                )
            )
            i += 1
    spark.createDataFrame(
        rows, "user_id string, ts timestamp_ntz, event_type string, event_id long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'events.parquet')}/*.parquet')"
    )
    problems = compare(q.fn(spark, base), con, q.oracle)
    assert not problems, (gaps, problems)


@given(
    regions=st.lists(
        st.sampled_from(["EUROPE", "AFRICA", "MIDDLE EAST", "ASIA", "AMERICA"]),
        min_size=0,
        max_size=5,
        unique=True,
    ),
    tag=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
    ),
    band_cut=st.integers(min_value=1000, max_value=90000),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_variables_and_sql_udf_fuzz(spark, regions, tag, band_cut):
    """Random parameters through BOTH Spark-4 procedural-SQL surfaces:
    session variables (DECLARE/array binding, arbitrary region subsets
    incl. empty, arbitrary tag strings) and SQL-language UDFs (random
    band threshold) — each against a DuckDB twin with the same values
    inlined. Pins that variable binding and UDF inlining are value-
    faithful for ANY parameter, not just the registry's constants."""
    sf_dir = "/root/testdata/sf0.001"
    from avro_topic_replication_spark.catalog import load_table
    from tests.oracle import compare

    con = duckdb.connect()
    for t in ("nation", "region", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_svf")

    arr = ", ".join(f"'{r}'" for r in regions)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE fuzz_regions ARRAY<STRING> "
        f"DEFAULT array({arr})" if regions else
        "DECLARE OR REPLACE VARIABLE fuzz_regions ARRAY<STRING> "
        "DEFAULT array()"
    )
    spark.sql(f"DECLARE OR REPLACE VARIABLE fuzz_tag STRING DEFAULT '{tag}'")
    sdf = spark.sql(
        """
        SELECT r_name, count(*) AS n_nations, fuzz_tag AS tag
        FROM nation_svf JOIN region_svf ON n_regionkey = r_regionkey
        WHERE array_contains(fuzz_regions, r_name)
        GROUP BY r_name
        """
    )
    in_list = f"({arr})" if regions else "(NULL)"
    oracle = f"""
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations, '{tag}' AS tag
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN {in_list}
        GROUP BY r_name
    """
    problems = compare(sdf, con, oracle)
    assert not problems, (regions, tag, problems)

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION fuzz_band(p DOUBLE) "
        f"RETURNS STRING RETURN CASE WHEN p >= {band_cut} THEN 'hi' ELSE 'lo' END"
    )
    sdf2 = spark.sql(
        """
        SELECT fuzz_band(l_extendedprice) AS band, count(*) AS n
        FROM lineitem_svf GROUP BY 1
        """
    )
    oracle2 = f"""
        SELECT CASE WHEN l_extendedprice >= {band_cut} THEN 'hi' ELSE 'lo' END
                   AS band,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
    """
    problems2 = compare(sdf2, con, oracle2)
    assert not problems2, (band_cut, problems2)


@given(
    pattern=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=7200),   # seconds offset
            st.sampled_from(["click", "view", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_fuzz_random_gaps(spark, tmp_path_factory, pattern):
    """The REAL events_sessionize_batch query vs its REAL oracle on
    random event patterns: gaps straddling exactly 1800 s, identical
    timestamps for one user (event_id breaks the tie), single-event
    sessions, and interleaved users. Catches boundary (>1800 vs >=) and
    ordering bugs the fixed corpus can't reach."""
    import datetime as dt

    from avro_topic_replication_spark.queries import all_queries
    from tests.oracle import compare

    q = all_queries()["events_sessionize_batch"]
    base = str(tmp_path_factory.mktemp("sessfuzz"))
    rows = [
        (
            i,
            dt.datetime(2024, 5, 1) + dt.timedelta(seconds=sec),
            user,
            etype,
            1.0,
            "{}",
        )
        for i, (user, sec, etype) in enumerate(pattern)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'events.parquet')}/*.parquet')"
    )
    problems = compare(q.fn(spark, base), con, q.oracle)
    assert not problems, (pattern, problems)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.floats(min_value=-1e5, max_value=1e5, allow_nan=False, width=64),
        ),
        min_size=1,
        max_size=40,
    ),
    q=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_percentile_grouped_fuzz(spark, vals, q):
    """The GROUPED two-phase bucket-rank percentile (r6, feeds
    agg_percentiles) against DuckDB's quantile_cont GROUP BY on random
    groups and distributions: single-value groups, constant groups,
    arbitrary quantiles. Both engines use the symmetric interpolation
    v1·(1-f) + v2·f, so the comparison is exact."""
    from avro_topic_replication_spark.queries.aggregates import (
        _exact_percentiles_grouped,
    )

    df = spark.createDataFrame([(f"g{g}", v) for g, v in vals], "grp string, v double")
    got = {
        r["grp"]: r["p"]
        for r in _exact_percentiles_grouped(
            spark, df, "grp", "v", {"p": q}
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(f"g{g}", v) for g, v in vals])
    want = dict(
        con.execute(
            # parameter-bound q: a bare 17-digit literal types as
            # DECIMAL(18,17) in DuckDB and the DECIMAL->DOUBLE conversion
            # can land 1 ulp off the exact double (mantissa > 2^53)
            "SELECT grp, quantile_cont(v, ?) FROM t GROUP BY grp",
            [q],
        ).fetchall()
    )
    assert set(got) == set(want)
    for g in want:
        assert got[g] == want[g], (g, got[g], want[g], vals, q)


@given(
    series=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=64),
        ),
        min_size=2,
        max_size=50,
    ),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sequential_fold_fuzz_ewma_holt(spark, series):
    """The EWMA and Holt left folds (r6, ts_ewma_per_user/ts_holt_linear
    shape) against DuckDB list_reduce on random grouped series — exact,
    no tolerance. Exercises the DuckDB-1.0 struct-lambda in-place-
    accumulator quirk workaround (DOUBLE[] state in the oracle) across
    arbitrary series lengths including the 1- and 2-point edges."""
    from pyspark.sql import functions as F

    rows = [(g, i, float(v)) for i, (g, v) in enumerate(series)]
    df = spark.createDataFrame(rows, "grp int, seq int, v double")
    g = df.groupBy("grp").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("seq", "v"))),
            lambda s: s["v"],
        ).alias("vals")
    )
    n = F.size("vals")
    ewma = F.aggregate(
        F.slice("vals", 2, F.greatest(n - 1, F.lit(0))),
        F.element_at("vals", 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    x1, x2 = F.element_at("vals", 1), F.element_at("vals", 2)
    holt = F.aggregate(
        F.slice("vals", 3, F.greatest(n - 2, F.lit(0))),
        F.struct(x2.alias("l"), (x2 - x1).alias("b")),
        lambda a, x: F.struct(
            (F.lit(0.5) * x + F.lit(0.5) * (a["l"] + a["b"])).alias("l"),
            (
                F.lit(0.3)
                * ((F.lit(0.5) * x + F.lit(0.5) * (a["l"] + a["b"])) - a["l"])
                + F.lit(0.7) * a["b"]
            ).alias("b"),
        ),
    )
    got = {
        r["grp"]: (r["ewma"], r["l"], r["b"])
        for r in g.select(
            "grp",
            ewma.alias("ewma"),
            F.when(n >= 2, holt["l"]).alias("l"),
            F.when(n >= 2, holt["b"]).alias("b"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp INT, seq INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute("""
            WITH s AS (
                SELECT grp, list(v ORDER BY seq) AS vals FROM t GROUP BY grp
            )
            SELECT grp,
                   list_reduce(vals, (a, x) -> 0.2::DOUBLE * x + 0.8::DOUBLE * a),
                   CASE WHEN len(vals) >= 2 THEN
                     list_reduce(
                       list_prepend([vals[2], vals[2], vals[2] - vals[1]],
                                    list_transform(vals[3:], x ->
                                      [CAST(x AS DOUBLE), 0.0::DOUBLE, 0.0::DOUBLE])),
                       (a, e) -> [e[1],
                                  0.5::DOUBLE * e[1] + 0.5::DOUBLE * (a[2] + a[3]),
                                  0.3::DOUBLE * ((0.5::DOUBLE * e[1]
                                                  + 0.5::DOUBLE * (a[2] + a[3]))
                                                 - a[2])
                                    + 0.7::DOUBLE * a[3]])[2]
                   END,
                   CASE WHEN len(vals) >= 2 THEN
                     list_reduce(
                       list_prepend([vals[2], vals[2], vals[2] - vals[1]],
                                    list_transform(vals[3:], x ->
                                      [CAST(x AS DOUBLE), 0.0::DOUBLE, 0.0::DOUBLE])),
                       (a, e) -> [e[1],
                                  0.5::DOUBLE * e[1] + 0.5::DOUBLE * (a[2] + a[3]),
                                  0.3::DOUBLE * ((0.5::DOUBLE * e[1]
                                                  + 0.5::DOUBLE * (a[2] + a[3]))
                                                 - a[2])
                                    + 0.7::DOUBLE * a[3]])[3]
                   END
            FROM s
        """).fetchall()
    }
    assert got == want, (got, want, series)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=40,
    ),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangle_count_fuzz_vs_bruteforce(spark, edges):
    """The oriented wedge-close triangle enumeration (r6,
    graph_triangle_count shape) on random graphs vs an independent
    Python brute force over all id triples — checks each triangle is
    counted exactly once, self-loops and duplicate/reversed input edges
    are collapsed, and the empty graph yields zero."""
    from itertools import combinations

    from pyspark.sql import functions as F

    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nodes = sorted({n for e in canon for n in e})
    want = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in canon and (b, c) in canon and (a, c) in canon
    )
    df = spark.createDataFrame(
        [(u, v) for u, v in edges] or [(0, 0)], "u int, v int"
    )
    e = (
        df.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("s1"), F.greatest("u", "v").alias("s2")
        )
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    got = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e3.s1") == F.col("e1.s1"))
            & (F.col("e3.s2") == F.col("e2.s2")),
        )
        .count()
    )
    assert got == want, (sorted(canon), got, want)


@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b"]),          # event_type
              st.integers(min_value=0, max_value=20),   # day offset
              st.integers(min_value=0, max_value=2000)),  # value in 0.05 steps
    min_size=1, max_size=120,
))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_timeseries_fold_queries_fuzz(spark, tmp_path_factory, rows):
    """The REAL ts_cusum_drift / ts_autocorrelation / ts_seasonal_baseline
    against their REAL oracles on adversarial random events: daily counts
    of 2^a·5^b so the per-day mean quotients land EXACTLY on decimal
    rounding boundaries (the cross-engine trap the r6 rewrite removed —
    Spark rounds the exact binary value, DuckDB the shortest repr, and
    49.49475-style quotients split them), types with <8 days (dropped by
    the lag-7 guard on both sides), single-day types, and constant
    stretches."""
    import datetime as _dt

    from avro_topic_replication_spark.queries import all_queries
    from tests.oracle import compare

    qs = all_queries()
    base = str(tmp_path_factory.mktemp("tsfuzz"))
    epoch = _dt.datetime(2024, 1, 1, 12, 0, 0)
    data = [
        (i, epoch + _dt.timedelta(days=day), i % 7, et, k * 0.05, "")
        for i, (et, day, k) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'events.parquet')}/*.parquet')"
    )
    for name in ("ts_cusum_drift", "ts_autocorrelation", "ts_seasonal_baseline"):
        problems = compare(qs[name].fn(spark, base), con, qs[name].oracle)
        assert not problems, (name, rows[:10], problems)


@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),      # user
              st.integers(min_value=0, max_value=400),    # minutes offset
              st.sampled_from(["purchase", "click", "view"])),
    min_size=1, max_size=60,
))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_event_shape_queries_fuzz(spark, tmp_path_factory, rows):
    """The REAL ts_linear_interpolate / events_top_paths /
    stream_dynamic_session_window against their REAL oracles on
    adversarial random events: duplicate timestamps (tie-broken by
    event_id), events landing EXACTLY on a session's previous interval
    end (minute-grain offsets vs 15/40-minute gaps force boundary
    collisions), single-event users, and all-same-type bursts."""
    import datetime as _dt

    from avro_topic_replication_spark.queries import all_queries
    from tests.oracle import compare

    qs = all_queries()
    base = str(tmp_path_factory.mktemp("evfuzz"))
    epoch = _dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (i, epoch + _dt.timedelta(minutes=mins), user, et, float(i % 7), "")
        for i, (user, mins, et) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'events.parquet')}/*.parquet')"
    )
    for name in (
        "events_top_paths",
        "stream_dynamic_session_window",
        "events_inter_arrival_stats",
    ):
        problems = compare(qs[name].fn(spark, base), con, qs[name].oracle)
        assert not problems, (name, rows[:10], problems)
