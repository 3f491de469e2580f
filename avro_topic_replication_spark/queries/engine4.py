"""Spark 4 engine surface: recursive CTEs, VARIANT, collations, and
table-argument UDTFs.

Four capabilities that landed in Spark 4.x and round out the relational
surface a user migrating from any mature engine expects:

- ``sql_recursive_month_series``: WITH RECURSIVE generating a dense month
  spine joined to fact aggregates (the calendar-fill idiom; recursion
  replaces a sequence/EXPLODE generator).
- ``fn_variant_json``: the VARIANT semi-structured type — parse_json into
  variant, typed variant_get extraction, null/errors semantics.
- ``fn_collation_lcase``: UTF8_LCASE collation — case-insensitive
  equality, DISTINCT, and grouping as engine semantics rather than
  lower() rewrites.
- ``udf_udtf_table_arg``: a UDTF consuming ``TABLE(...) PARTITION BY``
  input — the SQL-native form of grouped custom table functions.

Batch 2 (same round) adds the rest of the daily-driver engine surface:
``sql_pipe_syntax`` (|> chains), ``sql_group_by_all_offset`` (GROUP BY
ALL / ORDER BY ALL / OFFSET), ``fn_lateral_column_alias`` (select-list
derivation chains), ``agg_observe_metrics`` (observe() named metrics —
input accounting from the same job, no second scan), and
``join_runtime_bloom_filter`` (runtime bloom-filter pruning of a shuffle
join's application side — the mechanism that keeps selective fact⋈dim
joins shuffle-light at 100 TB).

All run against the driver testdata and hash-match DuckDB oracles
(the UDTF via a window-function twin). Reference parity: none (the
reference has no SQL surface); [EXT] per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec_sum
from . import query


@query(
    "sql_recursive_month_series",
    oracle="""
        WITH RECURSIVE months(m) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT (m + INTERVAL 1 MONTH)::DATE FROM months
            WHERE m < DATE '2001-08-01'
        ),
        per_month AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
                   COUNT(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS total_price
            FROM orders GROUP BY 1
        )
        SELECT months.m AS month,
               CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders,
               COALESCE(p.total_price, 0.0) AS total_price
        FROM months LEFT JOIN per_month p ON p.mo = months.m
    """,
    tags=("sql", "recursive"),
)
def sql_recursive_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4): generate the dense month spine covering
    the order history, then left-join monthly order aggregates so empty
    months surface as zero rows — the calendar-gap-fill idiom, with the
    spine produced by actual SQL recursion instead of sequence()+explode
    (ts_resample_gapfill shows the generator form; this is the recursive
    twin a SQL-first user ports verbatim).

    Scale: the recursion materializes 80 driver-coordinated rows — depth
    bounded, data-independent — and broadcast-joins to the monthly
    aggregate, whose shuffle is one row per (month): the recursive arm
    never touches fact-table volume."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
            WHERE m < DATE '2001-08-01'
        ),
        per_month AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
                   COUNT(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS STRING) AS DOUBLE) AS total_price
            FROM orders_v GROUP BY 1
        )
        SELECT months.m AS month,
               CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders,
               COALESCE(p.total_price, 0.0D) AS total_price
        FROM months LEFT JOIN per_month p ON p.mo = months.m
    """)


@query(
    "fn_variant_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
               json_extract(props, '$.missing') IS NULL AS missing_is_null,
               CAST(json_extract(props, '$.k') AS DOUBLE) * 2.5 AS k_scaled
        FROM events
        WHERE event_id < 200
    """,
    tags=("function", "json", "variant"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4 semi-structured type): parse the raw JSON props
    column into variant once, then typed variant_get extractions — int,
    string, a missing path (NULL, not error), and arithmetic on an
    extracted value. VARIANT replaces schema_of_json/from_json round
    trips when the JSON shape varies by row: parse once, extract with
    per-call types, keep binary-encoded variant in shuffle/storage.
    The DuckDB oracle extracts the same scalars from the same JSON text
    (VARIANT itself has no cross-engine wire format to compare)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "string").isNull().alias(
            "missing_is_null"
        ),
        (F.try_variant_get(v, "$.k", "double") * 2.5).alias("k_scaled"),
    )


@query(
    "fn_collation_lcase",
    oracle="""
        WITH variants AS (
            SELECT upper(p_type) AS v FROM part
            UNION ALL SELECT lower(p_type) FROM part
            UNION ALL
            SELECT upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2))
            FROM part
        )
        SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_binary,
               CAST(COUNT(DISTINCT lower(v)) AS BIGINT) AS n_distinct_lcase,
               CAST(COUNT(CASE WHEN lower(v) = lower(upper(v)) THEN 1 END)
                    AS BIGINT) AS n_eq_lcase,
               CAST(COUNT(CASE WHEN v = upper(v) THEN 1 END) AS BIGINT)
                   AS n_eq_binary
        FROM variants
    """,
    tags=("function", "collation"),
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF8_LCASE collation (Spark 4): DISTINCT and equality over a
    case-variant string set — upper/lower/initcap forms of p_type —
    where the COLLATE clause makes case-insensitivity an attribute of
    the comparison, not a lower() rewrite at every call site. Binary
    collation sees 3 variants per type; UTF8_LCASE collapses them.
    The oracle mirrors the semantics with explicit lower() (DuckDB has
    no per-expression collation), which is exactly the rewrite the
    collation feature exists to remove."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql("""
        WITH variants AS (
            SELECT upper(p_type) AS v FROM part_v
            UNION ALL SELECT lower(p_type) FROM part_v
            UNION ALL SELECT initcap(p_type) FROM part_v
        )
        SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_binary,
               CAST(COUNT(DISTINCT (v COLLATE UTF8_LCASE)) AS BIGINT)
                   AS n_distinct_lcase,
               CAST(COUNT(CASE WHEN (v COLLATE UTF8_LCASE) = upper(v)
                                THEN 1 END) AS BIGINT) AS n_eq_lcase,
               CAST(COUNT(CASE WHEN v = upper(v) THEN 1 END) AS BIGINT)
                   AS n_eq_binary
        FROM variants
    """)


@query(
    "udf_udtf_table_arg",
    oracle="""
        WITH wc AS (
            SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        counts AS (
            SELECT lang, word, COUNT(*) AS n FROM wc GROUP BY 1, 2
        ),
        ranked AS (
            SELECT lang, word, n,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY n DESC, word) AS rk
            FROM counts
        )
        SELECT lang, word, CAST(n AS BIGINT) AS n, CAST(rk AS INTEGER) AS rk
        FROM ranked WHERE rk <= 3
    """,
    tags=("udf", "udtf"),
)
def udf_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF over a TABLE(...) PARTITION BY argument (Spark 4): the
    SQL-native grouped custom table function — each language's documents
    stream through one UDTF instance (eval per row, terminate emits), here
    computing the top-3 words per language with deterministic tie-breaks.
    This is the SQL spelling of applyInPandas for users who live in
    queries, with the partitioning done by the engine, not the Python.
    Python is off the hot path by construction: the same result has a
    pure-JVM twin (the oracle's window form); the UDTF exists for API
    parity. Bounded here; at scale the per-partition state is one
    Counter, independent of partition row count only if vocab is bounded
    — the docstring trade every grouped-UDF carries."""
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="lang: string, word: string, n: bigint, rk: int")
    class TopWords:
        def __init__(self) -> None:
            self.lang = None
            self.counts: Counter = Counter()

        def eval(self, row):
            self.lang = row["lang"]
            for w in row["text"].split(" "):
                self.counts[w] += 1

        def terminate(self):
            top = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            for i, (w, n) in enumerate(top):
                yield self.lang, w, n, i + 1

    spark.udtf.register("top_words_udtf", TopWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_v")
    return spark.sql(
        """
        SELECT * FROM top_words_udtf(
            TABLE(SELECT lang, text FROM docs_v) PARTITION BY lang
        )
        """
    )


# --------------------------------------------------------------------------
# r5 batch 2: SQL pipe syntax, GROUP BY ALL / ORDER BY ALL / OFFSET,
# lateral column aliases, observe() metrics, and runtime bloom-filter
# join pruning — the remaining engine-surface items a Spark 4 user
# exercises daily.
# --------------------------------------------------------------------------


@query(
    "sql_pipe_syntax",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total
        FROM orders
        WHERE o_totalprice > 100
        GROUP BY o_orderstatus
    """,
    tags=("sql", "spark4"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's |> operator chain): the same logical
    plan as the WHERE→GROUP BY form — Catalyst resolves pipes during
    parsing, so pushdown/pruning/codegen are identical — checked against
    a plain-ANSI oracle. The price sum goes through DECIMAL(18,2) so the
    cross-engine hash is order-independent."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_p")
    return spark.sql(
        """
        FROM orders_p
        |> WHERE o_totalprice > 100
        |> AGGREGATE count(*) AS n,
                     cast(round(sum(cast(o_totalprice as decimal(18,4))), 2)
                          as double) AS total
           GROUP BY o_orderstatus
        |> SELECT o_orderstatus, n, total
        """
    )


@query(
    "sql_group_by_all_offset",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 5 OFFSET 2
    """,
    tags=("sql", "spark4"),
)
def sql_group_by_all_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL + LIMIT/OFFSET (Spark 3.4/4 SQL
    niceties, same dialect as DuckDB): grouping keys inferred from the
    non-aggregate select list, total order over all columns, then a
    paginated window. The (status, priority) group keys are unique, so
    ORDER BY ALL is a total order and the OFFSET slice is deterministic —
    which is what makes this oracle-checkable at all."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_g")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_g
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 5 OFFSET 2
        """
    )


@query(
    "fn_lateral_column_alias",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS dbl,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) + 1
                   AS dblp1,
               (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) + 1)
                   * 10 AS chained
        FROM orders
        WHERE o_orderkey < 200
    """,
    tags=("sql", "spark4"),
)
def fn_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): a select-list expression can
    reference an alias defined earlier in the SAME select list, so
    derivation chains don't need nested subqueries. The oracle (DuckDB
    has no lateral aliases) re-states each expression fully — equal
    results prove the sugar resolves to the same expressions. Decimal
    arithmetic keeps the chain bit-exact across engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lca")
    return spark.sql(
        """
        SELECT o_orderkey,
               cast(cast(o_totalprice as decimal(18,2)) * 2 as double) AS dbl,
               dbl + 1 AS dblp1,
               dblp1 * 10 AS chained
        FROM orders_lca
        WHERE o_orderkey < 200
        """
    )


@query(
    "agg_observe_metrics",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("sql", "spark4", "observability"),
)
def agg_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """observe() named metrics (the batch arm of the observability story —
    the streaming arm is the replication listener): an Observation rides
    the scan of this aggregation and accumulates row count / sum / max at
    execution time, with ZERO extra passes — metrics fall out of the same
    job that computes the result. The returned DataFrame is the ordinary
    oracle-checked aggregate; `tests/test_engine4.py` asserts the
    observed metric values equal the table's true totals after a single
    action. At 100 TB this is how you get input accounting (rows read,
    value bounds) without a second scan."""
    from pyspark.sql import Observation

    obs = Observation("orders_metrics")
    d = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("rows_read"),
        F.max("o_totalprice").alias("max_price"),
    )
    out = d.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n"), dec_sum("o_totalprice").alias("total")
    )
    # stash for the pytest; harmless for the driver (attribute on the fn)
    agg_observe_metrics.last_observation = obs
    return out


@query(
    "join_runtime_bloom_filter",
    oracle="""
        SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
    """,
    tags=("join", "spark4", "runtime-filter"),
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: a selective filter on the
    creation side (urgent orders) is compiled into a bloom_filter_agg
    subquery whose might_contain() predicate is INJECTED into the fact
    scan — the application side drops non-matching rows before the
    shuffle, the semantics are untouched (bloom false-positives only pass
    extra rows into the join, never change its result), and the oracle
    hash proves it. This is THE mechanism that makes selective fact⋈dim
    shuffle joins survive 100 TB: shuffle bytes scale with matching rows,
    not the fact table. Thresholds are forced down for the test-scale
    data (at real scale the defaults — 10 MB creation side / 10 GB
    application side — trigger on their own); the broadcast threshold is
    disabled only to keep the join a shuffle join, since a broadcast join
    already filters implicitly. Plan-asserted in tests/test_plans.py."""
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                dec_sum("l_extendedprice").alias("revenue"),
            )
        )
        # The bloom injection happens at OPTIMIZATION time, so the plan
        # must execute while the forced thresholds are active — an eager
        # localCheckpoint of the (flags-sized) result pins that, and the
        # confs restore before the caller ever runs an action. The plan
        # string is captured first for tests/test_plans.py.
        join_runtime_bloom_filter.last_plan = (
            out._jdf.queryExecution().executedPlan().toString()
        )
        return out.localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@query(
    "sql_parameterized_identifier",
    oracle="""
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total
        FROM orders
        WHERE o_totalprice > 150000.0
        GROUP BY o_orderstatus
    """,
    tags=("sql", "spark4"),
)
def sql_parameterized_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL + the IDENTIFIER() clause (Spark 4): the table
    name and the filter threshold arrive as named bind parameters —
    IDENTIFIER() promotes the string to a relation identifier, the value
    parameter binds as a typed literal. This is the injection-safe
    templating surface a SQL-first application uses instead of string
    interpolation; the plan is identical to the literal form (binding
    happens at parse time), which the oracle hash proves."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pid")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               cast(round(sum(cast(o_totalprice as decimal(18,4))), 2)
                    as double) AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :minp
        GROUP BY o_orderstatus
        """,
        args={"tbl": "orders_pid", "minp": 150000.0},
    )


@query(
    "sql_language_udf",
    oracle="""
        CREATE OR REPLACE MACRO disc_price(p, d) AS p * (1 - d);
        CREATE OR REPLACE MACRO price_band(p) AS
            CASE WHEN p >= 50000 THEN 'high'
                 WHEN p >= 10000 THEN 'mid' ELSE 'low' END;
        SELECT price_band(l_extendedprice) AS band,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(disc_price(l_extendedprice, l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS revenue
        FROM lineitem GROUP BY 1
    """,
    tags=("sql", "spark4"),
)
def sql_language_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDFs (CREATE FUNCTION ... RETURN expr,
    Spark 3.5+/4): reusable business expressions defined IN SQL, no
    Python and no JVM closure — the optimizer inlines the body, so the
    plan is identical to writing the expression in place (codegen,
    pushdown, partial aggregation all intact: the zero-cost abstraction
    a SQL-first shop wants). The DuckDB twin declares the same bodies as
    macros, which DuckDB inlines the same way."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_udf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) "
        "RETURNS STRING RETURN "
        "CASE WHEN p >= 50000 THEN 'high' "
        "WHEN p >= 10000 THEN 'mid' ELSE 'low' END"
    )
    return spark.sql(
        """
        SELECT price_band(l_extendedprice) AS band,
               count(*) AS n,
               cast(round(sum(cast(disc_price(l_extendedprice, l_discount)
                                   as decimal(18,4))), 2) as double)
                 AS revenue
        FROM li_udf GROUP BY 1
        """
    )


@query(
    "sql_session_variables",
    oracle="""
        SELECT r_name,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               'emea_check' AS tag
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('EUROPE', 'AFRICA', 'MIDDLE EAST')
        GROUP BY r_name
    """,
    tags=("sql", "spark4"),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (DECLARE / SET VARIABLE, Spark 4): typed,
    session-scoped state referenced from later statements — the
    procedural-SQL glue scripts use instead of client-side string
    building. The variables bind at parse time, so the executed plan is
    identical to the literal form (the oracle hash proves it; DuckDB
    mirrors with inlined literals)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_sv")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_sv")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE emea_regions ARRAY<STRING> "
        "DEFAULT array('EUROPE', 'AFRICA', 'MIDDLE EAST')"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE result_tag STRING DEFAULT 'emea_check'")
    return spark.sql(
        """
        SELECT r_name,
               count(*) AS n_nations,
               result_tag AS tag
        FROM nation_sv JOIN region_sv ON n_regionkey = r_regionkey
        WHERE array_contains(emea_regions, r_name)
        GROUP BY r_name
        """
    )
