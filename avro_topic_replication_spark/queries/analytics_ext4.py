"""Round-6 analytics extensions, batch 6: data-quality / audit operators.

Benford's-law forensic audit, CDC snapshot diff, market-basket association
rules, dbt-style expectation checks, a one-pass column profiler, and a
Pareto-frontier (skyline) operator.

All [EXT] surface beyond the reference's replication dataflow
(``ReplicationApplication.java:71`` is its only transform). Every query is
oracle-checked against DuckDB; the cross-engine numeric discipline of
SCALE.md applies throughout: integer/decimal accumulation, single
correctly-rounded IEEE ops on the way out, transcendentals only as
hardcoded literals (the Benford expectations), NULLIF on any division
whose denominator can legally be zero.

All queries are tagged ``defer-sample`` so the driver's 50-row correctness
window keeps draining the pre-r6 backlog first (queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec
from . import query

# Exact decimal sum emitted as double via the string hop both engines
# print identically (aggregates.py idiom).
_DSUM = "CAST(CAST(SUM(CAST(({e}) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)"


def _dsum(col):
    return F.sum(dec(col)).cast("string").cast("double")


# Benford expected first-digit probabilities log10(1 + 1/d), hardcoded to
# 10 dp so no engine evaluates a transcendental (SCALE.md discipline).
_BENFORD_P = {
    1: "0.3010299957", 2: "0.1760912591", 3: "0.1249387366",
    4: "0.0969100130", 5: "0.0791812460", 6: "0.0669467896",
    7: "0.0579919470", 8: "0.0511525224", 9: "0.0457574906",
}

# First significant digit by threshold ladder — floor(log10) without the
# log: each branch is one correctly-rounded IEEE divide + floor, so both
# engines agree bit-for-bit (a shared-text SQL CASE, parsed by each).
_DIGIT_SQL = "(CASE " + " ".join(
    f"WHEN {{x}} >= {10.0 ** k:.1f} AND {{x}} < {10.0 ** (k + 1):.1f} "
    f"THEN CAST(FLOOR({{x}} / {10.0 ** k:.1f}) AS INT)"
    for k in range(10)
) + " END)"

# Literals are cast to DOUBLE in the shared text: Spark parses a bare
# decimal literal as DECIMAL (DuckDB too), and the whole chi-square chain
# must run in float64 on both engines.
_BENFORD_CASE = "(CASE " + " ".join(
    f"WHEN digit = {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END)"


@query(
    "stat_benford_law",
    oracle=f"""
        WITH d AS (
            SELECT {_DIGIT_SQL.format(x="o_totalprice")} AS digit
            FROM orders
            WHERE o_totalprice >= 1.0
        ), c AS (
            SELECT digit, COUNT(*) AS observed,
                   SUM(COUNT(*)) OVER () AS n
            FROM d WHERE digit IS NOT NULL GROUP BY digit
        ), t AS (
            SELECT digit, observed, CAST(n AS BIGINT) AS n,
                   {_BENFORD_CASE} AS expected_p,
                   (observed - n * {_BENFORD_CASE})
                     * (observed - n * {_BENFORD_CASE})
                     / (n * {_BENFORD_CASE}) AS chisq_term
            FROM c
        )
        SELECT digit, observed, n, expected_p, chisq_term,
               CAST(CAST(SUM(CAST(ROUND(chisq_term, 6) AS DECIMAL(38,12)))
                         OVER () AS VARCHAR) AS DOUBLE) AS chisq_total
        FROM t
    """,
    tags=("stats", "audit", "defer-sample"),
)
def stat_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fraud / synthetic-data forensic: organically-grown monetary amounts
    follow P(d) = log10(1+1/d); fabricated or truncated feeds don't, and
    the chi-square distance against the Benford expectation flags them.

    The first significant digit comes from a threshold LADDER (one IEEE
    divide + floor per branch), not floor(log10(x)) — log10 is ≤1 ulp
    per libm but not the *same* ulp across JVM and C, and a 1-ulp slip
    at a power-of-ten boundary would flip the digit. The expected
    probabilities are 10-dp literals for the same reason. Per-digit
    chi-square terms are identical IEEE expressions over identical
    integer inputs (bit-stable); the total crosses a sum, so each term
    rounds to 6 dp and accumulates in DECIMAL(38,12) — exact,
    order-independent (the text_zipf_fit precedent). 100-TB shape: one
    hash aggregate into a ≤9-group domain; the window runs over 9 rows."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    d = o.select(F.expr(_DIGIT_SQL.format(x="o_totalprice")).alias("digit"))
    c = (
        d.filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count("*").alias("observed"))
        .withColumn("n", F.sum("observed").over(Window.partitionBy()).cast("bigint"))
    )
    p = F.expr(_BENFORD_CASE)
    term = (
        (F.col("observed") - F.col("n") * p)
        * (F.col("observed") - F.col("n") * p)
        / (F.col("n") * p)
    )
    t = c.select(
        "digit", "observed", "n", p.alias("expected_p"), term.alias("chisq_term")
    )
    return t.withColumn(
        "chisq_total",
        F.sum(F.round("chisq_term", 6).cast("decimal(38,12)"))
        .over(Window.partitionBy())
        .cast("string")
        .cast("double"),
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
        WITH v1 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'P'
                        ELSE o_orderstatus END AS status
            FROM orders WHERE o_orderkey % 10 <> 0
        ), v2 AS (
            SELECT o_orderkey, o_orderstatus AS status
            FROM orders WHERE o_orderkey % 13 <> 0
        )
        SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
               CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                    WHEN v2.o_orderkey IS NULL THEN 'removed'
                    ELSE 'updated' END AS change_type,
               v1.status AS old_status, v2.status AS new_status
        FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey
        WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
              OR v1.status <> v2.status
    """,
    tags=("sql", "cdc", "defer-sample"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: full outer join
    on the primary key, emitting row-level `added` / `removed` /
    `updated` records with old/new values — the diff a batch CDC job or
    a reconciliation check publishes downstream. Snapshots are derived
    deterministically from `orders` (v1 drops keys %10==0 and carries a
    stale 'P' status on keys %7==0; v2 drops keys %13==0), so every
    change class is populated and the oracle mirrors the derivation.

    100-TB shape: one key-partitioned full outer join (both sides
    shuffle on the PK — the join every CDC diff pays), unchanged rows
    filtered pre-emit so the output is change-volume-sized, not
    table-sized. No window, no driver state."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("P"))
        .otherwise(F.col("o_orderstatus"))
        .alias("old_status"),
    )
    v2 = o.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("k2"), F.col("o_orderstatus").alias("new_status")
    )
    j = v1.join(v2, v1["o_orderkey"] == v2["k2"], "full_outer")
    return j.filter(
        v1["o_orderkey"].isNull()
        | F.col("k2").isNull()
        | (F.col("old_status") != F.col("new_status"))
    ).select(
        F.coalesce(v1["o_orderkey"], F.col("k2")).alias("o_orderkey"),
        F.when(v1["o_orderkey"].isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .otherwise("updated")
        .alias("change_type"),
        "old_status",
        "new_status",
    )


@query(
    "mba_association_rules",
    oracle="""
        WITH baskets AS (
            SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ), n AS (
            SELECT COUNT(DISTINCT basket) AS n_baskets FROM baskets
        ), items AS (
            SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY item
        ), pairs AS (
            SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_pair
            FROM baskets a JOIN baskets b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY a.item, b.item
        )
        SELECT item_a, item_b, n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
               n.n_baskets,
               CAST(n_pair AS DOUBLE) / n.n_baskets AS support,
               CAST(n_pair AS DOUBLE) / ia.n_item AS confidence_ab,
               CAST(n_pair AS DOUBLE) * n.n_baskets
                 / (CAST(ia.n_item AS DOUBLE) * ib.n_item) AS lift
        FROM pairs
        JOIN items ia ON item_a = ia.item
        JOIN items ib ON item_b = ib.item
        CROSS JOIN n
        WHERE n_pair >= 5
    """,
    tags=("agg", "graph", "defer-sample"),
)
def mba_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: pairwise
    brand co-occurrence with support / confidence / lift — the Apriori
    k=2 pass every recommender bootstrap runs. Baskets are (order,
    brand) distinct pairs; the pair join is WITHIN-basket (equi-join on
    the basket key), so candidate volume is Σ|basket|² with baskets
    bounded by order size — never an item×item or row×row product.

    The item-support side of the final enrichment is a ~25-row brand
    table, broadcast twice. All ratios are single IEEE divisions over
    exact integer counts with both factors pre-cast to double in the
    SAME order as the oracle text — bit-stable. 100-TB shape: two hash
    aggregates (baskets, pairs) + one basket-keyed self-join; the
    support filter keeps the emitted rule set domain-bounded."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    baskets = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_b = baskets.agg(F.countDistinct("basket").alias("n_baskets"))
    items = baskets.groupBy("item").agg(F.count("*").alias("n_item"))
    a = baskets.select("basket", F.col("item").alias("item_a"))
    b = baskets.select(F.col("basket").alias("b2"), F.col("item").alias("item_b"))
    pairs = (
        a.join(b, (a["basket"] == b["b2"]) & (a["item_a"] < b["item_b"]))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    ia = items.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    ib = items.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_b))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            "n_baskets",
            (F.col("n_pair").cast("double") / F.col("n_baskets")).alias("support"),
            (F.col("n_pair").cast("double") / F.col("n_a")).alias("confidence_ab"),
            (
                F.col("n_pair").cast("double")
                * F.col("n_baskets")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )


@query(
    "profile_table_columns",
    oracle="""
        WITH s AS (
            SELECT COUNT(*) AS n_rows,
                COUNT(*) - COUNT(o_orderkey) AS nn1, COUNT(DISTINCT o_orderkey) AS nd1,
                CAST(MIN(o_orderkey) AS VARCHAR) AS mn1, CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
                COUNT(*) - COUNT(o_custkey) AS nn2, COUNT(DISTINCT o_custkey) AS nd2,
                CAST(MIN(o_custkey) AS VARCHAR) AS mn2, CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
                COUNT(*) - COUNT(o_orderstatus) AS nn3, COUNT(DISTINCT o_orderstatus) AS nd3,
                MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
                COUNT(*) - COUNT(o_orderpriority) AS nn4, COUNT(DISTINCT o_orderpriority) AS nd4,
                MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4,
                COUNT(*) - COUNT(o_totalprice) AS nn5, COUNT(DISTINCT o_totalprice) AS nd5,
                CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,4)) AS VARCHAR) AS mn5,
                CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,4)) AS VARCHAR) AS mx5,
                COUNT(*) - COUNT(o_orderdate) AS nn6, COUNT(DISTINCT o_orderdate) AS nd6,
                CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS mn6,
                CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS mx6
            FROM orders
        )
        SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_null, nd1 AS n_distinct, mn1 AS min_repr, mx1 AS max_repr FROM s
        UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2 FROM s
        UNION ALL SELECT 'o_orderstatus', n_rows, nn3, nd3, mn3, mx3 FROM s
        UNION ALL SELECT 'o_orderpriority', n_rows, nn4, nd4, mn4, mx4 FROM s
        UNION ALL SELECT 'o_totalprice', n_rows, nn5, nd5, mn5, mx5 FROM s
        UNION ALL SELECT 'o_orderdate', n_rows, nn6, nd6, mn6, mx6 FROM s
    """,
    tags=("sql", "audit", "defer-sample"),
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (the ANALYZE/`dbt docs`-style summary):
    per column of `orders` — null count, exact distinct count, min/max
    rendered to a common VARCHAR. ONE scan computes all 26 aggregates
    (Spark plans the multi-distinct via Expand); the wide row then
    unpivots to long via `inline(array(struct...))` — no second scan,
    no join.

    Cross-engine rendering rules (the profiler's portability contract):
    integers and dates print identically everywhere; doubles render
    through DECIMAL(18,4)→VARCHAR (the aggregates.py string-hop — both
    engines print a decimal's full scale); timestamps render as DATE.
    100-TB shape: one aggregation; the distinct counts are the cost
    driver and would swap to approx_count_distinct behind the same
    output schema (the docstring'd trade, agg_approx_count_distinct's
    territory)."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_orderkey")).alias("nn1"),
        F.countDistinct("o_orderkey").alias("nd1"),
        F.min("o_orderkey").cast("string").alias("mn1"),
        F.max("o_orderkey").cast("string").alias("mx1"),
        (F.count("*") - F.count("o_custkey")).alias("nn2"),
        F.countDistinct("o_custkey").alias("nd2"),
        F.min("o_custkey").cast("string").alias("mn2"),
        F.max("o_custkey").cast("string").alias("mx2"),
        (F.count("*") - F.count("o_orderstatus")).alias("nn3"),
        F.countDistinct("o_orderstatus").alias("nd3"),
        F.min("o_orderstatus").alias("mn3"),
        F.max("o_orderstatus").alias("mx3"),
        (F.count("*") - F.count("o_orderpriority")).alias("nn4"),
        F.countDistinct("o_orderpriority").alias("nd4"),
        F.min("o_orderpriority").alias("mn4"),
        F.max("o_orderpriority").alias("mx4"),
        (F.count("*") - F.count("o_totalprice")).alias("nn5"),
        F.countDistinct("o_totalprice").alias("nd5"),
        F.min("o_totalprice").cast("decimal(18,4)").cast("string").alias("mn5"),
        F.max("o_totalprice").cast("decimal(18,4)").cast("string").alias("mx5"),
        (F.count("*") - F.count("o_orderdate")).alias("nn6"),
        F.countDistinct("o_orderdate").alias("nd6"),
        F.min("o_orderdate").cast("date").cast("string").alias("mn6"),
        F.max("o_orderdate").cast("date").cast("string").alias("mx6"),
    )

    def row(name, i):
        return F.struct(
            F.lit(name).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"nn{i}").alias("n_null"),
            F.col(f"nd{i}").alias("n_distinct"),
            F.col(f"mn{i}").alias("min_repr"),
            F.col(f"mx{i}").alias("max_repr"),
        )

    cols = [
        ("o_orderkey", 1), ("o_custkey", 2), ("o_orderstatus", 3),
        ("o_orderpriority", 4), ("o_totalprice", 5), ("o_orderdate", 6),
    ]
    return wide.select(F.inline(F.array(*[row(n, i) for n, i in cols])))


@query(
    "dq_expectations",
    oracle="""
        WITH s AS (
            SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys,
                   COUNT(*) - COUNT(o_custkey) AS null_custkey,
                   COUNT(*) FILTER (o_orderstatus IS NULL
                       OR o_orderstatus NOT IN ('O','F','P')) AS bad_status,
                   COUNT(*) FILTER (o_totalprice <= 0.0) AS nonpositive_price,
                   COUNT(*) FILTER (o_orderdate > TIMESTAMP '2030-01-01')
                       AS future_dated
            FROM orders
        ), ri AS (
            SELECT COUNT(*) AS orphans
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL
        )
        SELECT 'unique_o_orderkey' AS check_name,
               CAST(dup_keys AS BIGINT) AS n_violations, dup_keys = 0 AS passed FROM s
        UNION ALL SELECT 'not_null_o_custkey', null_custkey, null_custkey = 0 FROM s
        UNION ALL SELECT 'accepted_values_o_orderstatus', bad_status, bad_status = 0 FROM s
        UNION ALL SELECT 'positive_o_totalprice', nonpositive_price, nonpositive_price = 0 FROM s
        UNION ALL SELECT 'no_future_o_orderdate', future_dated, future_dated = 0 FROM s
        UNION ALL SELECT 'ref_integrity_custkey', orphans, orphans = 0 FROM ri
    """,
    tags=("sql", "audit", "defer-sample"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt/Great-Expectations-style data-quality suite over `orders`:
    uniqueness, not-null, accepted-values, range, freshness-sanity
    (future-dated rows), and referential integrity to `customer` — each
    emitted as (check_name, n_violations, passed). The five table-local
    checks share ONE aggregation pass (conditional counts in a single
    hash aggregate); referential integrity is a broadcast LEFT ANTI join
    counted in a second 1-row aggregate, unioned in.

    100-TB shape: one scan + partial-aggregated conditional counts for
    the local checks; the RI check broadcasts the dimension (or flips to
    a shuffle anti join past broadcast size) — exactly the fact-side
    plan `join_anti` already proves. Output is 6 rows regardless of
    input volume."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        (F.count("*") - F.count("o_custkey")).alias("null_custkey"),
        F.count(
            F.when(
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("O", "F", "P"),
                1,
            )
        ).alias("bad_status"),
        F.count(F.when(F.col("o_totalprice") <= 0.0, 1)).alias("nonpositive_price"),
        F.count(
            F.when(F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp"), 1)
        ).alias("future_dated"),
    )
    local = s.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(col).cast("bigint").alias("n_violations"),
                        (F.col(col) == 0).alias("passed"),
                    )
                    for name, col in [
                        ("unique_o_orderkey", "dup_keys"),
                        ("not_null_o_custkey", "null_custkey"),
                        ("accepted_values_o_orderstatus", "bad_status"),
                        ("positive_o_totalprice", "nonpositive_price"),
                        ("no_future_o_orderdate", "future_dated"),
                    ]
                ]
            )
        )
    )
    ri = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").alias("orphans"))
        .select(
            F.lit("ref_integrity_custkey").alias("check_name"),
            F.col("orphans").cast("bigint").alias("n_violations"),
            (F.col("orphans") == 0).alias("passed"),
        )
    )
    return local.unionByName(ri)


@query(
    "pareto_frontier_parts",
    oracle="""
        SELECT p_partkey, p_name, p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
              AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
        )
    """,
    tags=("sql", "window", "defer-sample"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over parts — maximize size, minimize
    price: the multi-objective shortlist operator (catalog curation,
    config search). The textbook form is a quadratic NOT-EXISTS
    self-join (the oracle); the Spark plan exploits 2-D structure
    instead: collapse to the ~50-row distinct-size table with min price
    per size, compute the running min price over STRICTLY LARGER sizes
    with a (1 FOLLOWING, UNBOUNDED) range frame, and a part is on the
    frontier iff it matches its size's min price and no larger size
    beats it. The fact table is never self-joined — one aggregate, one
    ~50-row window, one broadcast join back.

    Double comparisons are exact selections (no arithmetic), so both
    engines pick identical frontier rows, ties included (equal points
    do not dominate each other under strict-in-one-dimension
    dominance)."""
    p = load_table(spark, sf_dir, "part")
    per_size = p.groupBy("p_size").agg(F.min("p_retailprice").alias("mp"))
    w = Window.orderBy("p_size").rangeBetween(1, Window.unboundedFollowing)
    frontier_sizes = per_size.select(
        "p_size", "mp", F.min("mp").over(w).alias("m_gt")
    ).filter(F.col("m_gt").isNull() | (F.col("m_gt") > F.col("mp")))
    return (
        p.join(F.broadcast(frontier_sizes), "p_size")
        .filter(F.col("p_retailprice") == F.col("mp"))
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Batch 7: rank-sum testing, distribution drift, privacy audit, weighted
# sampling, and robust trend estimation.
# ---------------------------------------------------------------------------


@query(
    "stat_mannwhitney_u",
    oracle="""
        WITH v AS (
            SELECT c_acctbal AS val,
                   COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS n1_v,
                   COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS n2_v
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            GROUP BY c_acctbal
        ), w AS (
            SELECT n1_v, n2_v, n1_v + n2_v AS t,
                   COALESCE(SUM(n1_v + n2_v) OVER (ORDER BY val
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb
            FROM v
        ), s AS (
            SELECT CAST(SUM(n1_v) AS BIGINT) AS n1,
                   CAST(SUM(n2_v) AS BIGINT) AS n2,
                   CAST(SUM(n1_v * (2 * cb + t + 1)) AS BIGINT) AS r1x2,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS ties
            FROM w
        )
        SELECT n1, n2,
               CAST(n1 AS DOUBLE) * n2 + CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                 - r1x2 / 2.0 AS u1,
               CAST(n1 AS DOUBLE) * n2
                 - (CAST(n1 AS DOUBLE) * n2 + CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                    - r1x2 / 2.0) AS u2,
               (CAST(n1 AS DOUBLE) * n2 + CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                  - r1x2 / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
                 / NULLIF(sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                     * ((n1 + n2 + 1)
                        - CAST(ties AS DOUBLE)
                          / NULLIF(CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1), 0))),
                     0) AS z_tie_corrected
        FROM s
    """,
    tags=("stats", "defer-sample"),
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two customer
    segments — the nonparametric complement to stat_welch_ttest (no
    normality assumption) and stat_ks_test (location-shift-focused).

    The rank sum is computed WITHOUT materializing per-row ranks: rows
    collapse to distinct values with per-sample counts, and the average
    rank of a tied block is (cum_before + (t+1)/2). Doubling clears the
    half: R1×2 = Σ n1_v·(2·cum_before + t + 1) is ALL-INTEGER, so the
    accumulation is exact at any scale and order-independent (the same
    trick that makes the Gini's Σi·x_i exact). U, the tie-corrected
    variance, and z are then a fixed chain of single IEEE ops on
    integers — bit-stable across engines, NULLIF-guarded for the
    degenerate one-sided / all-tied inputs. The distinct-value window is
    domain-bounded; at true scale it swaps to stat_ks_test's banded
    two-phase form unchanged."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    v = c.groupBy(F.col("c_acctbal").alias("val")).agg(
        F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("n1_v"),
        F.count(F.when(F.col("c_mktsegment") == "MACHINERY", 1)).alias("n2_v"),
    )
    wb = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    w = v.select(
        "n1_v",
        "n2_v",
        (F.col("n1_v") + F.col("n2_v")).alias("t"),
        F.coalesce(F.sum(F.col("n1_v") + F.col("n2_v")).over(wb), F.lit(0)).alias(
            "cb"
        ),
    )
    s = w.agg(
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum("n2_v").cast("bigint").alias("n2"),
        F.sum(F.col("n1_v") * (2 * F.col("cb") + F.col("t") + 1))
        .cast("bigint")
        .alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n2 = F.col("n2")
    u1 = n1d * n2 + n1d * (F.col("n1") + 1) / 2.0 - F.col("r1x2") / 2.0
    var = (
        n1d * n2 / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("ties").cast("double")
            / F.nullif(
                (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2") - 1),
                F.lit(0.0),
            )
        )
    )
    return s.select(
        "n1",
        "n2",
        u1.alias("u1"),
        (n1d * n2 - u1).alias("u2"),
        ((u1 - n1d * n2 / 2.0) / F.nullif(F.sqrt(var), F.lit(0.0))).alias(
            "z_tie_corrected"
        ),
    )


@query(
    "stat_psi_drift",
    oracle="""
        WITH b AS (
            SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS band,
                   COUNT(*) FILTER (o_orderdate < TIMESTAMP '1998-06-01')
                       AS c_a,
                   COUNT(*) FILTER (o_orderdate >= TIMESTAMP '1998-06-01')
                       AS c_b
            FROM orders
            GROUP BY 1
        ), t AS (
            SELECT band, c_a, c_b,
                   SUM(c_a) OVER () AS n_a, SUM(c_b) OVER () AS n_b,
                   COUNT(*) OVER () AS nb
            FROM b
        ), p AS (
            SELECT band, c_a, c_b,
                   (c_a + 0.5) / (n_a + 0.5 * nb) AS p_a,
                   (c_b + 0.5) / (n_b + 0.5 * nb) AS p_b
            FROM t
        )
        SELECT band, c_a, c_b, p_a, p_b,
               ROUND((p_a - p_b) * ln(p_a / p_b), 6) AS psi_term,
               CAST(CAST(SUM(CAST(ROUND((p_a - p_b) * ln(p_a / p_b), 6)
                                  AS DECIMAL(38,12))) OVER () AS VARCHAR)
                    AS DOUBLE) AS psi_total
        FROM p
    """,
    tags=("stats", "audit", "defer-sample"),
)
def stat_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two order periods over fixed
    price bands — the model-monitoring drift gate (PSI < 0.1 stable,
    > 0.25 retrain). Laplace-smoothed probabilities (+0.5 per observed
    band) keep ln finite when a band is empty on one side.

    Numeric contract: counts are exact integers and the smoothed
    probabilities single IEEE divisions (bit-stable); each band's
    (p_a-p_b)·ln(p_a/p_b) crosses libm, so the EMITTED term is rounded
    to 6 dp (a 1-ulp ln disagreement survives rounding with probability
    ~4e-9 — the text_zipf_fit precedent) and the total accumulates the
    rounded terms in DECIMAL(38,12), exact and order-free. 100-TB
    shape: one hash aggregate into a fixed ~dozen-band domain; both
    windows run over that band table."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-06-01").cast("timestamp")
    b = o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("int").alias("band")
    ).agg(
        F.count(F.when(F.col("o_orderdate") < cut, 1)).alias("c_a"),
        F.count(F.when(F.col("o_orderdate") >= cut, 1)).alias("c_b"),
    )
    wall = Window.partitionBy()
    t = b.select(
        "band",
        "c_a",
        "c_b",
        F.sum("c_a").over(wall).alias("n_a"),
        F.sum("c_b").over(wall).alias("n_b"),
        F.count("*").over(wall).alias("nb"),
    )
    p_a = (F.col("c_a") + 0.5) / (F.col("n_a") + 0.5 * F.col("nb"))
    p_b = (F.col("c_b") + 0.5) / (F.col("n_b") + 0.5 * F.col("nb"))
    p = t.select("band", "c_a", "c_b", p_a.alias("p_a"), p_b.alias("p_b"))
    term = F.round(
        (F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b")), 6
    )
    return p.select(
        "band",
        "c_a",
        "c_b",
        "p_a",
        "p_b",
        term.alias("psi_term"),
        F.sum(term.cast("decimal(38,12)"))
        .over(wall)
        .cast("string")
        .cast("double")
        .alias("psi_total"),
    )


@query(
    "dq_k_anonymity",
    oracle="""
        WITH g AS (
            SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
            FROM customer GROUP BY c_mktsegment, c_nationkey
        )
        SELECT COUNT(*) AS n_groups,
               CAST(MIN(sz) AS BIGINT) AS k_anonymity,
               COUNT(*) FILTER (sz < 5) AS n_violating_groups,
               CAST(COALESCE(SUM(sz) FILTER (sz < 5), 0) AS BIGINT)
                   AS n_rows_at_risk,
               CAST(COALESCE(SUM(sz) FILTER (sz < 5), 0) AS DOUBLE)
                   / CAST(SUM(sz) AS DOUBLE) AS frac_rows_at_risk
        FROM g
    """,
    tags=("audit", "privacy", "defer-sample"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (segment, nation) quasi-identifier
    pair — the privacy gate a training-data pipeline runs before
    releasing user-derived tables: the table's k-anonymity level is the
    SMALLEST equivalence-class size, and every row in a class below the
    k=5 policy threshold is re-identification-exposed. Two hash
    aggregates (QI group sizes, then a 1-row summary over the bounded
    QI domain); the fraction is one IEEE division of exact counts.
    Generalization/suppression (the fix) is a filter join against the
    violating-class keys — the dedup_exact plan shape."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(F.count("*").alias("sz"))
    viol = F.when(F.col("sz") < 5, F.col("sz"))
    return g.agg(
        F.count("*").alias("n_groups"),
        F.min("sz").cast("bigint").alias("k_anonymity"),
        F.count(viol).alias("n_violating_groups"),
        F.coalesce(F.sum(viol), F.lit(0)).cast("bigint").alias("n_rows_at_risk"),
        (
            F.coalesce(F.sum(viol), F.lit(0)).cast("double")
            / F.sum("sz").cast("double")
        ).alias("frac_rows_at_risk"),
    )


# A-Res (Efraimidis–Spirakis) weighted reservoir key: u^(1/w) with u a
# 16-bit md5 uniform opened up from hex via instr() arithmetic — the
# same shared-text trick as the Poisson bootstrap, but numeric. The 0.5
# offset keeps u strictly inside (0, 1) so pow never sees 0.
_U16_SQL = (
    "((CAST(instr('0123456789abcdef', substring({h}, 1, 1)) - 1 AS DOUBLE)"
    " * 4096.0"
    " + (instr('0123456789abcdef', substring({h}, 2, 1)) - 1) * 256.0"
    " + (instr('0123456789abcdef', substring({h}, 3, 1)) - 1) * 16.0"
    " + (instr('0123456789abcdef', substring({h}, 4, 1)) - 1)"
    " + 0.5) / 65536.0)"
)


@query(
    "sample_weighted_reservoir",
    oracle=f"""
        WITH k AS (
            SELECT doc_id, lang, n_chars,
                   ROUND(pow(
                       {_U16_SQL.format(h="md5(CAST(doc_id AS VARCHAR))")},
                       1.0 / CAST(n_chars AS DOUBLE)), 9) AS akey
            FROM documents
            WHERE n_chars > 0
        ), r AS (
            SELECT doc_id, lang, n_chars, akey,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY akey DESC, doc_id) AS rk
            FROM k
        )
        SELECT doc_id, lang, n_chars, akey, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 20
    """,
    tags=("llm", "sampling", "defer-sample"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample, k=20 per language, by the
    Efraimidis–Spirakis A-Res key u^(1/w): one pass, no RNG state, and
    inclusion probability proportional to the document's length weight
    — the length-weighted counterpart of sample_reservoir_per_group
    (longer docs carry more training tokens, so token-budget-faithful
    subsampling weights by size).

    u is a 16-bit md5 uniform opened to a number with instr()
    arithmetic (identical shared SQL text on both engines). pow crosses
    libm, so the key is ROUNDED to 9 dp and ties break on doc_id — a
    cross-engine selection flip needs two keys within 1 ulp of the same
    9-dp boundary. 100-TB shape: map-only key computation; the
    per-group top-k is the windows.py partial-top-k-per-partition
    pattern, never a global sort."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # identical arithmetic text on both engines; only the cast keyword in
    # the hash argument differs (Spark rejects length-less VARCHAR)
    u = F.expr(_U16_SQL.format(h="md5(CAST(doc_id AS STRING))"))
    k = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 9
        ).alias("akey"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("akey"), F.asc("doc_id"))
    return (
        k.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .withColumn("rk", F.col("rk").cast("bigint"))
    )


@query(
    "stat_theil_sen_trend",
    oracle="""
        WITH m AS (
            SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mi,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS rev
            FROM orders GROUP BY 1
        ), slopes AS (
            SELECT (b.rev - a.rev) / (b.mi - a.mi) AS slope
            FROM m a JOIN m b ON a.mi < b.mi
        ), arr AS (
            SELECT list_sort(list(slope)) AS ss, COUNT(*) AS np FROM slopes
        )
        SELECT (SELECT COUNT(*) FROM m) AS n_months,
               CAST(np AS BIGINT) AS n_pairs,
               CASE WHEN np = 0 THEN NULL
                    WHEN np % 2 = 1 THEN ss[CAST((np + 1) // 2 AS INT)]
                    ELSE (ss[CAST(np // 2 AS INT)]
                          + ss[CAST(np // 2 + 1 AS INT)]) / 2.0
               END AS theil_sen_slope
        FROM arr
    """,
    tags=("stats", "ts", "defer-sample"),
)
def stat_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly revenue: the median of all
    pairwise slopes — immune to the outlier months that wreck an OLS
    fit (29% breakdown point). The pairwise join runs over the MONTH
    table (calendar-bounded: 84 months → 3.5k pairs at any corpus
    size), never the fact table; monthly revenues are exact decimal
    sums exported once through the string hop.

    Each slope is ONE IEEE division of bit-identical inputs; the median
    is pure selection on the sorted slope array (odd count) or a single
    averaging division (even) — no interpolation formula, so both
    engines agree bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("mi")
    ).agg(_dsum("o_totalprice").alias("rev"))
    a = m.select(F.col("mi").alias("mi_a"), F.col("rev").alias("rev_a"))
    b = m.select(F.col("mi").alias("mi_b"), F.col("rev").alias("rev_b"))
    slopes = a.join(b, F.col("mi_a") < F.col("mi_b")).select(
        ((F.col("rev_b") - F.col("rev_a")) / (F.col("mi_b") - F.col("mi_a"))).alias(
            "slope"
        )
    )
    n_months = m.count()
    arr = slopes.agg(
        F.sort_array(F.collect_list("slope")).alias("ss"),
        F.count("*").alias("np"),
    )
    # np = 0 (single-month or empty input) must yield NULL, not an
    # element_at(ss, 0) ANSI error
    med = F.when(F.col("np") == 0, F.lit(None).cast("double")).when(
        F.col("np") % 2 == 1,
        F.element_at("ss", ((F.col("np") + 1) / 2).cast("int")),
    ).otherwise(
        (
            F.element_at("ss", (F.col("np") / 2).cast("int"))
            + F.element_at("ss", (F.col("np") / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return arr.select(
        F.lit(n_months).cast("bigint").alias("n_months"),
        F.col("np").cast("bigint").alias("n_pairs"),
        med.alias("theil_sen_slope"),
    )
