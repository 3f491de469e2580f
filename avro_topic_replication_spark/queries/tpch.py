"""TPC-H query suite, adapted to the driver's synthetic star schema.

The classic decision-support workload re-expressed Spark-first over the
driver testdata (TESTDATA.md). The synthetic schema is a TPC-H subset —
no ``partsupp`` table, no comment/address/phone columns, no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` — so queries touching
those are adapted (noted per query). q1 and q5 already exist as
``agg_pricing_summary`` and ``flagship_revenue_by_nation``. The four
queries needing ``partsupp`` (q2, q11, q16, q20) run over a DETERMINISTIC
derived partsupp (``_partsupp`` / ``_PARTSUPP_SQL``: part × 4 suppliers,
arithmetic-derived availqty/supplycost — identical generation logic in
Spark and the DuckDB oracle, so both engines see the same table).

Every query here is oracle-checked: double aggregates run through the
decimal domain (functions/numeric) so Spark and DuckDB hash-match
regardless of shuffle order, and every ORDER BY carries a total
tie-break.

Scale notes (the suite is the bench headline set):
- dims (region/nation/part/supplier/customer) broadcast; only
  fact⋈fact (lineitem⋈orders) shuffles — at 100 TB those two co-partition
  on orderkey (bucketing: join_bucketed_colocated shows the shape).
- every filter is a plain predicate on scanned columns → parquet pushdown;
  aggregates are partial-aggregated map-side by Catalyst.

Reference parity: none (the reference has no SQL); [EXT] per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec_avg, dec_avg_sql, dec_sum, dec_sum_sql
from . import query

def _rev():
    # built lazily: constructing the literal needs an active SparkContext,
    # and query modules import before any session exists
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
_REV_SQL = "l_extendedprice * (1 - l_discount)"


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               {dec_sum_sql(_REV_SQL)} AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 3, 4
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3 (adapted: o_orderpriority for the absent o_shippriority):
    top unshipped-revenue orders in a segment. Plan: customer broadcast
    into orders, one shuffle joining lineitem on orderkey, partial-agg,
    TakeOrderedAndProject for the top-10."""
    c, o, l = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit("1998-06-01").cast("timestamp")
    return (
        l.filter(F.col("l_shipdate") > cut)
        .join(o.filter(F.col("o_orderdate") < cut), l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(_rev()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 (adapted: 'shipped >30 days after ordering' replaces the
    absent commit/receipt-date lateness test): how many orders per
    priority shipped late. EXISTS compiles to a left-semi join on
    orderkey — no row multiplication from multi-line orders."""
    o, l = _t(spark, sf_dir, "orders", "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT {dec_sum_sql('l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "filter", "agg"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 verbatim: revenue delta from a discount-band what-if. The
    whole query is one pushed-down scan + map-side partial sum — zero
    shuffle beyond the final single-row merge."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               {dec_sum_sql(_REV_SQL)} AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7: bilateral trade volume between two nations by year.
    Both nation dims and supplier/customer broadcast; the only shuffle is
    lineitem⋈orders on orderkey, then a partial-agg on the 3 group keys."""
    s, l, o, c, n = _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dec_sum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
        WITH all_vol AS (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   CAST(({_REV_SQL}) AS DECIMAL(18,4)) AS volume,
                   n1.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            JOIN region r ON n2.n_regionkey = r.r_regionkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                   ELSE CAST(0 AS DECIMAL(18,4)) END), 6)
                    AS DOUBLE)
                 / CAST(ROUND(SUM(volume), 6) AS DOUBLE) AS mkt_share
        FROM all_vol GROUP BY o_year ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8: one nation's share of PROMO-part volume sold into ASIA,
    by year. Share = decimal-summed conditional volume over decimal-summed
    total volume, divided once in IEEE at the end — order-independent in
    both engines. Everything but lineitem⋈orders broadcasts."""
    p, l, s, o, c, n, r = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    )
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec4 = "decimal(18,4)"
    base = (
        l.join(o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        ), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p.filter(F.col("p_type") == "PROMO")), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast(dec4).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast(dec4)
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.round(F.sum(nation_vol), 6).cast("double")
                / F.round(F.sum("volume"), 6).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {dec_sum_sql(_REV_SQL)} AS revenue,
               c.c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-07-01'
          AND l.l_returnflag = 'R'
        GROUP BY 1, 2, 4, 5
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10: customers who returned the most revenue in a half-year —
    the churn-risk report. Returned lines filter at the scan, customer and
    nation broadcast, top-20 via TakeOrderedAndProject."""
    c, o, l, n = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(_rev()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q12_late_shipments",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(count_if(l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
                    AS BIGINT) AS late_lines,
               CAST(count_if(l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY)
                    AS BIGINT) AS ontime_lines
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 (adapted: the absent l_shipmode/commit/receipt columns
    replaced by a ship-lag SLA — late means shipped >60 days after the
    order): per-priority on-time vs late line counts, the conditional-sum
    pattern of the original."""
    o, l = _t(spark, sf_dir, "orders", "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late.cast("long")).alias("late_lines"),
            F.sum((~late).cast("long")).alias("ontime_lines"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 (adapted: the comment-pattern exclusion becomes an
    order-priority exclusion): the histogram of orders-per-customer,
    including zero-order customers via the left join. Two aggregations,
    each partial-aggregated; the second input is customer-sized."""
    c, o = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT 100.00
               * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(({_REV_SQL}) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END), 6) AS DOUBLE)
               / CAST(ROUND(SUM(CAST(({_REV_SQL}) AS DECIMAL(18,4))), 6) AS DOUBLE)
               AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
          AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14: the share of a month's revenue from PROMO parts. Part
    broadcasts into the filtered lineitem scan; the conditional and total
    sums run in the decimal domain, one IEEE divide at the end."""
    l, p = _t(spark, sf_dir, "lineitem", "part")
    dec4 = "decimal(18,4)"
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec4)
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast(dec4))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.round(F.sum(promo), 6).cast("double")
                / F.round(F.sum(vol), 6).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {dec_sum_sql(_REV_SQL)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: the quarter's top revenue supplier(s) — view + scalar
    subquery against its own aggregate. The revenue aggregate is computed
    once (supplier-sized), the max is a 1-row broadcast parameter join,
    ties all surface (deterministic)."""
    l, s = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dec_sum(_rev()).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
        WITH part_avg AS (
            SELECT l_partkey, 0.5 * ({dec_avg_sql('l_quantity')}) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {dec_sum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN part_avg a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.half_avg_qty
    """,
    tags=("tpch", "join", "subquery", "agg"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 (adapted: threshold 0.5×avg instead of 0.2×avg so the
    predicate selects rows on this uniform synthetic quantity
    distribution; no p_container column → brand-only filter): revenue
    locked in small-quantity orders of one brand's parts. The correlated
    per-part average becomes a part-keyed aggregate joined back — one
    shuffle on partkey instead of a per-row subquery."""
    l, p = _t(spark, sf_dir, "lineitem", "part")
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * dec_avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        l.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#1")),
               l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg((dec_sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle=f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               {dec_sum_sql('l.l_quantity')} AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
        )
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    tags=("tpch", "join", "subquery", "agg", "topk"),
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 (threshold 250 ≈ p99 of per-order quantity on this
    data): customers behind the largest-volume orders. The HAVING
    subquery is an aggregate + semi join on orderkey; quantity sums run
    in decimal so the threshold cut is engine-identical."""
    c, o, l = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
        SELECT {dec_sum_sql(_REV_SQL)} AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 21)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 50
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "filter", "agg"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 (adapted: p_container/shipmode legs dropped — brand ×
    size × quantity disjunction retained): revenue from three disjunctive
    brand/size/quantity bands. The OR-of-ANDs predicate evaluates inside
    one broadcast-hash-join stage — no union of three scans."""
    l, p = _t(spark, sf_dir, "lineitem", "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dec_sum(_rev()).alias("revenue"))
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(c_acctbal) AS ab
            FROM customer WHERE c_acctbal > 0
        )
        SELECT CAST(c.c_nationkey % 5 AS INT) AS cust_group,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.ab
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01'
          )
        GROUP BY 1 ORDER BY 1
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 (adapted: the phone-prefix country grouping becomes
    nationkey mod 5 — no phone column; 'never ordered' becomes 'no order
    since 2001' — every synthetic customer has old orders): wealthy
    customers gone quiet. Anti join against recent orders, scalar-average
    broadcast as a 1-row parameter."""
    c, o = _t(spark, sf_dir, "customer", "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(dec_avg("c_acctbal").alias("ab"))
    recent = o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey", "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cust_group"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cust_group")
    )


# ---------------------------------------------------------------------------
# partsupp-backed queries (q2 / q11 / q16 / q20)
#
# The driver testdata ships no partsupp, so it is DERIVED deterministically:
# each part gets 4 suppliers at dbgen-style stride offsets, with
# availqty/supplycost pure arithmetic in (partkey, i). The same generation
# logic runs as a CTE in the DuckDB oracle, so both engines compute over the
# identical table. At 100 TB partsupp would be a real stored table; the
# derivation here is map-only over part (two broadcast joins: a 4-row quad
# and a 1-row supplier count), so it adds no shuffle.
# ---------------------------------------------------------------------------

_PARTSUPP_SQL = """
partsupp AS (
    SELECT CAST(p.p_partkey AS BIGINT) AS ps_partkey,
           CAST((p.p_partkey + quad.i * ((SELECT COUNT(*) FROM supplier) // 4 + 1))
                % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey,
           CAST((p.p_partkey * 7 + quad.i * 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
           CAST(((p.p_partkey * 31 + quad.i * 17) % 100000) / 100.0 + 1.0
                AS DECIMAL(12,2)) AS ps_supplycost
    FROM part p CROSS JOIN (VALUES (0),(1),(2),(3)) AS quad(i)
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp — keep in lockstep with _PARTSUPP_SQL.

    4 distinct suppliers per part (stride S div 4 + 1 keeps the four
    offsets distinct mod S for every testdata supplier count 10/100/1000);
    (ps_partkey, ps_suppkey) is unique."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load_table(spark, sf_dir, "supplier").agg(F.count("*").alias("s_cnt"))
    quad = spark.range(4).select(F.col("id").cast("int").alias("i"))
    return (
        p.crossJoin(F.broadcast(quad))
        .crossJoin(F.broadcast(s_cnt))
        .selectExpr(
            "CAST(p_partkey AS BIGINT) AS ps_partkey",
            "CAST((p_partkey + i * (s_cnt div 4 + 1)) % s_cnt AS BIGINT) AS ps_suppkey",
            "CAST((p_partkey * 7 + i * 11) % 9999 + 1 AS BIGINT) AS ps_availqty",
            "CAST(((p_partkey * 31 + i * 17) % 100000) / 100.0 + 1.0"
            " AS DECIMAL(12,2)) AS ps_supplycost",
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
        WITH {_PARTSUPP_SQL},
        eu AS (
            SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
            FROM partsupp ps
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
               CAST(e.ps_supplycost AS DOUBLE) AS ps_supplycost
        FROM eu e JOIN part p ON p.p_partkey = e.ps_partkey
        WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'STANDARD'
          AND e.ps_supplycost = (SELECT min(e2.ps_supplycost) FROM eu e2
                                 WHERE e2.ps_partkey = e.ps_partkey)
        ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
    """,
    tags=("tpch", "join", "subquery", "topk"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 (adapted: p_type category for the absent p_mfgr, no
    address/phone/comment): cheapest EUROPE supplier per qualifying part.
    The correlated min-cost subquery decorrelates to a window MIN over
    ps_partkey — one shuffle on partkey, no self-join; dims broadcast.
    Limit is deterministic: (s_name, p_partkey) is unique per row and both
    appear in the ORDER BY."""
    from pyspark.sql import Window

    ps = _partsupp(spark, sf_dir)
    s, n, r, p = _t(spark, sf_dir, "supplier", "nation", "region", "part")
    eu_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu = ps.join(F.broadcast(eu_sup), ps.ps_suppkey == eu_sup.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    target = p.filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    return (
        eu.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(target), F.col("ps_partkey") == target.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
        WITH {_PARTSUPP_SQL},
        de AS (
            SELECT ps.ps_partkey,
                   CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,2)) AS v
            FROM partsupp ps
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_7'
        )
        SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
        FROM de GROUP BY ps_partkey
        HAVING SUM(v) > (SELECT SUM(v) * 0.001 FROM de)
        ORDER BY part_value DESC, ps_partkey
    """,
    tags=("tpch", "agg", "subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11: parts representing a significant share of one nation's
    stock value. Inventory value is exact decimal (supplycost ×
    availqty), so the HAVING threshold (total × 0.001) is bit-identical
    across engines. The global total is a 1-row broadcast parameter."""
    ps = _partsupp(spark, sf_dir)
    s, n = _t(spark, sf_dir, "supplier", "nation")
    nat_sup = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_7")),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey")
    de = ps.join(F.broadcast(nat_sup), ps.ps_suppkey == nat_sup.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty"))
        .cast("decimal(18,2)")
        .alias("v"),
    )
    total = de.agg(F.sum("v").alias("tot"))
    return (
        de.groupBy("ps_partkey")
        .agg(F.sum("v").alias("sum_v"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("sum_v") > F.col("tot") * 0.001)
        .select("ps_partkey", F.col("sum_v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@query(
    "tpch_q16_part_supplier_relationship",
    oracle=f"""
        WITH {_PARTSUPP_SQL}
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
        WHERE p.p_brand <> 'Brand#2' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND ps.ps_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100.0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "agg", "distinct", "subquery"),
)
def tpch_q16_part_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 (adapted: the 'customer complaints' comment scan becomes
    a low-acctbal supplier blacklist — no comment column): supplier
    variety per brand/type/size. The NOT IN compiles to a broadcast anti
    join (s_suppkey is never null); COUNT(DISTINCT) shuffles only
    (brand, type, size, suppkey) tuples."""
    ps = _partsupp(spark, sf_dir)
    p, s = _t(spark, sf_dir, "part", "supplier")
    bad = s.filter(F.col("s_acctbal") < 100.0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    target = p.filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(bad, "ps_suppkey", "left_anti")
        .join(F.broadcast(target), ps.ps_partkey == target.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_potential_promotion",
    oracle=f"""
        WITH {_PARTSUPP_SQL},
        qty AS (
            SELECT l_partkey, l_suppkey, 0.5 * SUM(l_quantity) AS half_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s.s_name, n.n_name
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
          AND s.s_suppkey IN (
            SELECT ps.ps_suppkey FROM partsupp ps
            JOIN part p ON p.p_partkey = ps.ps_partkey
            JOIN qty q ON q.l_partkey = ps.ps_partkey
                      AND q.l_suppkey = ps.ps_suppkey
            WHERE p.p_name LIKE 'red%' AND ps.ps_availqty > q.half_qty)
        ORDER BY s.s_name
    """,
    tags=("tpch", "join", "subquery", "semi"),
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 (adapted: EUROPE region for the single-nation filter —
    keeps the result non-vacuous on the small synthetic corpus; l_quantity
    sums stay double because 0.5·sum only feeds a > comparison, not an
    output column): suppliers overstocked on 'red' parts. lineitem
    aggregates once on (partkey, suppkey); the IN becomes a left-semi
    chain ending at the supplier dim."""
    ps = _partsupp(spark, sf_dir)
    s, n, r, p, li = _t(
        spark, sf_dir, "supplier", "nation", "region", "part", "lineitem"
    )
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    red = p.filter(F.col("p_name").like("red%")).select("p_partkey")
    over = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey, "left_semi")
        .join(
            qty,
            (ps.ps_partkey == qty.l_partkey) & (ps.ps_suppkey == qty.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
        .join(over.withColumnRenamed("ps_suppkey", "s_suppkey"), "s_suppkey", "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_PROFIT_SQL = (
    "l.l_extendedprice * (1 - l.l_discount)"
    " - CAST(ps.ps_supplycost AS DOUBLE) * l.l_quantity"
)


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
        WITH {_PARTSUPP_SQL}
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               {dec_sum_sql(_PROFIT_SQL)} AS sum_profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                        AND ps.ps_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 (adapted: '%red%' over the synthetic color-word p_name for
    the original '%green%'; derived partsupp): profit by nation and year
    for red parts. lineitem⋈orders shuffles on orderkey; part/supplier/
    nation broadcast; partsupp (4·|part| rows, derivation map-only) joins
    lineitem on (partkey, suppkey) — at 100 TB that pair join shuffles both
    sides on the composite key, which AQE coalesces; the restriction to
    '%red%' parts pushes through the partsupp build via the part semi
    filter before the fact shuffle."""
    ps = _partsupp(spark, sf_dir)
    l, p, s, o, n = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    red = p.filter(F.col("p_name").like("%red%")).select("p_partkey")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost").cast("double") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(red), l.l_partkey == red.p_partkey, "left_semi")
        .join(
            ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey, "left_semi"),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dec_sum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
        WITH lo AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM lo l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM lo l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lo l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    tags=("tpch", "join", "agg", "subquery", "topk"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 (adapted: late := shipped >60 days after the order, the
    same ship-lag SLA as q12, for the absent commit/receipt dates; no
    single-nation filter so the answer stays non-vacuous at sf0.001):
    suppliers who were the SOLE late supplier on a multi-supplier 'F'
    order. The oracle keeps the original's EXISTS / NOT-EXISTS shape; the
    Spark plan decorrelates both subqueries into ONE per-order aggregate —
    count distinct suppliers, count distinct late suppliers, the sole late
    suppkey, and that supplier's late-line count — so lineitem is scanned
    and shuffled once on orderkey instead of three self-joins. Qualifying
    orders (n_supp > 1, exactly one late supplier) then aggregate on
    suppkey: a second shuffle of order-sized rows, not line-sized.
    Deterministic LIMIT: s_name is unique and tie-breaks numwait."""
    l, o, s = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    lo = l.join(
        o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        l.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    late_supp = F.when(F.col("late"), F.col("l_suppkey"))
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late_supp"),
        F.min(late_supp).alias("late_suppkey"),
        F.sum(F.col("late").cast("long")).alias("late_lines"),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("late_suppkey")
        .agg(F.sum("late_lines").alias("numwait"))
        .join(F.broadcast(s), F.col("late_suppkey") == s.s_suppkey)
        .select("s_name", F.col("numwait").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
