"""Round-6 analytics extensions, batch 3: statistical tests (Welch t,
Kolmogorov–Smirnov), generalized power means, weighted median, rolling
medians, corpus n-gram frequency / Zipf fit, graph co-occurrence
projections, and deterministic pair-distance profiling.

All [EXT] surface beyond the reference's replication dataflow
(``ReplicationApplication.java:71`` is its only transform). Every query is
oracle-checked against DuckDB; scale notes per query docstring.

Cross-engine numeric discipline (see SCALE.md): only IEEE-exact operations
(+, -, *, /, sqrt, comparisons) run on doubles; anything accumulated is
first cast to DECIMAL so the sum is exact and order-independent.
Transcendentals (ln/exp) are avoided in hash-matched columns — Java's
``Math.log`` and libm's ``log`` are each within 1 ulp but not always the
*same* ulp, so a 600k-row sum of lns cannot be made bit-stable across
engines. Power means at p = -1, 1, 2 need only division/multiply/sqrt and
are exact; the geometric mean (p → 0) is deliberately excluded.

All queries are tagged ``defer-sample`` so the driver's 50-row correctness
window keeps draining the pre-r6 backlog first (queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec
from . import query

# Exact decimal power sum emitted as double, via the string hop both
# engines print identically (aggregates.py uses the same idiom).
_DSUM = "CAST(CAST(SUM(CAST(({e}) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)"


def _dsum(col):
    return F.sum(dec(col)).cast("string").cast("double")


@query(
    "stat_welch_ttest",
    oracle=f"""
        WITH s AS (
            SELECT
                COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS n1,
                COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS n2,
                {_DSUM.format(e="CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END")} AS sx1,
                {_DSUM.format(e="CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal * c_acctbal END")} AS sxx1,
                {_DSUM.format(e="CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END")} AS sx2,
                {_DSUM.format(e="CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal * c_acctbal END")} AS sxx2
            FROM customer
        )
        SELECT n1, n2,
               sx1 / n1 AS mean_building,
               sx2 / n2 AS mean_machinery,
               (sxx1 - sx1 * sx1 / n1) / (n1 - 1) AS var_building,
               (sxx2 - sx2 * sx2 / n2) / (n2 - 1) AS var_machinery,
               (sx1 / n1 - sx2 / n2)
                 / sqrt((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1
                        + (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2) AS t_stat,
               ((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1
                + (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2)
               * ((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1
                  + (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2)
               / ((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1
                  * ((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1) / (n1 - 1)
                  + (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2
                    * ((sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2) / (n2 - 1))
                 AS welch_df
        FROM s
    """,
    tags=("stats", "defer-sample"),
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments'
    account balances, computed from exact decimal power sums in ONE
    aggregation pass (conditional sums — no join, no second scan).

    The native ``stddev``/``var_samp`` of either engine accumulates IEEE
    doubles in scan order and cannot hash-match; six exact decimal sums
    plus a fixed IEEE epilogue are bit-stable on both engines and keep
    map-side partial aggregation (the shuffle carries six numbers total).
    100-TB shape: a single scan → one 1-row aggregate; nothing grows with
    data volume."""
    c = load_table(spark, sf_dir, "customer")
    b = F.col("c_mktsegment") == "BUILDING"
    m = F.col("c_mktsegment") == "MACHINERY"
    bal = F.col("c_acctbal")
    s = c.agg(
        F.count(F.when(b, 1)).alias("n1"),
        F.count(F.when(m, 1)).alias("n2"),
        _dsum(F.when(b, bal)).alias("sx1"),
        _dsum(F.when(b, bal * bal)).alias("sxx1"),
        _dsum(F.when(m, bal)).alias("sx2"),
        _dsum(F.when(m, bal * bal)).alias("sxx2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    sx1, sxx1 = F.col("sx1"), F.col("sxx1")
    sx2, sxx2 = F.col("sx2"), F.col("sxx2")
    v1 = (sxx1 - sx1 * sx1 / n1) / (n1 - 1)
    v2 = (sxx2 - sx2 * sx2 / n2) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    return s.select(
        "n1",
        "n2",
        (sx1 / n1).alias("mean_building"),
        (sx2 / n2).alias("mean_machinery"),
        v1.alias("var_building"),
        v2.alias("var_machinery"),
        ((sx1 / n1 - sx2 / n2) / F.sqrt(se1 + se2)).alias("t_stat"),
        (
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
        ).alias("welch_df"),
    )


@query(
    "agg_generalized_means",
    oracle=f"""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               {_DSUM.format(e='o_totalprice')} / COUNT(*) AS arithmetic_mean,
               COUNT(*) / CAST(CAST(SUM(CAST(1.0 / o_totalprice AS DECIMAL(18,16)))
                                AS VARCHAR) AS DOUBLE) AS harmonic_mean,
               sqrt({_DSUM.format(e='o_totalprice * o_totalprice')} / COUNT(*))
                 AS quadratic_mean
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "stats", "defer-sample"),
)
def agg_generalized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized power means (p = -1 harmonic, p = 1 arithmetic, p = 2
    quadratic/RMS) of order totalprice per priority.

    Every per-row transform here (1/x, x*x) is an IEEE correctly-rounded
    op, so both engines produce the identical double before the decimal
    cast — which makes the exact decimal sums bit-stable. The geometric
    mean (p → 0) is excluded on purpose: it needs ln/exp, which differ
    by one ulp between Java and libm on some inputs and poison a
    600k-term sum (module docstring). 100-TB shape: plain hash aggregate
    with map-side partials — the shuffle carries three sums per group."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    inv = F.sum((F.lit(1.0) / tp).cast("decimal(18,16)")).cast("string").cast("double")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (_dsum(tp) / F.count("*")).alias("arithmetic_mean"),
        (F.count("*") / inv).alias("harmonic_mean"),
        F.sqrt(_dsum(tp * tp) / F.count("*")).alias("quadratic_mean"),
    )


@query(
    "agg_weighted_median",
    oracle="""
        WITH g AS (
            SELECT l_returnflag, l_extendedprice AS price,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR)
                        AS DOUBLE) AS w
            FROM lineitem
            GROUP BY l_returnflag, l_extendedprice
        ), c AS (
            SELECT l_returnflag, price, w,
                   SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cumw,
                   SUM(w) OVER (PARTITION BY l_returnflag) AS totw
            FROM g
        )
        SELECT l_returnflag,
               MIN(price) FILTER (2 * cumw >= totw) AS weighted_median,
               CAST(MAX(totw) AS DOUBLE) AS total_weight
        FROM c
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "defer-sample"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price whose cumulative weight reaches half the group total
    (the classic lower weighted median — ties collapse by pre-grouping
    on (flag, price), so the cumulative sum is over DISTINCT prices and
    fully deterministic; no interpolation, no transcendentals).

    Scale shape: the first aggregation collapses raw rows to distinct
    (group, value) pairs — the window then runs over the collapsed
    table, orders of magnitude smaller than the fact table. For a
    100-TB group whose distinct-value set is still huge, the same
    answer comes from the two-phase banded-rank pattern
    (agg_histogram_equidepth); the window form is kept here because the
    post-collapse partition is value-bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price")).agg(
        _dsum("l_quantity").alias("w")
    )
    win = Window.partitionBy("l_returnflag").orderBy("price")
    c = g.select(
        "l_returnflag",
        "price",
        F.sum("w").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias("cumw"),
        F.sum("w").over(
            win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("totw"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("price"))).alias(
            "weighted_median"
        ),
        F.max("totw").cast("double").alias("total_weight"),
    )


@query(
    "ts_rolling_median",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR)
                        AS DOUBLE) AS revenue
            FROM events
            GROUP BY event_type, date_trunc('day', ts)
        ), r AS (
            SELECT event_type, day, revenue,
                   median(revenue) OVER (PARTITION BY event_type ORDER BY day
                                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                     AS rolling_median7,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
            FROM daily
        )
        SELECT event_type, day, revenue, rolling_median7
        FROM r WHERE rn >= 7
    """,
    tags=("ts", "window", "defer-sample"),
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling median of daily revenue per event type — the
    outlier-robust counterpart of win_moving_avg (a single spiky day
    drags a mean but not a median).

    Rows before the 7th day are dropped so every emitted frame holds
    exactly 7 values: the median of an odd-cardinality frame is a
    *selection* (4th order statistic), not an interpolation, so Spark's
    ``percentile`` and DuckDB's ``median`` agree bit-for-bit (partial
    frames have even counts whose midpoint interpolation is formula-
    dependent in the last ulp — excluded by construction). 100-TB
    shape: the aggregation collapses to one row per (type, day); the
    window partition is calendar-bounded (rows = days), never raw
    volume."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(_dsum("value").alias("revenue"))
    win = Window.partitionBy("event_type").orderBy("day")
    r = daily.select(
        "event_type",
        "day",
        "revenue",
        F.expr("percentile(revenue, 0.5)")
        .over(win.rowsBetween(-6, 0))
        .alias("rolling_median7"),
        F.row_number().over(win).alias("rn"),
    )
    return r.filter(F.col("rn") >= 7).drop("rn")


# ---------------------------------------------------------------------------
# Corpus n-gram frequency surface: whitespace tokens (the same _TOKENS twin
# llm_text uses) -> adjacent-pair bigrams entirely in JVM higher-order
# functions -> hash aggregate. No Python anywhere.
# ---------------------------------------------------------------------------

_TOKENS_SQL = "string_split_regex(lower(text), '\\s+')"


@query(
    "text_ngram_topk",
    oracle=f"""
        WITH t AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
        b AS (
            SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1]))
                     AS bigram
            FROM t
        )
        SELECT bigram, COUNT(*) AS n
        FROM b GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 20
    """,
    tags=("llm", "text", "defer-sample"),
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams with exact counts — the building block
    of boilerplate mining and collocation scoring (text_collocations_pmi
    ranks by PMI; this is the raw frequency view).

    Bigrams are built JVM-side with ``zip_with`` over two shifted slices
    of the token array (no Python, no explode-then-self-join), then one
    hash aggregate with map-side partials and a TakeOrderedAndProject
    top-k — the 100-TB shape: the shuffle carries (bigram, partial
    count), the driver sees 20 rows. Ties at the cut are broken by the
    bigram itself so the limit is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "text_zipf_fit",
    oracle=f"""
        WITH t AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
        w AS (SELECT unnest(toks) AS token FROM t),
        v AS (
            SELECT token, COUNT(*) AS cnt FROM w GROUP BY token
            HAVING COUNT(*) >= 5
        ),
        ranked AS (
            SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
            FROM v
        ),
        logs AS (
            SELECT CAST(ROUND(ln(rnk), 6) AS DECIMAL(12,6)) AS lx,
                   CAST(ROUND(ln(cnt), 6) AS DECIMAL(12,6)) AS ly
            FROM ranked
        ),
        s AS (
            SELECT COUNT(*) AS n,
                   CAST(CAST(SUM(lx) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(lx * lx) AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(ly) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(ly * ly) AS VARCHAR) AS DOUBLE) AS syy,
                   CAST(CAST(SUM(lx * ly) AS VARCHAR) AS DOUBLE) AS sxy
            FROM logs
        )
        SELECT n AS n_vocab,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS zipf_slope,
               sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sx / n)
                 AS zipf_intercept,
               ((sxy - sx * sy / n) * (sxy - sx * sy / n))
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS zipf_r2
        FROM s
    """,
    tags=("llm", "text", "stats", "defer-sample"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: regress
    log(frequency) on log(rank) for tokens seen >= 5 times; the slope of
    a natural-language corpus sits near -1, so drift is a corpus-quality
    signal (template/spam corpora flatten, truncated vocabularies
    steepen).

    Numeric discipline: ln is NOT IEEE-exact across engines (module
    docstring), so each log is rounded to 6 dp BEFORE entering the
    decimal power sums — a one-ulp disagreement between Java's and
    libm's ln survives the rounding with probability ~4e-9 per value,
    and the regression epilogue over the exact sums is bit-stable. The
    rank window is vocab-bounded (the >= 5 floor caps it far below
    corpus size), the token aggregate itself is the standard map-side
    partial pattern — raw volume never reaches the window."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    v = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )
    ranked = v.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("token")))
        .alias("rnk"),
    )
    logs = ranked.select(
        F.round(F.log(F.col("rnk")), 6).cast("decimal(12,6)").alias("lx"),
        F.round(F.log(F.col("cnt")), 6).cast("decimal(12,6)").alias("ly"),
    )
    s = logs.agg(
        F.count("*").alias("n"),
        F.sum("lx").cast("string").cast("double").alias("sx"),
        F.sum(F.col("lx") * F.col("lx")).cast("string").cast("double").alias("sxx"),
        F.sum("ly").cast("string").cast("double").alias("sy"),
        F.sum(F.col("ly") * F.col("ly")).cast("string").cast("double").alias("syy"),
        F.sum(F.col("lx") * F.col("ly")).cast("string").cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy")
    )
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    return s.select(
        F.col("n").alias("n_vocab"),
        slope.alias("zipf_slope"),
        (sy / n - slope * (sx / n)).alias("zipf_intercept"),
        (
            ((sxy - sx * sy / n) * (sxy - sx * sy / n))
            / ((sxx - sx * sx / n) * (syy - sy * sy / n))
        ).alias("zipf_r2"),
    )


# ---------------------------------------------------------------------------
# Graph projections over the purchase bipartite graph (order->part,
# customer->part). Pair generation is always blocked on the shared entity
# and the block size is bounded (order line count) or df-capped (part
# buyer count) — never an unbounded self-join.
# ---------------------------------------------------------------------------


@query(
    "graph_bipartite_copurchase",
    oracle="""
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        ORDER BY n_orders DESC, part_a, part_b LIMIT 20
    """,
    tags=("graph", "defer-sample"),
)
def graph_bipartite_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of the order->part graph: top co-purchased
    part pairs (the 'frequently bought together' primitive, and the edge
    list a part-similarity graph is built from).

    Pair generation is blocked on the order key after a DISTINCT
    collapse, so the fan-out per order is C(lines, 2) with the line
    count bounded by order size (<= 7 in TPC-H shape; at 100 TB the same
    bound holds per order, so the join output is linear in orders, not
    quadratic in parts). The equi-join shuffles both sides by orderkey
    once; the pair aggregate is the standard partial-agg top-k."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, ["k"])
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@query(
    "graph_common_neighbors",
    oracle="""
        WITH cp AS (
            SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        capped AS (
            SELECT part FROM cp GROUP BY part
            HAVING COUNT(*) <= 50
        ),
        e AS (SELECT cust, cp.part FROM cp JOIN capped USING (part)),
        deg AS (SELECT cust, COUNT(*) AS deg FROM e GROUP BY cust),
        pairs AS (
            SELECT a.cust AS cust_a, b.cust AS cust_b, COUNT(*) AS common_parts
            FROM e a JOIN e b ON a.part = b.part AND a.cust < b.cust
            GROUP BY a.cust, b.cust
        )
        SELECT cust_a, cust_b, common_parts,
               da.deg AS deg_a, db.deg AS deg_b,
               ROUND(CAST(common_parts AS DOUBLE)
                     / (da.deg + db.deg - common_parts), 6) AS jaccard
        FROM pairs
        JOIN deg da ON da.cust = cust_a
        JOIN deg db ON db.cust = cust_b
        ORDER BY common_parts DESC, cust_a, cust_b LIMIT 20
    """,
    tags=("graph", "defer-sample"),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction on the customer-part bipartite
    graph: customer pairs ranked by shared distinct parts, with the
    Jaccard overlap of their part sets — the classic co-engagement
    similarity (same shape as user-user collaborative filtering and
    audience-overlap analysis).

    The graph is first restricted to parts with <= 50 distinct buyers —
    the document-frequency cap of the set-similarity literature (same
    role as dedup_ngram_jaccard's df <= 100): pair candidates are
    Sum_over_capped_parts C(buyers, 2), linear in edges once the cap
    binds, and the hub parts a cap drops contribute negligible
    similarity signal anyway. Degrees are computed on the SAME capped
    graph so jaccard = common / (|A u B|) is internally consistent.
    Everything is equi-joins + hash aggregates; no all-pairs product
    anywhere."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    capped = cp.groupBy("part").agg(F.count("*").alias("buyers")).filter(
        F.col("buyers") <= 50
    )
    e = cp.join(capped.select("part"), ["part"])
    deg = e.groupBy("cust").agg(F.count("*").alias("deg"))
    a = e.select(F.col("part").alias("p"), F.col("cust").alias("cust_a"))
    b = e.select(F.col("part").alias("p"), F.col("cust").alias("cust_b"))
    pairs = (
        a.join(b, ["p"])
        .filter(F.col("cust_a") < F.col("cust_b"))
        .groupBy("cust_a", "cust_b")
        .agg(F.count("*").alias("common_parts"))
    )
    da = deg.select(F.col("cust").alias("cust_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("cust").alias("cust_b"), F.col("deg").alias("deg_b"))
    return (
        pairs.join(da, ["cust_a"])
        .join(db, ["cust_b"])
        .select(
            "cust_a",
            "cust_b",
            "common_parts",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common_parts").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_parts")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("common_parts"), F.asc("cust_a"), F.asc("cust_b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Avro Object Container File source: parquet -> executor-written OCF files
# (functions/avro_ocf, pure-Python from the public spec) -> binaryFile scan
# + Arrow-batched decode. The self-describing Avro FILE layout the
# reference's ecosystem stores topics as when archived to object storage
# (its wire format is the Confluent per-record framing, avro_codec).
# ---------------------------------------------------------------------------

_OCF_SCHEMA = (
    '{"type": "record", "name": "Cust", "fields": ['
    '{"name": "custkey", "type": "long"}, '
    '{"name": "name", "type": "string"}, '
    '{"name": "acctbal", "type": "double"}, '
    '{"name": "mktsegment", "type": ["null", "string"], "default": null}]}'
)


def _ocf_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build per-sf OCF files from the customer table — written by the
    EXECUTORS (one file per custkey bucket via applyInPandas), the shape a
    100-TB export job has: each task serializes its partition and writes
    one container file to shared storage; nothing funnels through the
    driver."""
    import glob as _glob
    import os as _os

    from ..streaming.replay import SCRATCH

    sf_tag = _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    out_dir = _os.path.join(SCRATCH, "io", sf_tag, "avro_ocf")
    done = _os.path.join(out_dir, "_done")
    if _os.path.exists(done) and len(_glob.glob(_os.path.join(out_dir, "*.avro"))) == 4:
        return out_dir
    _os.makedirs(out_dir, exist_ok=True)
    schema_json = _OCF_SCHEMA

    def write_bucket(pdf):
        import pandas as pd

        from avro_topic_replication_spark.functions.avro_ocf import write_ocf

        pdf = pdf.sort_values("c_custkey")
        bucket = int(pdf["bucket"].iloc[0])
        recs = (
            {
                "custkey": int(r.c_custkey),
                "name": str(r.c_name),
                "acctbal": float(r.c_acctbal),
                "mktsegment": str(r.c_mktsegment),
            }
            for r in pdf.itertuples()
        )
        blob = write_ocf(recs, schema_json, tag=f"b{bucket}")
        with open(_os.path.join(out_dir, f"part_{bucket}.avro"), "wb") as f:
            f.write(blob)
        return pd.DataFrame({"bucket": [bucket], "n": [len(pdf)]})

    c = load_table(spark, sf_dir, "customer").withColumn(
        "bucket", F.col("c_custkey") % 4
    )
    (
        c.groupBy("bucket")
        .applyInPandas(write_bucket, "bucket long, n long")
        .count()  # materialize the write job
    )
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


@query(
    "source_avro_container",
    oracle="""
        SELECT c_custkey AS custkey, c_name AS name,
               c_acctbal AS acctbal, c_mktsegment AS mktsegment
        FROM customer
    """,
    tags=("source", "avro", "defer-sample"),
)
def source_avro_container(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File ingest without the spark-avro jar: OCF
    files (written executor-side by _ocf_fixture) are scanned with
    ``binaryFile`` (one task per file) and decoded by an Arrow-batched
    ``mapInPandas`` over the pure-Python OCF reader (functions/avro_ocf,
    from the public Avro 1.11 spec). The oracle is the original customer
    parquet — a full roundtrip proof: parquet -> Avro binary -> parquet
    row values, bit-exact on longs, strings, doubles, and a nullable
    union.

    100-TB shape: parallelism = file count on both write (one task per
    bucket) and read (binaryFile splits per file); per-record work stays
    in Arrow batches. With the spark-avro jar installed the same files
    are `spark.read.format("avro")` — this query IS that source's
    contract, executable in this jarless sandbox (same env gate as
    SCALE.md's JVM from_avro note)."""
    import glob as _glob

    read_schema = "custkey long, name string, acctbal double, mktsegment string"
    path = _ocf_fixture(spark, sf_dir)
    if not _glob.glob(path + "/*.avro"):
        # zero-row corpus ⇒ the export produced no container files; the
        # source contract is an empty frame, not a missing-path error
        return spark.createDataFrame([], read_schema)

    def decode_files(batches):
        import pandas as pd

        from avro_topic_replication_spark.functions.avro_ocf import read_ocf

        for pdf in batches:
            for blob in pdf["content"]:
                _, recs = read_ocf(bytes(blob))
                yield pd.DataFrame.from_records(recs)[
                    ["custkey", "name", "acctbal", "mktsegment"]
                ]

    files = spark.read.format("binaryFile").load(path + "/*.avro")
    return files.select("content").mapInPandas(
        decode_files,
        read_schema,
    )


@query(
    "sql_order_by_all",
    oracle="""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """,
    tags=("sql", "engine4", "defer-sample"),
)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` — the modern SQL shorthand
    (DuckDB-pioneered, adopted by Spark) binding every non-aggregate
    select item as the grouping set and every output column as the sort
    key, left to right. Same textual clause runs on both engines;
    compiles to the identical hash-aggregate + range sort any explicit
    column list yields — zero plan cost for the sugar."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_oba")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
        FROM orders_oba
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "vec_pair_distance_histogram",
    oracle="""
        WITH p AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND({dot} / (sqrt({daa}) * sqrt({dbb})), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        )
        SELECT CAST(LEAST(FLOOR((cosine + 1.0) / 0.25), 7) AS BIGINT) AS bucket,
               -1.0 + 0.25 * CAST(LEAST(FLOOR((cosine + 1.0) / 0.25), 7) AS BIGINT)
                 AS bucket_lo,
               COUNT(*) AS n_pairs,
               CAST(CAST(SUM(CAST(cosine AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS mean_cosine
        FROM p
        GROUP BY 1, 2
    """.format(
        dot="""list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""",
        daa="""list_reduce(list_transform(list_zip(a.embedding, a.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""",
        dbb="""list_reduce(list_transform(list_zip(b.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""",
    ),
    tags=("llm", "vector", "stats", "defer-sample"),
)
def vec_pair_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine distribution profile over a deterministic linear
    pair sample (each vector against its id-successor): the corpus-level
    geometry check run before tuning ANN thresholds — a healthy embedding
    space concentrates random-pair cosine near 0; drift toward 1 signals
    collapsed embeddings, and the histogram makes that a one-glance
    diagnostic.

    The successor join is an equi-join (shift key), so the 'random pair'
    sample costs one shuffle and stays linear in corpus size — the
    all-pairs version this replaces is quadratic and never runs at scale.
    Cosine is the deterministic left fold (llm_vectors._dot), rounded at
    6dp BEFORE bucketing and the decimal mean so both engines bucket the
    identical double. 100-TB shape: shuffle carries (id, vector) once;
    the aggregate is 8 buckets of partial sums."""
    from .llm_vectors import _dot

    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select((F.col("vec_id") - 1).alias("id_a"), F.col("embedding").alias("eb"))
    cos = F.round(
        _dot(F.col("ea"), F.col("eb"))
        / (
            F.sqrt(_dot(F.col("ea"), F.col("ea")))
            * F.sqrt(_dot(F.col("eb"), F.col("eb")))
        ),
        6,
    )
    p = a.join(b, ["id_a"]).select(cos.alias("cosine"))
    bucket = F.least(F.floor((F.col("cosine") + 1.0) / 0.25), F.lit(7)).cast("bigint")
    return (
        p.select("cosine", bucket.alias("bucket"))
        .withColumn("bucket_lo", F.lit(-1.0) + 0.25 * F.col("bucket"))
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count("*").alias("n_pairs"),
            (
                F.sum(F.col("cosine").cast("decimal(18,6)"))
                .cast("string")
                .cast("double")
                / F.count("*")
            ).alias("mean_cosine"),
        )
    )
