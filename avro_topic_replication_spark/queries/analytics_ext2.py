"""Round-6 analytics extensions, batch 2+: binary-quantized ANN, Spark 4
``listagg``, null-safe joins, schema-aligned unions, linear time-series
interpolation, event path mining, inter-arrival statistics, chi-square
independence testing, dynamic-gap session windows, incremental aggregate
refresh, and the SQL CACHE TABLE surface.

All [EXT] surface beyond the reference's replication dataflow
(ReplicationApplication.java:71 is its only transform). Every query is
oracle-checked against DuckDB; scale notes per query docstring.

"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

# ---------------------------------------------------------------------------
# Binary-quantized similarity search: sign-quantize each 64-dim embedding
# into two 32-bit halves packed in BIGINTs (bit i of half h = 1 iff
# embedding[32h + i] > 0), then rank by Hamming distance — the classic
# 1-bit product-quantization baseline (32× smaller than float32 vectors,
# distance = two XOR+popcount ops). All-integer math → bit-exact oracle.
# ---------------------------------------------------------------------------

_PACK_SPARK = (
    "aggregate(zip_with(slice(embedding, {off}, 32), sequence(0, 31),"
    " (x, i) -> IF(x > CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i),"
    " CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, b) -> a + b)"
)

_PACK_DUCK = """
    SELECT vec_id,
           CAST(SUM(CASE WHEN i <= 32 AND embedding[i] > 0
                    THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END) AS BIGINT) AS lo,
           CAST(SUM(CASE WHEN i > 32 AND embedding[i] > 0
                    THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END) AS BIGINT) AS hi
    FROM embeddings, range(1, 65) t(i)
    GROUP BY vec_id
"""


@query(
    "vec_hamming_topk",
    oracle=f"""
        WITH codes AS ({_PACK_DUCK}),
        q AS (SELECT lo AS qlo, hi AS qhi FROM codes WHERE vec_id = 0)
        SELECT c.vec_id,
               CAST(bit_count(xor(c.lo, q.qlo))
                    + bit_count(xor(c.hi, q.qhi)) AS INT) AS hamming
        FROM codes c, q
        WHERE c.vec_id <> 0
        ORDER BY hamming, c.vec_id
        LIMIT 10
    """,
    tags=("vectors", "ann"),
)
def vec_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest neighbours under 1-bit (sign) quantization: pack the
    sign pattern of each 64-dim embedding into two BIGINT halves, rank by
    Hamming distance to the query's code (XOR + popcount), take the 10
    closest with vec_id tie-break.

    Scale shape: packing is one JVM fold per row (zip_with + aggregate,
    whole-stage codegen — no Python); codes are 16 bytes/vector, so a
    100 TB float corpus quantizes to ~0.4 TB of codes that scan at memory
    bandwidth. The query code is a 1-row broadcast; ranking is
    TakeOrderedAndProject (per-partition top-10 → driver merges 10×P
    rows, never a global sort). The production upgrade is the same code
    column bucketed by a few leading bits (LSH on the sign bits) so the
    scan touches only matching buckets — identical packing, narrower
    scan. Reference parity: none ([EXT] north-star, SURVEY §2.2).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    codes = emb.select(
        "vec_id",
        F.expr(_PACK_SPARK.format(off=1)).alias("lo"),
        F.expr(_PACK_SPARK.format(off=33)).alias("hi"),
    )
    q = codes.filter(F.col("vec_id") == 0).select(
        F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    return (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
            )
            .cast("int")
            .alias("hamming"),
        )
        .orderBy("hamming", "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Spark 4 listagg / string aggregation with an explicit WITHIN GROUP order.
# ---------------------------------------------------------------------------


@query(
    "agg_listagg_top_names",
    oracle="""
        WITH ranked AS (
            SELECT c_nationkey, c_name,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        )
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               string_agg(c_name, '|' ORDER BY c_name) AS top_names,
               CAST(COUNT(*) AS BIGINT) AS n_listed
        FROM ranked WHERE rn <= 3
        GROUP BY c_nationkey
    """,
    tags=("agg", "string", "engine4"),
)
def agg_listagg_top_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation via Spark 4's ``listagg(...) WITHIN
    GROUP (ORDER BY ...)``: the 3 highest-balance customer names per
    nation, concatenated in deterministic name order (DuckDB twin:
    ``string_agg(... ORDER BY ...)``).

    Scale shape: the per-nation top-3 is a ranking window partitioned by
    the group key (post-shuffle partitions are group-sized), the listagg
    itself aggregates ≤3 short strings per group — output rows = #groups.
    At 100 TB the window input would first be thinned with a per-partition
    top-3 pre-pass (the sort_topk_global pattern); the agg is unchanged.
    """
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    ranked = cust.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    ranked.createOrReplaceTempView("_listagg_ranked")
    return spark.sql(
        """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS top_names,
               CAST(COUNT(*) AS BIGINT) AS n_listed
        FROM _listagg_ranked
        GROUP BY c_nationkey
        """
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
# each other — the semantics MERGE and SCD pipelines rely on.
# ---------------------------------------------------------------------------


@query(
    "join_null_safe_eq",
    oracle="""
        WITH cust_k AS (
            SELECT NULLIF(CAST(c_nationkey AS BIGINT) % 6, 0) AS k,
                   CAST(COUNT(*) AS BIGINT) AS n_cust
            FROM customer GROUP BY 1
        ),
        supp_k AS (
            SELECT NULLIF(CAST(s_nationkey AS BIGINT) % 7, 0) AS k,
                   CAST(COUNT(*) AS BIGINT) AS n_supp
            FROM supplier GROUP BY 1
        )
        SELECT c.k, c.n_cust, s.n_supp
        FROM cust_k c JOIN supp_k s ON c.k IS NOT DISTINCT FROM s.k
    """,
    tags=("join", "null-semantics"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``eqNullSafe`` / SQL ``<=>``): both sides
    derive a nullable bucket key (NULLIF of a modulus), and the join must
    match the NULL buckets to each other — plain ``=`` would silently
    drop them (the classic MERGE-key bug).

    Scale shape: both inputs are pre-aggregated to #buckets rows before
    the join, so the null-safe comparison runs on dimension-sized tables
    (broadcast). On fact-sized inputs ``<=>`` still plans as a hash join
    (null-safe equality is a valid hash key — NULL hashes to a bucket),
    so the same plan holds at 100 TB; only ``!=``-style theta predicates
    degrade to BNLJ.
    """
    cust_k = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.nullif(
                F.col("c_nationkey").cast("bigint") % 6, F.lit(0)
            ).alias("k")
        )
        .agg(F.count("*").alias("n_cust"))
    )
    supp_k = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(
            F.nullif(
                F.col("s_nationkey").cast("bigint") % 7, F.lit(0)
            ).alias("k")
        )
        .agg(F.count("*").alias("n_supp"))
    )
    return cust_k.join(
        F.broadcast(supp_k), cust_k["k"].eqNullSafe(supp_k["k"]), "inner"
    ).select(cust_k["k"], "n_cust", "n_supp")


# ---------------------------------------------------------------------------
# Schema-aligned union: unionByName with missing columns null-filled —
# the multi-source ingestion primitive (DuckDB twin: UNION ALL BY NAME).
# ---------------------------------------------------------------------------


@query(
    "setop_union_by_name",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
               c_acctbal AS balance, 'customer' AS src
        FROM customer WHERE c_custkey <= 50
        UNION ALL BY NAME
        SELECT s_name AS name, CAST(s_suppkey AS BIGINT) AS id,
               'supplier' AS src
        FROM supplier WHERE s_suppkey <= 20
    """,
    tags=("setop", "schema"),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two sources with different column ORDER and a column missing
    on one side: ``unionByName(allowMissingColumns=True)`` aligns by name
    and null-fills the gap — positional ``UNION ALL`` would mis-zip or
    reject. The everyday primitive for merging heterogeneous feeds into
    one table.

    Scale shape: union is a zero-shuffle plan concatenation (both legs
    stay partition-parallel); the null-fill is a literal projection. Cost
    is exactly the two scans at any size.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(
            F.col("c_custkey").cast("bigint").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("balance"),
            F.lit("customer").alias("src"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 20)
        .select(
            F.col("s_name").alias("name"),
            F.col("s_suppkey").cast("bigint").alias("id"),
            F.lit("supplier").alias("src"),
        )
    )
    return cust.unionByName(supp, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Linear interpolation over a dense daily grid — the numeric upgrade of
# ts_resample_gapfill's carry-forward fill. Anchor values are per-day MAX
# (order-independent) and the interpolation expression has the identical
# IEEE shape on both engines, so the oracle stays bit-exact.
# ---------------------------------------------------------------------------


@query(
    "ts_linear_interpolate",
    oracle="""
        WITH anchors AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   MAX(value) AS v
            FROM events WHERE user_id < 30 AND event_type = 'purchase'
            GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
            FROM anchors GROUP BY 1
        ),
        grid AS (
            SELECT user_id,
                   CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
            FROM span
        ),
        ctx AS (
            SELECT g.user_id, g.day, a.v,
                   last_value(a.v IGNORE NULLS) OVER w_prev AS pv,
                   last_value(CASE WHEN a.v IS NOT NULL THEN g.day END IGNORE NULLS)
                       OVER w_prev AS pd,
                   first_value(a.v IGNORE NULLS) OVER w_next AS nv,
                   first_value(CASE WHEN a.v IS NOT NULL THEN g.day END IGNORE NULLS)
                       OVER w_next AS nd
            FROM grid g
            LEFT JOIN anchors a ON g.user_id = a.user_id AND g.day = a.day
            WINDOW
                w_prev AS (PARTITION BY g.user_id ORDER BY g.day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                w_next AS (PARTITION BY g.user_id ORDER BY g.day
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, day,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                          / CAST(nd - pd AS DOUBLE))
                    WHEN pv IS NOT NULL THEN pv
                    ELSE nv END AS v_interp,
               CAST(v IS NULL AS INT) AS is_interpolated
        FROM ctx
    """,
    tags=("timeseries", "window"),
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of a sparse per-user daily series onto a dense
    grid: anchor days carry MAX(value); missing days get
    ``prev + (next-prev) * elapsed/span`` between their nearest anchors
    (carry-forward/backward at the edges, though the per-user span is
    anchored at both ends by construction).

    Scale shape: one user-keyed aggregate builds the anchors, the grid is
    a per-user sequence+explode (embarrassingly parallel, no driver
    loop), and prev/next context comes from two frames of the SAME
    user-keyed sort — one shuffle + one sort serve all four window
    columns. The interpolation itself is a pure projection. This is the
    standard sensor/metric backfill shape; at 100 TB the only knob is
    range-partitioning users so each task's grid fits in memory.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 30) & (F.col("event_type") == "purchase")
    )
    anchors = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.max("value").alias("v"))
    span = anchors.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = grid.join(anchors, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    anchor_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(anchor_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(anchor_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    return ctx.select(
        "user_id",
        "day",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
        .alias("v_interp"),
        F.col("v").isNull().cast("int").alias("is_interpolated"),
    )


# ---------------------------------------------------------------------------
# Event path mining: each user's first-3 event-type path, counted across
# the population — the product-analytics "top user journeys" query.
# ---------------------------------------------------------------------------


@query(
    "events_top_paths",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        paths AS (
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM ordered WHERE rn <= 3
            GROUP BY user_id
        )
        SELECT path,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MIN(user_id) AS BIGINT) AS sample_user
        FROM paths GROUP BY path
    """,
    tags=("events", "window", "string"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: each user's first three events (deterministic
    (ts, event_id) order) concatenated into a path string, then counted
    across the population — the onboarding-funnel discovery query.

    Scale shape: the rank window and the path aggregate share the SAME
    user_id hash partitioning, so the pipeline is one shuffle end-to-end
    (rank → filter rn<=3 thins each user to 3 rows before the string
    build). Path assembly is sort_array over ≤3-element structs — pure
    JVM, bounded per user. The final count groups by path (≤ |types|³
    distinct keys). At 100 TB: identical plan; the window's per-user sort
    is bounded by events-per-user, the known skew knob (cap with a
    pre-filter on event date if a user is pathological).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    paths = first3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count("*").alias("n_users"),
        F.min("user_id").cast("bigint").alias("sample_user"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival time statistics: the queueing/traffic profile of an event
# stream — all-integer µs gaps, so the oracle is exact by construction.
# ---------------------------------------------------------------------------


@query(
    "events_inter_arrival_stats",
    oracle="""
        WITH ordered AS (
            SELECT event_type, ts,
                   LAG(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        gaps AS (
            SELECT event_type,
                   date_diff('microsecond', prev_ts, ts) AS gap_us
            FROM ordered WHERE prev_ts IS NOT NULL
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
        FROM gaps GROUP BY event_type
    """,
    tags=("events", "window"),
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type (the first thing a
    capacity planner computes): µs-exact gaps from a deterministic
    (ts, event_id)-ordered LAG, then count/min/max/mean. All-BIGINT gap
    math; only the final mean is a double quotient (identical division
    both engines — never re-rounded through a decimal).

    Scale shape: one type-keyed window (sort bounded by events-per-type
    partition) + one partial-aggregated rollup on the same key — the
    window's Exchange is reused by the aggregate. At 100 TB the window
    key would be (type, day-bucket) to bound per-task sort size, with
    bucket-boundary gaps patched by a second tiny pass.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select("event_type", "ts", F.lag("ts").over(w).alias("prev_ts"))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias("gap_us"),
        )
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("*")).alias("avg_gap_us"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence over a bounded contingency table — the
# cell-term sum is an ordered fold (the ts_cusum_drift discipline), so the
# statistic is bit-exact cross-engine.
# ---------------------------------------------------------------------------


@query(
    "stat_chi2_independence",
    oracle="""
        WITH cells AS (
            SELECT event_type, CAST(user_id % 4 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type, bucket, o,
                   CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
                   CAST(SUM(o) OVER (PARTITION BY bucket) AS BIGINT) AS col_tot,
                   CAST(SUM(o) OVER () AS BIGINT) AS n
            FROM cells
        ),
        t AS (
            SELECT event_type, bucket, n,
                   ((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)) / e
                     AS term
            FROM (SELECT *,
                         (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE))
                           / CAST(n AS DOUBLE) AS e
                  FROM m)
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST((COUNT(DISTINCT event_type) - 1)
                    * (COUNT(DISTINCT bucket) - 1) AS BIGINT) AS dof,
               list_reduce(list(term ORDER BY event_type, bucket),
                           (a, b) -> a + b) AS chi2
        FROM t
    """,
    tags=("stats", "agg"),
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and a
    user-hash bucket: observed counts per cell, expected counts from the
    margins (row·col/n), χ² = Σ (o-e)²/e summed as an ORDERED fold over
    the (type, bucket)-sorted cells — the only order-dependent double sum
    in the query, made cross-engine-exact the ts_cusum_drift way.

    Scale shape: ONE partial-aggregated pass over events builds the
    |types|·|buckets| contingency table; margins, expected counts, and
    the fold are projections over that bounded table (20 cells here —
    windows over it are trivially small at any data size).
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("o"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("bucket")
    w_all = Window.partitionBy()
    m = cells.select(
        "event_type",
        "bucket",
        "o",
        F.sum("o").over(w_row).alias("row_tot"),
        F.sum("o").over(w_col).alias("col_tot"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = (F.col("row_tot").cast("double") * F.col("col_tot").cast("double")) / F.col(
        "n"
    ).cast("double")
    o_d = F.col("o").cast("double")
    t = m.select(
        "event_type",
        "bucket",
        "n",
        (((o_d - e) * (o_d - e)) / e).alias("term"),
    )
    return t.agg(
        F.max("n").cast("bigint").alias("n"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("bucket") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("event_type", "bucket", "term"))
                ),
                lambda r: r["term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Dynamic-gap session windows (Spark's session_window with a per-row gap
# Column) — purchases hold a session open 40 min, everything else 15.
# ---------------------------------------------------------------------------


@query(
    "stream_dynamic_session_window",
    oracle="""
        WITH iv AS (
            SELECT user_id, ts,
                   ts + CASE WHEN event_type = 'purchase'
                             THEN INTERVAL 40 MINUTE
                             ELSE INTERVAL 15 MINUTE END AS te
            FROM events
        ),
        m AS (
            SELECT user_id, ts, te,
                   MAX(te) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS prev_end
            FROM iv
        ),
        numbered AS (
            SELECT user_id, ts, te,
                   SUM(CASE WHEN prev_end IS NULL OR ts > prev_end
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM m
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(te) AS session_end,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def stream_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC per-event gap (Spark's
    ``session_window(ts, gapColumn)``): a purchase keeps its session open
    40 minutes, any other event 15 — the engagement-dependent session
    definition fixed-gap sessions can't express. The oracle is the
    interval-merge formulation: each event spans [ts, ts+gap), a new
    session starts when ts exceeds the running MAX of previous interval
    ends (a plain running max — later rows can't extend a session past an
    earlier long interval unseen by last-value logic).

    Scale shape: identical to the fixed-gap operator — one user-keyed
    shuffle, per-key interval merge inside Spark's session aggregation;
    the gap expression is a per-row projection. Works unchanged as a
    streaming groupBy on a watermarked source (the stream_live_session
    harness shape).
    """
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("40 minutes")
    ).otherwise(F.lit("15 minutes"))
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance: merge yesterday's materialized
# per-user rollup with today's delta instead of rescanning history — the
# warehouse pattern every nightly pipeline runs on. The oracle is the
# from-scratch aggregate; decimal partial sums merge associatively, so
# maintained == recomputed exactly.
# ---------------------------------------------------------------------------


@query(
    "agg_incremental_refresh",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id
    """,
    tags=("agg", "incremental"),
)
def agg_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh of a per-user rollup: the 'materialized' base
    aggregate (events before day 21) is MERGED with the late-arriving
    delta aggregate (day 21 onward) via a full-outer coalesce — the
    nightly-pipeline shape that never rescans history. The oracle
    recomputes from scratch; decimal partial sums are associative, so
    the merged result matches bit-for-bit.

    Scale shape: the delta aggregate scans ONLY the new partition(s);
    the merge joins two user-keyed aggregate tables (both far smaller
    than the fact table; at 100 TB the base side is the stored rollup,
    not a scan). count/sum/min/max all merge this way — avg and variance
    derive from merged (n, sum, sum2) power sums; exact percentiles are
    the one family that cannot merge and falls back to sketches.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.dayofmonth("ts") <= 20
    base = ev.filter(cutoff).groupBy("user_id").agg(
        F.count("*").alias("n_b"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s_b"),
    )
    delta = ev.filter(~cutoff).groupBy("user_id").agg(
        F.count("*").alias("n_d"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s_d"),
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        base.join(delta, "user_id", "full_outer")
        .select(
            "user_id",
            (
                F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0))
            ).cast("bigint").alias("n_events"),
            (
                F.coalesce("s_b", zero) + F.coalesce("s_d", zero)
            ).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# SQL CACHE TABLE surface: materialize a rollup in executor memory and
# serve follow-up queries from the InMemoryRelation.
# ---------------------------------------------------------------------------


@query(
    "sql_cache_table",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                     AS revenue
            FROM orders GROUP BY o_custkey
        )
        SELECT CAST(o_custkey AS BIGINT) AS custkey, n_orders, revenue
        FROM rev WHERE n_orders >= 10
    """,
    tags=("sql", "cache", "engine4"),
)
def sql_cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`CACHE TABLE ... AS SELECT`: materialize a per-customer revenue
    rollup in executor memory (the interactive-analytics idiom for a hot
    intermediate) and serve the follow-up filter from the
    InMemoryRelation instead of re-aggregating the fact table
    (tests/test_plans.py pins the InMemoryTableScan).

    Scale shape: the cached relation is aggregate-sized (|customers|
    rows, columnar, partition-distributed across executors); follow-ups
    prune columns and push filters against the in-memory batches. The
    cache is storage-level MEMORY_AND_DISK — partitions that don't fit
    spill rather than evict correctness.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_src")
    spark.sql("UNCACHE TABLE IF EXISTS _cached_cust_rev")
    spark.sql("DROP VIEW IF EXISTS _cached_cust_rev")
    spark.sql(
        """
        CACHE TABLE _cached_cust_rev AS
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS revenue
        FROM _orders_src GROUP BY o_custkey
        """
    )
    return spark.sql(
        """
        SELECT CAST(o_custkey AS BIGINT) AS custkey, n_orders, revenue
        FROM _cached_cust_rev WHERE n_orders >= 10
        """
    )


# ---------------------------------------------------------------------------
# Time-interval RANGE frames: trailing 1-hour per-user rolling aggregates
# ordered by timestamp — the numeric-RANGE sibling (win_range_frame) can't
# express calendar-width windows.
# ---------------------------------------------------------------------------


@query(
    "win_time_range_frame",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 AS sum_1h
        FROM events
        WHERE user_id < 40
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                              AND CURRENT ROW)
    """,
    tags=("window", "timeseries"),
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling count and decimal-exact sum per user: a
    RANGE frame bounded by a calendar INTERVAL over the timestamp
    ordering — the rate-limiter / rolling-exposure window that a numeric
    RANGE frame cannot express. Ties on ts are peers and enter the frame
    together on both engines (RANGE semantics), and the sum is a decimal
    set-aggregate, so the result is order-independent and bit-exact.

    Scale shape: one user-keyed window (sort bounded by events-per-user);
    the interval frame is evaluated by frame-pointer advance inside the
    sorted partition — linear, no self-join re-scan per row. The classic
    upgrade at extreme per-key volume is pre-bucketing to (user, hour)
    partials plus an exact patch of the boundary hour.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    ev.createOrReplaceTempView("_tr_events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 AS sum_1h
        FROM _tr_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                              AND CURRENT ROW)
        """
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time join: facts pick the dimension VERSION whose validity
# window contains the fact date — the correctness core of every versioned
# warehouse join.
# ---------------------------------------------------------------------------

_SCD2_DIM_SQL = """
    SELECT c_custkey, c_mktsegment, 'v1' AS version,
           TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
           CASE WHEN c_custkey % 3 = 0
                THEN TIMESTAMP '1995-06-01 00:00:00' END AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey, 'MIGRATED' AS c_mktsegment, 'v2' AS version,
           TIMESTAMP '1995-06-01 00:00:00' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM customer WHERE c_custkey % 3 = 0
"""


@query(
    "join_scd2_point_in_time",
    oracle=f"""
        WITH dim AS ({_SCD2_DIM_SQL})
        SELECT d.version, d.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS revenue
        FROM orders o
        JOIN dim d
          ON o.o_custkey = d.c_custkey
         AND o.o_orderdate >= d.valid_from
         AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
        GROUP BY d.version, d.c_mktsegment
    """,
    tags=("join", "scd2", "warehouse"),
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against an SCD2-versioned dimension: every
    order joins the customer VERSION whose [valid_from, valid_to)
    window contains the order date (open-ended current versions via
    NULL valid_to) — the correctness core of versioned-warehouse joins
    that a naive latest-version join silently gets wrong. The versioned
    dimension is derived deterministically (keys %3==0 migrate segments
    mid-1995), mirrored verbatim in the oracle.

    Scale shape: an equi hash join on the customer key with the validity
    window as a residual filter — versions-per-key is small (2 here), so
    the residual scan per probe row is bounded; the dimension broadcasts
    while it fits. The aggregate rides the join's output with map-side
    partials.
    """
    c = load_table(spark, sf_dir, "customer")
    t_from = F.lit("1990-01-01 00:00:00").cast("timestamp")
    t_mig = F.lit("1995-06-01 00:00:00").cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")
    migrated = F.col("c_custkey") % 3 == 0
    v1 = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("v1").alias("version"),
        t_from.alias("valid_from"),
        F.when(migrated, t_mig).otherwise(null_ts).alias("valid_to"),
    )
    v2 = c.filter(migrated).select(
        "c_custkey",
        F.lit("MIGRATED").alias("c_mktsegment"),
        F.lit("v2").alias("version"),
        t_mig.alias("valid_from"),
        null_ts.alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    o = load_table(spark, sf_dir, "orders")
    j = o.join(
        F.broadcast(dim),
        (o["o_custkey"] == dim["c_custkey"])
        & (o["o_orderdate"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (o["o_orderdate"] < dim["valid_to"])),
    )
    return j.groupBy("version", F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Null-aware NOT IN: the classic three-valued-logic trap — one NULL in the
# subquery empties the whole NOT IN result. Compiles to Spark's null-aware
# anti join.
# ---------------------------------------------------------------------------


@query(
    "sql_not_in_null_aware",
    oracle="""
        SELECT 'clean_set' AS variant, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_custkey NOT IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        UNION ALL
        SELECT 'null_in_set', CAST(COUNT(*) AS BIGINT)
        FROM orders
        WHERE o_custkey NOT IN (
            SELECT NULLIF(c_custkey % 50, 0)
            FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    tags=("sql", "null-semantics", "subquery"),
)
def sql_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under three-valued logic: against a NULL-free subquery it
    behaves like an anti join (clean_set counts the non-BUILDING-customer
    orders); one NULL in the subquery makes every ``x NOT IN set``
    UNKNOWN, so null_in_set is 0 — the SQL trap that silently empties
    reports when a dimension key goes nullable. Spark compiles the
    nullable branch to a NULL-AWARE anti join; both engines implement
    the same standard semantics.

    Scale shape: the clean branch is a plain hash LeftAnti on the key;
    the null-aware branch degrades to a broadcast nested-loop ONLY when
    the build side might hold a NULL — which is why production models
    prefer NOT EXISTS (null-free by construction, always hash-joinable).
    That trade-off is the documentation this query exists to pin.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o.createOrReplaceTempView("_nin_orders")
    c.createOrReplaceTempView("_nin_customer")
    return spark.sql(
        """
        SELECT 'clean_set' AS variant, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM _nin_orders
        WHERE o_custkey NOT IN (
            SELECT c_custkey FROM _nin_customer
            WHERE c_mktsegment = 'BUILDING')
        UNION ALL
        SELECT 'null_in_set', CAST(COUNT(*) AS BIGINT)
        FROM _nin_orders
        WHERE o_custkey NOT IN (
            SELECT NULLIF(c_custkey % 50, 0)
            FROM _nin_customer WHERE c_mktsegment = 'BUILDING')
        """
    )


# ---------------------------------------------------------------------------
# Windowed multi-stage funnel: each stage must occur within 7 days of the
# PREVIOUS stage's first completion — the bounded-conversion semantics
# the unbounded funnel (events_funnel_conversion) can't express.
# ---------------------------------------------------------------------------


@query(
    "events_funnel_windowed",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click'
              AND e.ts > v.t_view
              AND e.ts <= v.t_view + INTERVAL 7 DAY
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase'
              AND e.ts > c.t_click
              AND e.ts <= c.t_click + INTERVAL 7 DAY
            GROUP BY e.user_id
        )
        SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
               CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_7d,
               CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_7d
    """,
    tags=("events", "funnel"),
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded view→click→purchase funnel: each stage counts only
    when it happens within 7 days AFTER the user's first completion of
    the previous stage — the windowed-conversion semantics product
    analytics actually reports (the unbounded funnel overcounts users
    who convert months later).

    Scale shape: three user-keyed conditional MIN aggregates chained by
    joins on user_id — every join key is the same, so the whole funnel
    re-uses ONE hash partitioning; stage tables shrink monotonically.
    Deep funnels extend the chain; the cross-stage deadline is a per-row
    predicate, never a pair join.
    """
    ev = load_table(spark, sf_dir, "events")
    week = F.expr("INTERVAL 7 DAY")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + week)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + week)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_7d")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_7d")))
    )
