"""Round-6 analytics extensions: graph metrics, exact time-series ops,
Gopher-style quality gating, RAG chunking, and the DataFrame stat surface.

All [EXT] surface beyond the reference's replication dataflow
(ReplicationApplication.java:71 is its only transform) — these are the
operations a training-data / analytics user reaches for next once the
relational + dedup legs exist. Every query here is oracle-checked against
DuckDB; scale notes per query docstring.

"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..catalog import load_table
from . import query

# ---------------------------------------------------------------------------
# Graph metrics over the co-supply graph: suppliers are linked when they
# co-supply the same order (bounded per-order fan-out — an order has ~4
# lineitems, so pair generation is per-order C(k,2), never a global product).
# The l_quantity filter keeps the graph sparse at every SF (measured:
# 375 edges/102 triangles at sf0.01, 4.3k/445 at sf0.1).
# ---------------------------------------------------------------------------

_COSUPPLY_SQL = """
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    WHERE a.l_quantity <= 3 AND b.l_quantity <= 3
    GROUP BY 1, 2
"""


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-supply edges, oriented s1 < s2.

    Scale shape: the self-join is keyed on l_orderkey (sort-merge on the
    fact key, per-key fan-out bounded by lineitems-per-order), then one
    distinct. No global pair enumeration anywhere.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 3)
        .select("l_orderkey", "l_suppkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2")
        )
        .distinct()
    )


@query(
    "graph_degree_stats",
    oracle=f"""
        WITH edges AS ({_COSUPPLY_SQL}),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT s1 AS node FROM edges
                  UNION ALL SELECT s2 AS node FROM edges)
            GROUP BY node
        )
        SELECT degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(node) AS BIGINT) AS min_node
        FROM deg GROUP BY degree
    """,
    tags=("graph", "agg"),
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-supply graph: union both edge
    endpoints, count per node, histogram per degree.

    Scale shape: edge build is order-keyed (see _cosupply_edges); the
    degree count is one node-keyed aggregate with map-side partials and
    the histogram a second, smaller one. Both shuffles carry 2 scalars.
    """
    e = _cosupply_edges(spark, sf_dir)
    deg = (
        e.select(F.col("s1").alias("node"))
        .unionAll(e.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count("*").alias("n_nodes"),
        F.min("node").cast("bigint").alias("min_node"),
    )


@query(
    "graph_triangle_count",
    oracle=f"""
        WITH edges AS ({_COSUPPLY_SQL}),
        tri AS (
            SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
            FROM edges e1
            JOIN edges e2 ON e1.s2 = e2.s1
            JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS n_apex_nodes,
               CAST(MIN(a * 1000000 + b * 1000 + c) AS BIGINT) AS min_triangle_id
        FROM tri
    """,
    tags=("graph", "join"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting over the co-supply graph — the classic
    distributed-graph benchmark (clustering-coefficient numerator).

    Scale shape: edges are ORIENTED low-id -> high-id, so each triangle
    {a<b<c} is generated exactly once as the wedge (a-b, b-c) closed by
    (a-c) — the standard orientation trick that bounds wedge fan-out by
    the (out-)degree instead of enumerating each triangle 6×. Both joins
    are keyed equi-joins on node ids; at 100 TB the production upgrade is
    degree-based orientation (orient toward the HIGHER-degree endpoint)
    which caps wedge count at O(m^1.5) regardless of skew — id-based
    orientation is the same dataflow with a different comparator. No
    driver-side state; the result is a 1-row aggregate.
    """
    e = _cosupply_edges(spark, sf_dir).localCheckpoint(eager=True)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e3.s1") == F.col("e1.s1"))
            & (F.col("e3.s2") == F.col("e2.s2")),
        )
        .select(
            F.col("e1.s1").alias("a"),
            F.col("e1.s2").alias("b"),
            F.col("e2.s2").alias("c"),
        )
    )
    return tri.agg(
        F.count("*").cast("bigint").alias("n_triangles"),
        F.countDistinct("a").cast("bigint").alias("n_apex_nodes"),
        F.min(
            F.col("a") * F.lit(1000000) + F.col("b") * F.lit(1000) + F.col("c")
        )
        .cast("bigint")
        .alias("min_triangle_id"),
    )


@query(
    "graph_clustering_coefficient",
    oracle=f"""
        WITH edges AS ({_COSUPPLY_SQL}),
        deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT s1 AS node FROM edges
                  UNION ALL SELECT s2 AS node FROM edges)
            GROUP BY node
        ),
        tri AS (
            SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
            FROM edges e1
            JOIN edges e2 ON e1.s2 = e2.s1
            JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
        ),
        tn AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM (SELECT a AS node FROM tri
                  UNION ALL SELECT b AS node FROM tri
                  UNION ALL SELECT c AS node FROM tri)
            GROUP BY node
        )
        SELECT deg.node, deg.degree,
               COALESCE(tn.n_triangles, 0) AS n_triangles,
               CASE WHEN deg.degree > 1
                    THEN CAST(2 * COALESCE(tn.n_triangles, 0) AS DOUBLE)
                         / (deg.degree * (deg.degree - 1))
                    ELSE 0.0 END AS clustering_coeff
        FROM deg LEFT JOIN tn USING (node)
    """,
    tags=("graph", "join"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the co-supply graph:
    2·triangles(v) / (deg(v)·(deg(v)−1)), the closed-wedge fraction — how
    clique-like each supplier's neighborhood is.

    Scale shape: shares graph_triangle_count's oriented wedge-close
    enumeration (each triangle emitted once, then attributed to its three
    corners by a 3-way unionAll — columns only, no re-join against
    edges), plus the degree aggregate; the final join is node-keyed with
    the triangle side far smaller than the node side. The coefficient is
    a ratio of exact integers computed identically in both engines.
    """
    e = _cosupply_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("s1").alias("node"))
        .unionAll(e.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e3.s1") == F.col("e1.s1"))
            & (F.col("e3.s2") == F.col("e2.s2")),
        )
        .select(
            F.col("e1.s1").alias("a"),
            F.col("e1.s2").alias("b"),
            F.col("e2.s2").alias("c"),
        )
    )
    tn = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    j = deg.join(tn, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
    )
    return j.withColumn(
        "clustering_coeff",
        F.when(
            F.col("degree") > 1,
            (2 * F.col("n_triangles")).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)),
        ).otherwise(F.lit(0.0)),
    )


# ---------------------------------------------------------------------------
# Exact time-series operators over the events stream.
# ---------------------------------------------------------------------------


@query(
    "ts_ewma_per_user",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   list(value ORDER BY ts, event_id) AS vals
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(len(vals) AS BIGINT) AS n_points,
               CAST(list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc)
                    AS DOUBLE) AS ewma,
               CAST(vals[len(vals)] AS DOUBLE) AS last_value
        FROM s
    """,
    tags=("timeseries", "agg"),
)
def ts_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 0.2) of purchase
    values per user — the smoothing op behind monitoring dashboards and
    feature pipelines. EWMA is a sequential recurrence, so it is computed
    as a LEFT FOLD over the time-ordered value list: Spark's
    ``F.aggregate`` and DuckDB's ``list_reduce`` both seed with the first
    element and fold in list order with identical IEEE double ops, making
    the comparison bit-exact with no rounding escape hatch.

    Scale shape: one user-keyed aggregate; the per-key series is bounded
    (events-per-user is capped by product reality — here ≤99; an
    unbounded-series deployment switches to the truncated-window form
    where weights below 1e-12 are dropped, same fold). The sort is
    per-group ``sort_array`` on (ts, event_id, value) structs —
    deterministic tie-break via the unique event_id, no global sort.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    g = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    n = F.size("vals")
    return g.select(
        "user_id",
        n.cast("bigint").alias("n_points"),
        F.aggregate(
            F.slice("vals", 2, F.greatest(n - 1, F.lit(0))),
            F.element_at("vals", 1),
            lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
        ).alias("ewma"),
        F.element_at("vals", -1).alias("last_value"),
    )


@query(
    "ts_zscore_anomaly",
    oracle=f"""
        WITH stats AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(*) AS mu,
                   sqrt(
                     CAST(SUM(CAST(value * value AS DECIMAL(24,6))) AS DOUBLE)
                       / COUNT(*)
                     - (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                          / COUNT(*))
                       * (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                          / COUNT(*))
                   ) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(count_if(abs((value - mu) / sigma) > 2.0) AS BIGINT)
                 AS n_anomalies,
               CAST(MIN(CASE WHEN abs((value - mu) / sigma) > 2.0
                             THEN event_id END) AS BIGINT) AS first_anomaly_id
        FROM events e JOIN stats USING (event_type)
        GROUP BY e.event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: per event_type mean/std from
    decimal-exact sums (order-independent, so mu/sigma are bit-identical
    across engines), then flag rows with |z| > 2 and count per type.

    Scale shape: two passes over events — a per-type 3-scalar aggregate
    that rides back as a BROADCAST relation, then one map-side flag +
    aggregate. No window, no sort; the stats table is |event_types| rows.
    At 100 TB both passes are map-side-combined shuffles carrying a few
    scalars per type.
    """
    ev = load_table(spark, sf_dir, "events")
    cnt = F.count("*")
    mu = F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / cnt
    ex2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(24,6)")).cast(
            "double"
        )
        / cnt
    )
    stats = ev.groupBy("event_type").agg(
        mu.alias("mu"), F.sqrt(ex2 - mu * mu).alias("sigma")
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count_if(z > 2.0).cast("bigint").alias("n_anomalies"),
            F.min(F.when(z > 2.0, F.col("event_id")))
            .cast("bigint")
            .alias("first_anomaly_id"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality gate + RAG chunking over documents.
# ---------------------------------------------------------------------------


@query(
    "text_gopher_quality_gate",
    oracle="""
        WITH w AS (
            SELECT doc_id, source,
                   string_split_regex(lower(text), '\\s+') AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id, source,
                   len(toks) AS n_words,
                   CAST(list_aggregate(list_transform(toks, t -> length(t)),
                                       'sum') AS DOUBLE) / len(toks)
                     AS mean_word_len,
                   CAST(len(list_filter(toks,
                                        t -> t = 'the' OR t = 'a'))
                        AS DOUBLE) / len(toks) AS stop_ratio,
                   (SELECT MAX(c) FROM (
                        SELECT COUNT(*) AS c FROM unnest(toks) AS u(t)
                        GROUP BY t)) AS top_word_count
            FROM w
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(count_if(
                    n_words BETWEEN 20 AND 1000
                    AND mean_word_len BETWEEN 2.0 AND 10.0
                    AND stop_ratio >= 0.02
                    AND CAST(top_word_count AS DOUBLE) / n_words <= 0.20
               ) AS BIGINT) AS n_kept,
               CAST(count_if(n_words NOT BETWEEN 20 AND 1000) AS BIGINT)
                 AS n_len_fail,
               CAST(count_if(CAST(top_word_count AS DOUBLE) / n_words > 0.20)
                    AS BIGINT) AS n_repetition_fail
        FROM m GROUP BY source
    """,
    tags=("llm", "text"),
)
def text_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate (Rae et al. 2021 §A1.1 shape): word-count
    bounds, mean-word-length band, stopword floor, and a
    most-frequent-word repetition cap, rolled up to kept/dropped counts
    per source with per-rule failure attribution.

    Scale shape: pure per-row column expressions — tokenization and all
    four rules run inside whole-stage codegen via array HOFs
    (aggregate/filter over the token array; the top-word count folds a
    sorted copy of the tokens in one pass, no explode, no join), then one
    source-keyed aggregate. The only shuffle carries 4 counters per
    source.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    d = d.select("doc_id", "source", toks.alias("toks"))
    n_words = F.size("toks")
    mean_word_len = (
        F.aggregate(
            "toks", F.lit(0), lambda a, t: a + F.length(t)
        ).cast("double")
        / n_words
    )
    stop_ratio = (
        F.size(F.filter("toks", lambda t: (t == "the") | (t == "a"))).cast(
            "double"
        )
        / n_words
    )
    # Most-frequent-word count without explode: fold the SORTED token
    # array tracking (previous token, current run, best run).
    sorted_toks = F.sort_array("toks")
    top_word_count = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    m = d.select(
        "source",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        top_word_count.alias("top_word_count"),
    )
    len_ok = F.col("n_words").between(20, 1000)
    rep_fail = F.col("top_word_count").cast("double") / F.col("n_words") > 0.20
    keep = (
        len_ok
        & F.col("mean_word_len").between(2.0, 10.0)
        & (F.col("stop_ratio") >= 0.02)
        & ~rep_fail
    )
    return m.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_if(keep).cast("bigint").alias("n_kept"),
        F.count_if(~len_ok).cast("bigint").alias("n_len_fail"),
        F.count_if(rep_fail).cast("bigint").alias("n_repetition_fail"),
    )


@query(
    "rag_chunk_overlap",
    oracle="""
        WITH g AS (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0, GREATEST(length(text) - 51, 0), 150)) AS s
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   CAST(s AS INTEGER) AS chunk_start,
                   substr(text, CAST(s AS INTEGER) + 1, 200) AS chunk
            FROM g
        )
        SELECT doc_id,
               chunk_start,
               CAST(length(chunk) AS INTEGER) AS chunk_len,
               md5(chunk) AS chunk_md5
        FROM c
    """,
    tags=("llm", "rag"),
)
def rag_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character-window chunking (size 200, stride 150 — 50
    chars of overlap), the retrieval / context-window prep step of a RAG
    or training pipeline: start offsets via ``sequence``, one chunk row
    per offset via ``explode``, chunk text by ``substring``, identity by
    md5. Trailing windows shorter than the overlap (<51 chars) are not
    started — every character still lands in ≥1 chunk because stride <
    size.

    Scale shape: per-row generate + explode, zero shuffles (the plan is
    scan → project → generate); output size is a fixed ~1.33× of input
    chars. The md5 gives chunk-level identity for downstream exact dedup
    without carrying chunk text through a shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 51, F.lit(0)),
        F.lit(150),
    )
    return (
        d.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.substring(
                F.col("text"), F.col("chunk_start") + 1, 200
            ).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_start",
            F.length("chunk").cast("int").alias("chunk_len"),
            F.md5("chunk").alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# DataFrame stat surface + interval-overlap self-join.
# ---------------------------------------------------------------------------


@query(
    "stat_crosstab",
    oracle="""
        SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
               CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS F,
               CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS O,
               CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS P
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("stat", "agg"),
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.crosstab`` — the contingency-table entry point of the
    DataFrameStatFunctions surface. Column names come from the distinct
    values of the second column (here order status F/O/P — a fixed,
    bounded domain), mirroring the oracle's count_if pivot.

    Scale shape: crosstab is a pivot — one aggregate keyed by the pair,
    then a bounded-width reshape; safe while the pivoted domain is
    bounded (3 statuses). Unbounded domains belong in the long-form
    groupBy, not crosstab.
    """
    o = load_table(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderpriority", "o_orderstatus")
    return ct.select(
        "o_orderpriority_o_orderstatus",
        *[F.col(c).cast("bigint").alias(c) for c in ("F", "O", "P")],
    )


@query(
    "join_interval_overlap",
    oracle="""
        SELECT a.o_custkey AS custkey,
               CAST(COUNT(*) AS BIGINT) AS n_overlaps,
               CAST(MIN(a.o_orderkey * 10000000 + b.o_orderkey) AS BIGINT)
                 AS min_pair_id
        FROM orders a JOIN orders b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey < b.o_orderkey
         AND a.o_orderdate < b.o_orderdate + INTERVAL 7 DAY
         AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
        GROUP BY a.o_custkey
    """,
    tags=("join", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: each order opens a 7-day activity
    window; per customer, count pairs of their own orders whose windows
    overlap (the burst-detection primitive). Two intervals [s,s+7) and
    [t,t+7) overlap iff s < t+7 AND t < s+7.

    Scale shape: the join is EQUI-keyed on o_custkey — the interval
    predicate is a post-join filter inside each key group, so fan-out is
    bounded by orders-per-customer (~10), never a global interval
    product. A keyless interval join at 100 TB gets the banding
    treatment instead (join_range_bands' pattern: bucket by
    floor(date/7d), join on same-or-adjacent band, re-filter exactly).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    a = o.alias("a")
    b = o.alias("b")
    seven = F.expr("INTERVAL 7 DAYS")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.o_orderdate") < F.col("b.o_orderdate") + seven)
            & (F.col("b.o_orderdate") < F.col("a.o_orderdate") + seven),
        )
        .groupBy(F.col("a.o_custkey").alias("custkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_overlaps"),
            F.min(
                F.col("a.o_orderkey") * F.lit(10000000)
                + F.col("b.o_orderkey")
            )
            .cast("bigint")
            .alias("min_pair_id"),
        )
    )


# ---------------------------------------------------------------------------
# Second-order smoothing, robust anomalies, and weighted sampling.
# ---------------------------------------------------------------------------


@query(
    "ts_holt_linear",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
            FROM events
            WHERE event_type = 'view'
            GROUP BY user_id
            HAVING COUNT(*) >= 2
        ),
        f AS (
            SELECT user_id, len(vals) AS n_points,
                   -- DuckDB list_reduce has no init arg: the seed rides
                   -- as element 1 (acc starts there) and the fold
                   -- consumes elements 2..n. State is a DOUBLE[3] of
                   -- [x, level, trend] — NOT a struct: DuckDB 1.0
                   -- evaluates struct-literal lambda fields sequentially
                   -- over an in-place accumulator (a.l in the trend
                   -- field would see the CURRENT step's level); list
                   -- literals evaluate functionally.
                   list_reduce(
                     list_prepend(
                       [vals[2], vals[2], vals[2] - vals[1]],
                       list_transform(vals[3:], x ->
                         [CAST(x AS DOUBLE), 0.0::DOUBLE, 0.0::DOUBLE])),
                     (a, e) -> [e[1],
                                0.5::DOUBLE * e[1]
                                  + 0.5::DOUBLE * (a[2] + a[3]),
                                0.3::DOUBLE
                                    * ((0.5::DOUBLE * e[1]
                                        + 0.5::DOUBLE * (a[2] + a[3]))
                                       - a[2])
                                  + 0.7::DOUBLE * a[3]]) AS st
            FROM s
        )
        SELECT user_id, CAST(n_points AS BIGINT) AS n_points,
               CAST(st[2] AS DOUBLE) AS level,
               CAST(st[3] AS DOUBLE) AS trend,
               CAST(st[2] + st[3] AS DOUBLE) AS forecast_1
        FROM f
    """,
    tags=("timeseries", "agg"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level+trend, alpha=0.5,
    beta=0.3) per user over view values — the trend-aware cousin of
    ts_ewma_per_user, seeded with l₂=x₂, b₂=x₂−x₁ and folded over x₃…xₙ.
    A struct-typed LEFT FOLD: Spark ``F.aggregate`` with a (l, b) struct
    accumulator vs DuckDB ``list_reduce`` over a struct-wrapped list
    (its accumulator must share the element type, so each xᵢ is wrapped
    as {x, l, b} and the lambda threads l/b through) — same seed, same
    fold order, same IEEE double ops, bit-exact with no rounding.

    Scale shape: identical to ts_ewma_per_user — one user-keyed
    aggregate over a bounded per-key series, sort_array for the
    deterministic in-group order, no global sort.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    g = (
        ev.groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ),
                lambda s: s["value"],
            ).alias("vals")
        )
        .filter(F.size("vals") >= 2)
    )
    x1 = F.element_at("vals", 1)
    x2 = F.element_at("vals", 2)
    n = F.size("vals")
    st = F.aggregate(
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
    return g.select(
        "user_id",
        n.cast("bigint").alias("n_points"),
        st["l"].alias("level"),
        st["b"].alias("trend"),
        (st["l"] + st["b"]).alias("forecast_1"),
    )


@query(
    "ts_mad_anomaly",
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS m
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.event_id, e.value, med.m,
                   abs(e.value - med.m) AS d
            FROM events e JOIN med USING (event_type)
        ),
        mad AS (
            SELECT event_type, quantile_cont(d, 0.5) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT dev.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ANY_VALUE(dev.m) AS DOUBLE) AS median_value,
               CAST(ANY_VALUE(mad.mad) AS DOUBLE) AS mad,
               CAST(count_if(dev.d > 3.0 * 1.4826 * mad.mad) AS BIGINT)
                 AS n_anomalies
        FROM dev JOIN mad USING (event_type)
        GROUP BY dev.event_type
    """,
    tags=("timeseries", "stats"),
)
def ts_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection — the robust
    alternative to ts_zscore_anomaly (a single wild value cannot move the
    threshold): per event_type, m = median(value), MAD = median(|v−m|),
    flag |v−m| > 3·1.4826·MAD.

    Scale shape: BOTH medians run through the grouped two-phase
    bucket-rank exact percentile (`_exact_percentiles_grouped` — no
    per-group all-values buffer anywhere), each riding back as a
    broadcast |event_types|-row relation; the flag pass is one map-side
    aggregate. The interpolated medians are bit-identical to DuckDB's
    quantile_cont (fuzz-pinned), and every downstream comparison uses
    those exact doubles.
    """
    from .aggregates import _exact_percentiles_grouped

    ev = load_table(spark, sf_dir, "events")
    med = _exact_percentiles_grouped(spark, ev, "event_type", "value", {"m": 0.5})
    dev = (
        ev.select("event_type", "event_id", "value")
        .join(F.broadcast(med), "event_type")
        .withColumn("d", F.abs(F.col("value") - F.col("m")))
        # The MAD stage consumes dev from several plan branches (stats,
        # bucket counts, target-bucket ranking, final flag pass), and
        # dev's own lineage embeds the ENTIRE first percentile pass —
        # without a materialization barrier the nested plan re-runs that
        # pass once per branch (measured 7.0 s vs 2.9 s at sf0.1).
        .localCheckpoint(eager=True)
    )
    mad = _exact_percentiles_grouped(spark, dev, "event_type", "d", {"mad": 0.5})
    thr = F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.first("m").alias("median_value"),
            F.first("mad").alias("mad"),
            F.count_if(F.col("d") > thr).cast("bigint").alias("n_anomalies"),
        )
    )


@query(
    "sample_weighted_priority",
    oracle="""
        WITH u AS (
            SELECT doc_id, lang, n_chars,
                   (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                         AS BIGINT) + 1)
                     / 281474976710657.0 AS unif
            FROM documents
        ),
        p AS (
            SELECT doc_id, lang, n_chars,
                   ln(unif) / n_chars AS priority,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY ln(unif) / n_chars DESC, doc_id) AS rk
            FROM u
        )
        SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM p WHERE rk <= 10
    """,
    tags=("llm", "sampling"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=10 per language, weight =
    n_chars (Efraimidis–Spirakis priority sampling: keep the top-k rows
    by u^(1/w), ranked here via the monotone-equivalent ln(u)/w).
    Longer documents are proportionally more likely to be picked, and —
    unlike rand()-based sampling — membership is a pure function of the
    data: u comes from a 12-hex-digit md5 prefix mapped to (0,1]
    identically in both engines (Spark ``conv(hex,16,10)``, DuckDB
    ``CAST('0x…' AS BIGINT)``), so the sample is reproducible across
    runs, engines, and repartitioning.

    Scale shape: priority is a per-row expression; selection is a
    per-stratum top-k window (rank only, no global sort). At 100 TB the
    window input prunes first via a per-stratum approximate priority
    threshold (the sample_reservoir_per_group note) so each stratum
    window sees ~k candidates rather than the full corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    unif = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        + 1
    ) / F.lit(281474976710657.0)
    pri = F.log(unif) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(F.desc_nulls_last(pri), "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", pri.alias("_pri"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    )


@query(
    "graph_label_propagation",
    tags=("graph", "iterative", "rows-only"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the co-supply graph: 5 rounds of
    deterministic synchronous label propagation (operators/labelprop.py
    — most-frequent neighbor label, ties to the smaller id), then
    community accounting: one row per community with size and id span.

    Rows-only (iterative; no SQL twin): tests/test_graph_ts.py pins the
    invariants — every node labeled, labels are node ids, a clique
    collapses to one community, two runs agree bit-for-bit, and
    label(v) is reachable from v.

    Scale shape: per-round node-keyed join + two partial-aggregated
    groupBys over the pre-partitioned symmetrized edge list; the
    accounting is one more label-keyed aggregate. No driver data.
    """
    from ..operators.labelprop import label_propagation

    labels = label_propagation(spark, _cosupply_edges(spark, sf_dir), iters=5)
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("community_size"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .orderBy(F.desc("community_size"), F.asc("label"))
        .limit(50)
    )


@query(
    "ts_cusum_drift",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(*) AS avg_v
            FROM events GROUP BY 1, 2
        ),
        vals AS (
            SELECT event_type,
                   list(avg_v ORDER BY day) AS vs,
                   COUNT(*) AS n_days
            FROM daily GROUP BY event_type
        ),
        s AS (
            -- mu as a day-ordered left-fold sum over doubles: the SAME
            -- IEEE addition order as the Spark side (decimal casts here
            -- would ROUND and the engines round half-up vs half-even).
            SELECT event_type, n_days,
                   list_transform(
                     vs,
                     x -> x - list_reduce(vs, (a, b) -> a + b)
                              / CAST(n_days AS DOUBLE)
                          - 0.5::DOUBLE) AS devs
            FROM vals
        ),
        f AS (
            SELECT event_type, n_days,
                   list_reduce(
                     list_prepend(
                       [GREATEST(0.0::DOUBLE, devs[1]),
                        GREATEST(0.0::DOUBLE, devs[1])],
                       list_transform(devs[2:], x ->
                         [CAST(x AS DOUBLE), 0.0::DOUBLE])),
                     (a, e) -> [GREATEST(0.0::DOUBLE, a[1] + e[1]),
                                GREATEST(a[2],
                                         GREATEST(0.0::DOUBLE,
                                                  a[1] + e[1]))]) AS st
            FROM s
        )
        SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
               CAST(st[1] AS DOUBLE) AS cusum_final,
               CAST(st[2] AS DOUBLE) AS cusum_max
        FROM f
    """,
    tags=("timeseries", "agg"),
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per event type (Page 1954 shape):
    daily mean values (decimal-exact, so the series is bit-identical
    across engines), centered on the type's mean-of-dailies minus a 0.5
    slack, then the recurrence S_t = max(0, S_{t-1} + dev_t) folded over
    the day-ordered series, tracking the running max (the drift alarm
    statistic). State is a [S, maxS] pair — the ts_holt_linear
    DOUBLE[2]-fold pattern on both engines, bit-exact.

    Scale shape: events collapse to a (type, day) aggregate first — the
    fold runs on the DAILY series (365 points/year/type regardless of
    event volume), so the per-key array is calendar-bounded, not
    data-bounded. Two partial-aggregated shuffles + one tiny fold.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("avg_v")
    )
    # mu per type as a day-ordered left-fold sum (0.0 + v1 + v2 + ... is
    # bit-identical to DuckDB's list_reduce fold: 0.0 + v1 == v1 in IEEE),
    # so no decimal rounding of the daily doubles is needed anywhere.
    vals = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "avg_v"))),
            lambda r: r["avg_v"],
        ).alias("vs")
    )
    mu = F.aggregate("vs", F.lit(0.0), lambda a, x: a + x) / F.size(
        "vs"
    ).cast("double")
    s = vals.select(
        "event_type",
        F.transform("vs", lambda x: x - mu - F.lit(0.5)).alias("devs"),
    )
    first = F.greatest(F.lit(0.0), F.element_at("devs", 1))
    st = F.aggregate(
        F.slice("devs", 2, F.greatest(F.size("devs") - 1, F.lit(0))),
        F.struct(first.alias("s"), first.alias("mx")),
        lambda a, x: F.struct(
            F.greatest(F.lit(0.0), a["s"] + x).alias("s"),
            F.greatest(a["mx"], F.greatest(F.lit(0.0), a["s"] + x)).alias(
                "mx"
            ),
        ),
    )
    return s.select(
        "event_type",
        F.size("devs").cast("bigint").alias("n_days"),
        st["s"].alias("cusum_final"),
        st["mx"].alias("cusum_max"),
    )


@query(
    "ts_seasonal_baseline",
    oracle="""
        WITH base AS (
            SELECT event_type, dayofweek(ts) + 1 AS dow, value
            FROM events
        ),
        season AS (
            SELECT event_type, dow,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
                   CAST(SUM(CAST(value * value AS DECIMAL(24,6)))
                        AS DOUBLE) AS sv2
            FROM base GROUP BY 1, 2
        )
        SELECT event_type, dow,
               sv / CAST(n AS DOUBLE) AS dow_mean, n,
               -- power-sum identity S(v-m)^2 = Sv2 - 2m*Sv + n*m^2: only
               -- RAW 2-decimal values enter decimal casts (exact at these
               -- scales); the mean quotient stays a double and is never
               -- re-rounded (a quotient like 989.895/20 lands EXACTLY on
               -- a decimal rounding boundary and the engines round
               -- opposite ways). Same IEEE expression shape both engines.
               -- clamped at 0: cancellation on a constant cell can land
               -- the identity a hair negative, and a sum of squares must
               -- stay non-negative for downstream sqrt consumers
               GREATEST(0.0::DOUBLE,
                        (sv2 - ((2.0 * (sv / CAST(n AS DOUBLE))) * sv))
                          + ((CAST(n AS DOUBLE) * (sv / CAST(n AS DOUBLE)))
                             * (sv / CAST(n AS DOUBLE)))) AS sq_residual_sum
        FROM season
    """,
    tags=("timeseries", "stats"),
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal baseline + residual energy: per (type, dow)
    the seasonal mean and the squared-residual sum against it — the
    deseasonalization step before any anomaly rule. The residual energy
    uses the power-sum identity Σ(v-m)² = Σv² - 2mΣv + nm², so only RAW
    2-decimal values enter decimal casts (exact at scale 4/6, bit-equal
    cross-engine) and the quotient mean is never re-rounded through a
    decimal — re-casting a quotient double is the cross-engine rounding
    trap ts_cusum_drift hit (989.895/20 = 49.49475 sits exactly on the
    DECIMAL(18,4) boundary and Spark/DuckDB round opposite ways). Spark's
    dayofweek is 1=Sunday; DuckDB's is 0=Sunday, so the oracle shifts by
    one.

    Scale shape: ONE pass over events — a 7·|types|-row aggregate of
    three partial-aggregated power sums; the mean and residual energy are
    pure projections of it. No join back over the fact table, no window,
    no sort.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("dow"), "value"
    )
    season = ev.groupBy("event_type", "dow").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sv"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(24,6)"))
        .cast("double")
        .alias("sv2"),
    )
    n_d = F.col("n").cast("double")
    m = F.col("sv") / n_d
    return season.select(
        "event_type",
        "dow",
        m.alias("dow_mean"),
        "n",
        F.greatest(
            F.lit(0.0),
            (F.col("sv2") - ((F.lit(2.0) * m) * F.col("sv")))
            + ((n_d * m) * m),
        ).alias("sq_residual_sum"),
    )


@query(
    "events_ab_test_lift",
    oracle="""
        WITH assign AS (
            SELECT user_id, user_id % 2 AS variant,
                   CASE WHEN count_if(event_type = 'purchase') >= 15
                        THEN 1 ELSE 0 END AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT variant,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM assign GROUP BY variant
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
                MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
                MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
                MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
            FROM arms
        )
        SELECT n0, c0, n1, c1,
               CAST(c0 AS DOUBLE) / n0 AS rate_control,
               CAST(c1 AS DOUBLE) / n1 AS rate_treatment,
               CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0
                 AS absolute_lift,
               CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
                 (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                   / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                          * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                          * (1.0 / n0 + 1.0 / n1))
               END AS z_score
        FROM wide
    """,
    tags=("events", "stats"),
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout: users split into control/treatment by
    user_id parity (the deterministic assignment a real experiment
    framework would persist), conversion = at
    least 15 purchase events; emits
    per-arm counts, rates, absolute lift, and the pooled two-proportion
    z-score. Every float derives from exact integer counts through one
    fixed expression, so both engines agree bitwise.

    Scale shape: one user-keyed aggregate (conditional MAX — no
    self-join), one 2-row arm aggregate, then scalar arithmetic on a
    1-row frame via conditional aggregation. Shuffles carry counters
    only.
    """
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.when(
            F.count_if(F.col("event_type") == "purchase") >= 15, 1
        )
        .otherwise(0)
        .alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    arms = assign.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    r0 = F.col("c0").cast("double") / F.col("n0")
    r1 = F.col("c1").cast("double") / F.col("n1")
    p = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        r0.alias("rate_control"),
        r1.alias("rate_treatment"),
        (r1 - r0).alias("absolute_lift"),
        # degenerate arms (all or none converted -> pooled variance 0)
        # yield NULL in both engines instead of an ANSI divide-by-zero
        F.when(
            (F.col("c0") + F.col("c1") > 0)
            & (F.col("c0") + F.col("c1") < F.col("n0") + F.col("n1")),
            (r1 - r0)
            / F.sqrt(
                p
                * (F.lit(1.0) - p)
                * (
                    F.lit(1.0) / F.col("n0")
                    + F.lit(1.0) / F.col("n1")
                )
            ),
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# ACF, SQL-surface extras, keyword extraction, MMR diversification.
# ---------------------------------------------------------------------------


@query(
    "ts_autocorrelation",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(*) AS v
            FROM events GROUP BY 1, 2
        ),
        vals AS (
            -- day-ordered series per type; pair sums below are LEFT FOLDS
            -- over these arrays, the same IEEE addition order as the
            -- Spark side. No decimal cast of the quotient dailies — that
            -- re-rounding is the cross-engine trap ts_cusum_drift hit.
            SELECT event_type, list(v ORDER BY day) AS vs
            FROM daily GROUP BY event_type
        ),
        s AS (
            SELECT event_type, vs, len(vs) AS n_all FROM vals
            WHERE len(vs) > 7
        ),
        p AS (
            SELECT event_type,
                   CAST(n_all - 1 AS DOUBLE) AS n1,
                   CAST(n_all - 7 AS DOUBLE) AS n7,
                   list_reduce(vs[1 : n_all - 1], (a, b) -> a + b) AS sx1,
                   list_reduce(list_transform(vs[1 : n_all - 1], x -> x * x),
                               (a, b) -> a + b) AS sxx1,
                   list_reduce(vs[2 : n_all], (a, b) -> a + b) AS sy1,
                   list_reduce(list_transform(vs[2 : n_all], x -> x * x),
                               (a, b) -> a + b) AS syy1,
                   list_reduce(list_transform(generate_series(1, n_all - 1),
                                              i -> (vs[i]) * (vs[i + 1])),
                               (a, b) -> a + b) AS sxy1,
                   list_reduce(vs[1 : n_all - 7], (a, b) -> a + b) AS sx7,
                   list_reduce(list_transform(vs[1 : n_all - 7], x -> x * x),
                               (a, b) -> a + b) AS sxx7,
                   list_reduce(vs[8 : n_all], (a, b) -> a + b) AS sy7,
                   list_reduce(list_transform(vs[8 : n_all], x -> x * x),
                               (a, b) -> a + b) AS syy7,
                   list_reduce(list_transform(generate_series(1, n_all - 7),
                                              i -> (vs[i]) * (vs[i + 7])),
                               (a, b) -> a + b) AS sxy7
            FROM s
        ),
        d AS (
            -- variance terms clamped at 0 (cancellation on a constant
            -- series can land at -1e-19 and DuckDB sqrt() THROWS on
            -- negatives); a zero denominator (constant series) yields
            -- NULL on BOTH engines (Spark's 0/0 would be NaN, DuckDB's
            -- NULL — the guard unifies them)
            SELECT event_type, n1, n7,
                   sxy1 - sx1 * sy1 / n1 AS cov1,
                   sqrt(GREATEST(0.0::DOUBLE, sxx1 - sx1 * sx1 / n1))
                     * sqrt(GREATEST(0.0::DOUBLE, syy1 - sy1 * sy1 / n1))
                     AS den1,
                   sxy7 - sx7 * sy7 / n7 AS cov7,
                   sqrt(GREATEST(0.0::DOUBLE, sxx7 - sx7 * sx7 / n7))
                     * sqrt(GREATEST(0.0::DOUBLE, syy7 - sy7 * sy7 / n7))
                     AS den7
            FROM p
        )
        SELECT event_type,
               CAST(n1 AS BIGINT) AS n_pairs_lag1,
               CASE WHEN den1 = 0.0 THEN NULL ELSE cov1 / den1 END AS acf_lag1,
               CAST(n7 AS BIGINT) AS n_pairs_lag7,
               CASE WHEN den7 = 0.0 THEN NULL ELSE cov7 / den7 END AS acf_lag7
        FROM d
    """,
    tags=("timeseries", "stats"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily value series at lags 1 and 7
    (the day-over-day and week-over-week dependence a forecaster checks
    first): Pearson correlation of (x_{t-k}, x_t) pairs over the
    day-ordered per-type series, with every pair sum a LEFT FOLD over the
    ordered array (identical IEEE addition order cross-engine — the
    ts_cusum_drift discipline; a decimal re-cast of the quotient dailies
    would hit the boundary-rounding trap) and the correlation one fixed
    IEEE expression.

    Scale shape: events collapse to calendar-bounded dailies first; the
    per-type array is ≤366 values/year, so the folds are tiny pure-JVM
    projections. Nothing scales with event volume except the first
    partial-aggregated daily rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("v")
    )
    vals = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "v"))),
                lambda r: r["v"],
            ).alias("vs")
        )
        .filter(F.size("vs") > 7)
    )

    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731

    def pair_sums(k: int):
        n_k = F.size("vs") - F.lit(k)
        xs = F.slice("vs", 1, n_k)
        ys = F.slice("vs", k + 1, n_k)
        return {
            f"n{k}": n_k.cast("double"),
            f"sx{k}": fold(xs),
            f"sxx{k}": fold(F.transform(xs, lambda x: x * x)),
            f"sy{k}": fold(ys),
            f"syy{k}": fold(F.transform(ys, lambda x: x * x)),
            f"sxy{k}": fold(F.zip_with(xs, ys, lambda x, y: x * y)),
        }

    cols = {**pair_sums(1), **pair_sums(7)}
    p = vals.select(
        "event_type", *(c.alias(name) for name, c in cols.items())
    )

    def corr_expr(k: int):
        # variance terms clamped at 0 (cancellation on a constant series
        # lands at -1e-19; DuckDB sqrt() throws on negatives) and a zero
        # denominator yields NULL on both engines (not Spark's NaN)
        n = F.col(f"n{k}")
        sx, sy = F.col(f"sx{k}"), F.col(f"sy{k}")
        sxx, syy, sxy = F.col(f"sxx{k}"), F.col(f"syy{k}"), F.col(f"sxy{k}")
        cov = sxy - sx * sy / n
        den = F.sqrt(F.greatest(F.lit(0.0), sxx - sx * sx / n)) * F.sqrt(
            F.greatest(F.lit(0.0), syy - sy * sy / n)
        )
        return F.when(den == 0.0, F.lit(None).cast("double")).otherwise(
            cov / den
        )

    return p.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n_pairs_lag1"),
        corr_expr(1).alias("acf_lag1"),
        F.col("n7").cast("bigint").alias("n_pairs_lag7"),
        corr_expr(7).alias("acf_lag7"),
    )


@query(
    "sql_pivot_clause",
    oracle="""
        SELECT o_orderpriority,
               CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS F_cnt,
               CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS O_cnt,
               CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS P_cnt
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("sql", "pivot"),
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text PIVOT clause (the textual twin of agg_pivot's
    DataFrame API): counts per order status pivoted to columns from a
    bounded, explicitly listed IN domain.

    Scale shape: PIVOT compiles to one aggregate keyed by the row
    dimension with a conditional-count expression per listed value —
    same plan as the count_if oracle; bounded output width by
    construction (the IN list, never data discovery).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(F_cnt AS BIGINT) AS F_cnt,
               CAST(O_cnt AS BIGINT) AS O_cnt,
               CAST(P_cnt AS BIGINT) AS P_cnt
        FROM (SELECT o_orderpriority, o_orderstatus FROM orders_v)
        PIVOT (COUNT(*) FOR o_orderstatus IN ('F' AS F_cnt, 'O' AS O_cnt, 'P' AS P_cnt))
    """)


@query(
    "sql_distribute_sort_by",
    oracle="""
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(MIN(l_orderkey) AS BIGINT) AS first_order
        FROM lineitem
        WHERE l_quantity >= 48
        GROUP BY l_suppkey
    """,
    tags=("sql", "layout"),
)
def sql_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY — the SQL layout clauses (Hive dialect,
    fully supported by Spark): rows are hash-distributed on l_suppkey
    and sorted within each partition, then aggregated per supplier. The
    aggregate after the layout step reuses the distribution (no second
    Exchange on the same key), which is exactly why a pipeline author
    uses these clauses; the row CONTENT is layout-independent, so the
    oracle is the plain aggregate.

    Scale shape: one hash Exchange (the DISTRIBUTE BY) + in-partition
    sort; the downstream groupBy(l_suppkey) is Exchange-free on the
    already-distributed data.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        WITH laid_out AS (
            SELECT l_suppkey, l_orderkey
            FROM lineitem_v
            WHERE l_quantity >= 48
            DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_orderkey
        )
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(MIN(l_orderkey) AS BIGINT) AS first_order
        FROM laid_out GROUP BY l_suppkey
    """)


@query(
    "text_keyword_topk",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS score
            FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, term) AS rk
            FROM scored
        )
        SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, score
        FROM ranked WHERE rk <= 5
    """,
    tags=("llm", "text"),
)
def text_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 keywords by TF-IDF (the keyword-extraction /
    doc-tagging primitive): text_tfidf's exact scoring (score rounded to
    6 decimals — that rounding is what makes the ln()-based score, and
    therefore the RANKING, identical across engines), then a per-doc
    row_number window with the term as tie-break.

    Scale shape: tf is one (doc, term) aggregate, df one term-keyed
    aggregate joined back (term table is vocab-bounded), the window
    partitions per doc over its distinct terms. No global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = d.count()  # scalar plan parameter (1-value fetch)
    scored = tf.join(df_t, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "term", "score")
    )


@query(
    "vec_mmr_diversify",
    tags=("vector", "rag", "rows-only"),
)
def vec_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversification pass a RAG retriever runs on its top-k:
    stage 1 pulls the top-50 candidates by cosine against the query
    vector (TakeOrderedAndProject, the vec_knn_query path); stage 2
    greedily selects 10 of them maximizing
    0.7·sim(q,d) − 0.3·max_{s∈selected} sim(d,s).

    The greedy stage runs driver-side over the BOUNDED 50×dim candidate
    block (a k-sized fetch like the k-means centroid pull, annotated;
    the data-sized work — scoring every vector — stays distributed).
    Rows-only (greedy iteration has no SQL twin); tests/test_graph_ts.py
    pins it against an independent pure-Python MMR and checks the
    diversity property (selected-set min pairwise distance ≥ plain
    top-10's).
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None:
        return spark.createDataFrame(
            [], "rank int, vec_id bigint, relevance double"
        )
    qv = np.array(qrow[0], dtype=np.float64)
    qv /= np.linalg.norm(qv) or 1.0
    sim = F.aggregate(
        F.zip_with(
            "embedding",
            F.lit(qv.tolist()),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda a: a.cast("double") * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cands = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", sim.alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(50)
        .collect()
    )  # bounded candidate fetch: 50 rows × dim
    if not cands:
        return spark.createDataFrame(
            [], "rank int, vec_id bigint, relevance double"
        )
    ids = [r["vec_id"] for r in cands]
    rel = np.array([r["rel"] for r in cands])
    M = np.array([r["embedding"] for r in cands], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    sims = M @ M.T
    selected: "list[int]" = []
    remaining = list(range(len(ids)))
    while remaining and len(selected) < 10:
        if selected:
            penalty = sims[np.ix_(remaining, selected)].max(axis=1)
        else:
            penalty = np.zeros(len(remaining))
        mmr = 0.7 * rel[remaining] - 0.3 * penalty
        # deterministic argmax: score desc, vec_id asc on exact doubles
        best = max(
            range(len(remaining)), key=lambda i: (mmr[i], -ids[remaining[i]])
        )
        selected.append(remaining.pop(best))
    rows = [
        (rk + 1, int(ids[i]), float(rel[i])) for rk, i in enumerate(selected)
    ]
    return spark.createDataFrame(rows, "rank int, vec_id bigint, relevance double")


@query(
    "ts_max_drawdown",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(*) AS v
            FROM events GROUP BY 1, 2
        ),
        dd AS (
            SELECT event_type, day, v,
                   MAX(v) OVER (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) - v AS drawdown
            FROM daily
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               MAX(drawdown) AS max_drawdown,
               CAST(MIN(CASE WHEN drawdown = 0 THEN day END) AS DATE)
                 AS first_peak_day
        FROM dd GROUP BY event_type
    """,
    tags=("timeseries", "window"),
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily value series per event type — the
    largest peak-to-trough drop, the risk statistic every monitoring /
    portfolio pipeline computes. Running peak via a ROWS UNBOUNDED
    PRECEDING window max (streamable frame, no float accumulation:
    MAX selects an existing decimal-exact double, and the subtraction is
    a single exact-input IEEE op — bit-identical across engines).

    Scale shape: events collapse to calendar-bounded dailies first; the
    window partitions per type over ≤366 rows/year. Nothing downstream
    scales with event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.withColumn("drawdown", F.max("v").over(w) - F.col("v"))
    return dd.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.max("drawdown").alias("max_drawdown"),
        F.min(F.when(F.col("drawdown") == 0, F.col("day"))).alias(
            "first_peak_day"
        ),
    )


@query(
    "graph_kcore",
    tags=("graph", "iterative", "rows-only"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-core of the co-supply graph (operators/kcore.py iterative
    peel): the maximal subgraph where every supplier co-supplies with ≥3
    others inside it — the dense backbone a fraud/cluster analyst looks
    at first. Emits per-degree accounting of the surviving nodes.

    Rows-only (iterative peel; no SQL twin) — the k-core is UNIQUE, so
    tests/test_graph_ts.py pins: in-core degrees all ≥ k, K5 is exactly
    its own 4-core, a star's 2-core is empty, and peeling is idempotent
    (kcore(kcore(G)) == kcore(G)).

    Scale shape: per-round degree aggregate + two semi-joins over a
    monotonically SHRINKING edge list, checkpointed; the fixpoint probe
    is a 1-value count.
    """
    from ..operators.kcore import kcore

    core = kcore(spark, _cosupply_edges(spark, sf_dir), k=3)
    return core.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.min("node").cast("bigint").alias("min_node"),
    )


@query(
    "agg_approx_top_k",
    oracle="""
        SELECT l_returnflag AS item,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "sketch"),
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``approx_top_k`` sketch aggregate over the bounded
    l_returnflag domain (3 values ≪ the sketch's 10k tracked items, so the
    sketch degenerates to EXACT counts and the DuckDB twin is the plain
    GROUP BY — the same exact-on-small / approximate-at-scale
    contract agg_approx_count_distinct documents).

    Scale shape: a mergeable fixed-size sketch per partition, one
    reduce — heavy-hitter counts at 100 TB without a value-keyed
    shuffle; tracked-item capacity trades exactness, never memory.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.agg(F.expr("approx_top_k(l_returnflag, 3)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
    )


@query(
    "ml_als_recommend",
    tags=("ml", "iterative", "rows-only", "blocked-product"),
)
def ml_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collaborative filtering with ALS (pyspark.ml.recommendation) over
    the implicit customer→supplier purchase matrix (rating = lineitem
    count from the one fact join) — THE classic distributed Spark ML
    workload: alternating least squares factorizes the interaction
    matrix into rank-8 user/item factors, then recommends 5 unseen
    suppliers per sampled customer.

    Rows-only (iterative least squares has no SQL twin);
    tests/test_graph_ts.py pins: recommended ids are real suppliers,
    scores are finite and non-increasing per customer, and exactly 5
    recs per requested customer.

    Scale shape: ALS is Spark's own block-partitioned implementation —
    factor blocks co-partition with rating blocks, each sweep is a
    join+solve per block; driver holds nothing data-sized. The
    interaction matrix itself is ONE fact aggregate. seed pinned for
    run-to-run determinism on fixed data. Block count is 4 here (at toy
    scale per-sweep task overhead dominates — measured 7.2 -> 3.9 s
    warm at sf0.1); a cluster sizes blocks to ratings/partition-target
    exactly like the pagerank loop width.
    """
    from pyspark.ml.recommendation import ALS

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ratings = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_suppkey").cast("int").alias("item"),
        )
        .agg(F.count("*").cast("float").alias("rating"))
    )
    als = ALS(
        rank=8,
        maxIter=3,
        regParam=0.1,
        numUserBlocks=4,
        numItemBlocks=4,
        implicitPrefs=True,
        seed=42,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    users = ratings.select("user").distinct().filter(F.col("user") % 50 == 0)
    recs = model.recommendForUserSubset(users, 5)
    return recs.select(
        F.col("user").cast("bigint").alias("custkey"),
        F.posexplode("recommendations").alias("rk", "rec"),
    ).select(
        "custkey",
        (F.col("rk") + 1).cast("int").alias("rk"),
        F.col("rec.item").cast("bigint").alias("suppkey"),
        F.col("rec.rating").cast("double").alias("score"),
    )


@query(
    "agg_multiple_regression",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS s1,
                   CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS s2,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS s11,
                   CAST(CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS s12,
                   CAST(CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS s22,
                   CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS s1y,
                   CAST(CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE) AS s2y
            FROM lineitem GROUP BY l_returnflag
        ),
        c AS (
            SELECT l_returnflag, n,
                   s11 - s1 * s1 / n AS c11,
                   s12 - s1 * s2 / n AS c12,
                   s22 - s2 * s2 / n AS c22,
                   s1y - s1 * sy / n AS c1y,
                   s2y - s2 * sy / n AS c2y,
                   s1 / n AS m1, s2 / n AS m2, sy / n AS my
            FROM s
        )
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b_quantity,
               (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b_discount,
               my - (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * m1
                  - (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * m2
                 AS intercept
        FROM c
    """,
    tags=("agg", "stats"),
)
def agg_multiple_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor OLS per group, closed form: price ~ quantity +
    discount via the normal equations — centered covariance sums from
    decimal-exact raw power sums, a 2×2 Cramer solve and the intercept
    from the means, all ONE fixed IEEE expression per coefficient
    (the agg_corr/agg_regression discipline extended to multiple
    regression) — bit-exact across engines, reproducible under any
    partitioning.

    Scale shape: one partial-aggregated pass collecting 8 power sums per
    group; the solve is per-group scalar arithmetic. The closed form is
    exact for any number of rows; more predictors → the iterative
    pyspark.ml path (text_quality_classifier's LR), this query is the
    exact low-dimension fast path.
    """
    li = load_table(spark, sf_dir, "lineitem", rebalance_on="l_orderkey")
    d = lambda c, p, s: F.sum(c.cast(f"decimal({p},{s})")).cast("string").cast("double")  # noqa: E731
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        d(x1, 18, 4).alias("s1"),
        d(x2, 18, 4).alias("s2"),
        d(y, 18, 4).alias("sy"),
        d(x1 * x1, 24, 6).alias("s11"),
        d(x1 * x2, 24, 6).alias("s12"),
        d(x2 * x2, 24, 6).alias("s22"),
        d(x1 * y, 24, 6).alias("s1y"),
        d(x2 * y, 24, 6).alias("s2y"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    m1, m2, my = F.col("s1") / n, F.col("s2") / n, F.col("sy") / n
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        b1.alias("b_quantity"),
        b2.alias("b_discount"),
        (my - b1 * m1 - b2 * m2).alias("intercept"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), views AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
        ), ranked AS (
            SELECT c.event_id AS click_id, c.user_id AS user_id,
                   v.event_id AS view_id,
                   row_number() OVER (
                       PARTITION BY c.event_id
                       ORDER BY v.ts DESC, v.event_id DESC
                   ) AS rn
            FROM clicks c LEFT JOIN views v
              ON c.user_id = v.user_id AND v.ts <= c.ts
             AND v.ts >= c.ts - INTERVAL 30 MINUTE
        )
        SELECT click_id, user_id, view_id FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE: the latest same-user view at or before
    each click, but only if it happened within the last 30 minutes —
    stale matches become NULL instead of silently attributing to an
    ancient view (the asof-tolerance every feature-store lookup wants).

    Same linear carry-forward shape as join_asof_click_view (union
    tagged kinds, ONE per-user window — no click×view pair join): the
    window carries the last view's id AND timestamp, and the tolerance
    is a post-window null-out comparing the carried view ts against the
    click ts. One shuffle, bounded state, the tolerance costs zero extra
    passes.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("eid"),
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("vid"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("vts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("eid"),
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.col("event_id").alias("vid"),
        F.col("ts").alias("vts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(views)
        .withColumn("last_vid", F.last("vid", ignorenulls=True).over(w))
        .withColumn("last_vts", F.last("vts", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(
            F.col("eid").alias("click_id"),
            "user_id",
            F.when(
                F.col("last_vts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES"),
                F.col("last_vid"),
            ).alias("view_id"),
        )
    )
