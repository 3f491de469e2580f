"""Round-8 analytics extensions: oracle-checked variants of the four
families whose main implementations are engine-native and therefore
rows-only (MinHash LSH on xxhash64, PageRank / label propagation /
k-core as unbounded-fixpoint loops).

Each query here pins the SAME algorithm to a cross-engine-deterministic
contract — md5-derived integer hashes, fixed-point integer arithmetic,
a fixed round count — so DuckDB can replay it bit-exactly and the round
driver's rows+schema+hash gate applies. The production variants
(llm_dedup.dedup_minhash_lsh, operators/{pagerank,labelprop,kcore}.py)
keep their faster engine-native hashing and run-to-convergence loops;
these twins exist to hash-verify the algorithmic core: band-candidate
generation + exact verify, mass-conserving rank flow, min-label
flooding, and degree-threshold peeling.

All [EXT] surface beyond the reference's replication dataflow
(``ReplicationApplication.java:71`` is its only transform). The r8 twins
entered the driver window in r9 (all green); the five r9 twins landed
green in CORRECTNESS_r10.json. vec_ann_recall_verified — the registry's
last never-sampled oracle-bearing query — had its "defer-sample" tag
dropped in r11 and leads that round's window (the final rotation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..session import track_persist
from . import query
from .llm_curation import _token_grams, _token_grams_sql

# ---------------------------------------------------------------------------
# MinHash + banded LSH, md5-deterministic.
#
# One md5 per (doc, gram) — conv(substr(md5,1,15),16,10) is a 60-bit
# non-negative integer both engines compute identically (verified:
# 426544247714475757 for 'hello world' in Spark AND DuckDB) — then 8
# minhash slots as affine permutations (a*h+b) mod P of its 31-bit
# reduction, the same one-hash-many-permutations construction the
# production dedup_minhash_lsh uses on xxhash64. Constants hardcoded so
# the oracle embeds the identical family.
# ---------------------------------------------------------------------------

_P31 = 2147483647  # Mersenne prime 2^31 - 1
# 8 fixed affine permutation pairs (a odd, < 2^31; products stay < 2^62)
_PERMS = (
    (1103515245, 12345),
    (1588635695, 98765),
    (784588717, 5555555),
    (999999937, 31337),
    (1229782938, 7777777),
    (363264403, 13579),
    (1834691741, 246810),
    (572936153, 999331),
)
_NBANDS = 2  # 2 bands x 4 rows: P(candidate) = 1-(1-j^4)^2


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {_P31}) AS s{i}"
        for i, (a, b) in enumerate(_PERMS)
    )
    return f"SELECT doc_id, {mins} FROM inv GROUP BY doc_id"


_MINHASH_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, {_token_grams_sql('text', 6)} AS g FROM documents
    ),
    ug AS (SELECT doc_id, unnest(g) AS gr FROM sh),
    inv AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(gr), 1, 15) AS BIGINT) % {_P31} AS h
        FROM ug
    ),
    sig AS ({_minhash_sig_sql()}),
    bands AS (
        SELECT doc_id, 0 AS band_id,
               concat_ws('-', s0, s1, s2, s3) AS bk FROM sig
        UNION ALL
        SELECT doc_id, 1, concat_ws('-', s4, s5, s6, s7) FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
             / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)))
             AS jaccard
    FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
    WHERE CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
             / (len(x.g) + len(y.g) - len(list_intersect(x.g, y.g))) >= 0.5
"""


@query(
    "dedup_minhash_banded",
    oracle=_MINHASH_ORACLE,
    tags=("llm", "dedup", "lsh"),
)
def dedup_minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, hash-verified end to end:
    word 6-gram shingles → one md5 per gram (JVM codegen, no Python) →
    8 minhash slots as affine permutations of its 31-bit reduction → 2
    bands of 4 → candidates = docs sharing a band key → exact Jaccard
    verify >= 0.5 on the full shingle sets.

    The production variant (llm_dedup.dedup_minhash_lsh) is the same
    shape on xxhash64 + an Arrow-batched numpy min — faster, but
    engine-native and so only rows-only-checkable. This twin pins the
    ALGORITHM (band candidate generation, never all-pairs; exact verify
    on candidates only) to an md5 contract DuckDB replays bit-exactly.

    Scale shape: shingling and hashing are map-side codegen; the slot
    mins are one partial-aggregated groupBy (8 longs per doc); the band
    self-join is bounded by band-bucket sizes (the LSH guarantee), and
    the gram arrays re-join only for the candidate set. No stage ever
    holds more than (doc_id, 8 longs) per row except the final bounded
    verify. Jaccard is a single correctly-rounded IEEE division."""
    d = load_table(spark, sf_dir, "documents", rebalance_on="doc_id")
    # localCheckpoint (repo idiom), not persist(): the shingle arrays are
    # this query's largest intermediate, and a persist() with no unpersist
    # would stay pinned in executor memory for the rest of a shared-session
    # bench; checkpointed blocks are GC-cleaned with the returned plan.
    sh = d.select(
        "doc_id", _token_grams(F.col("text"), 6).alias("g")
    ).localCheckpoint(eager=True)
    inv = sh.select("doc_id", F.explode("g").alias("gr")).select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(F.md5("gr"), 1, 15), 16, 10).cast("bigint"),
            F.lit(_P31),
        ).alias("h"),
    )
    # sig feeds BOTH sides of the band self-join; without materialization
    # each side re-ran the corpus-sized explode + md5 + min aggregate
    # (no exchange reuse — one side plans as a BroadcastExchange, r12
    # plan audit). The signature table is 8 longs per doc — persist it
    # (the production twin dedup_minhash_lsh materializes the same
    # table; persist rather than localCheckpoint here so the aggregate
    # stays visible in the executed plan for the r8 partial-agg pin in
    # tests/test_plans.py, and the bench's per-query clearCache sweeps
    # the blocks).
    sig = inv.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_P31))
            ).alias(f"s{i}")
            for i, (a, b) in enumerate(_PERMS)
        ]
    ).transform(track_persist)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.concat_ws("-", "s0", "s1", "s2", "s3"),
                F.concat_ws("-", "s4", "s5", "s6", "s7"),
            )
        ).alias("band_id", "bk"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    xa = sh.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    xb = sh.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    jac = inter / (F.size("ga") + F.size("gb") - inter)
    return (
        cand.join(xa, "doc_a")
        .join(xb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# The shared fixed-iteration graph: the symmetric supplier <-> part
# bipartite graph from lineitem (parts offset by 10^9 so the id spaces
# never collide). Symmetric edges mean no dangling nodes and no
# in-degree-zero nodes — every fixed-point identity below is exact.
# ---------------------------------------------------------------------------

_PART_OFF = 1_000_000_000

_GRAPH_SQL = f"""
    sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey + {_PART_OFF} AS p
           FROM lineitem),
    edges AS (SELECT s AS src, p AS dst FROM sp
              UNION ALL SELECT p, s FROM sp),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
"""
# mod-class-partitioned variant: suppliers only link parts of their own
# mod-10 class, so the graph has >= 10 connected components — labelprop
# then has real communities to find instead of min-flooding one dense
# graph to a single label within 3 rounds (measured: diameter ~2).
_GRAPH_MOD10_SQL = _GRAPH_SQL.replace(
    "FROM lineitem", "FROM lineitem WHERE l_suppkey % 10 = l_partkey % 10"
)


def _graph_edges(
    spark: SparkSession, sf_dir: str, mod10: bool = False
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    if mod10:
        li = li.filter(F.col("l_suppkey") % 10 == F.col("l_partkey") % 10)
    sp = li.select(
        F.col("l_suppkey").alias("s"),
        (F.col("l_partkey") + F.lit(_PART_OFF)).alias("p"),
    ).distinct()
    return (
        sp.select(F.col("s").alias("src"), F.col("p").alias("dst"))
        .unionAll(sp.select(F.col("p").alias("src"), F.col("s").alias("dst")))
        # feeds deg + one rank join per round — materialize once
        .localCheckpoint(eager=True)
    )


_PR_SCALE = 1_000_000_000_000  # ranks in units of 1e-12
_PR_ITERS = 3


@query(
    "graph_pagerank_fixed_point",
    oracle=f"""
        WITH {_GRAPH_SQL},
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        r0 AS (SELECT node, {_PR_SCALE} // (SELECT COUNT(*) FROM nodes) AS r
               FROM nodes),
        r1 AS (
            SELECT e.dst AS node,
                   (15 * {_PR_SCALE} // 100) // (SELECT COUNT(*) FROM nodes)
                     + 85 * SUM(r.r // d.d) // 100 AS r
            FROM edges e JOIN r0 r ON r.node = e.src
                         JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        ),
        r2 AS (
            SELECT e.dst AS node,
                   (15 * {_PR_SCALE} // 100) // (SELECT COUNT(*) FROM nodes)
                     + 85 * SUM(r.r // d.d) // 100 AS r
            FROM edges e JOIN r1 r ON r.node = e.src
                         JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        ),
        r3 AS (
            SELECT e.dst AS node,
                   (15 * {_PR_SCALE} // 100) // (SELECT COUNT(*) FROM nodes)
                     + 85 * SUM(r.r // d.d) // 100 AS r
            FROM edges e JOIN r2 r ON r.node = e.src
                         JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        )
        SELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS rank_fp
        FROM r3
        ORDER BY rank_fp DESC, node ASC LIMIT 20
    """,
    tags=("graph",),
)
def graph_pagerank_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, hash-verified: 3 unrolled iterations over the symmetric
    supplier<->part graph in FIXED-POINT INTEGER arithmetic — ranks are
    bigints in units of 1e-12, contributions are integer divisions
    (r DIV outdeg), and the damping step is (85 * sum) DIV 100 — so both
    engines compute the identical bit pattern; no float accumulation
    order can perturb the result. The production variant
    (operators/pagerank.py) runs double-precision to an L1-early-stop
    fixpoint; this twin hash-verifies the rank-flow core on a fixed
    round count.

    Scale shape: per iteration one edges-sized join against the
    node-sized rank table and one partial-aggregated groupBy(dst) —
    exactly the production loop's shape; the edge table materializes
    once (localCheckpoint) and each round's rank table is node-sized.
    Integer quantization loses < |V| * 1e-12 mass per round (floor), a
    deterministic contract, not an approximation drift. Top-20 via
    TakeOrderedAndProject with a total order (rank DESC, node ASC)."""
    edges = _graph_edges(spark, sf_dir)
    # out-degree rides the edge table: merged ONCE here instead of a
    # per-iteration deg join — the unrolled plan re-executed the degree
    # groupBy + join every round (3 extra Exchanges + 3 edge-sized
    # joins; guide §2.4 "two operations keyed the same way can share
    # one exchange"). Plan: 26 -> 14 Exchanges.
    ed = edges.join(
        edges.groupBy("src").agg(F.count("*").alias("d")), "src"
    ).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # scalar graph-order constant (bounded driver value)
    if n == 0:  # empty graph: no nodes, no ranks
        return spark.createDataFrame([], "node bigint, rank_fp bigint")
    base = (15 * _PR_SCALE // 100) // n
    r = nodes.select("node", F.lit(_PR_SCALE // n).cast("bigint").alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            ed.join(r.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("r DIV d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        r = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.expr("85 * csum DIV 100"))
            .cast("bigint")
            .alias("r"),
        )
    return (
        r.select(
            F.col("node").cast("bigint").alias("node"),
            F.col("r").cast("bigint").alias("rank_fp"),
        )
        .orderBy(F.desc("rank_fp"), F.asc("node"))
        .limit(20)
    )


@query(
    "graph_labelprop_min_rounds",
    oracle=f"""
        WITH {_GRAPH_MOD10_SQL},
        l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
        l1 AS (
            SELECT e.dst AS node, LEAST(MIN(l.lab), e.dst) AS lab
            FROM edges e JOIN l0 l ON l.node = e.src GROUP BY e.dst
        ),
        l2 AS (
            SELECT e.dst AS node, LEAST(MIN(l.lab), e.dst) AS lab
            FROM edges e JOIN l1 l ON l.node = e.src GROUP BY e.dst
        ),
        l3 AS (
            SELECT e.dst AS node, LEAST(MIN(l.lab), e.dst) AS lab
            FROM edges e JOIN l2 l ON l.node = e.src GROUP BY e.dst
        )
        SELECT CAST(lab AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM l3 GROUP BY lab
        ORDER BY n_members DESC, label ASC LIMIT 20
    """,
    tags=("graph",),
)
def graph_labelprop_min_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation, hash-verified: labels start as node ids
    and each of 3 rounds takes LEAST(own id, MIN over in-neighbors of
    their label) — the deterministic min-flooding core of connected
    components / community seeding (integer mins, no tie-break
    ambiguity, so both engines agree bitwise). The production variant
    (operators/labelprop.py) runs frequency-based label propagation to
    convergence and is invariant-checked; this twin hash-verifies the
    per-round neighborhood-reduce on a fixed round count, on the
    mod-10-partitioned graph whose >= 10 components give the flooding
    real communities to find (the full graph min-floods to one label
    within 3 rounds — measured diameter ~2).

    Scale shape: per round one edges-sized join + partial-aggregated
    MIN groupBy(dst) — O(diameter) rounds of exactly this shape is the
    checkpointed production loop. Top-20 communities by size with a
    total order."""
    edges = _graph_edges(spark, sf_dir, mod10=True)
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(3):
        lab = (
            edges.join(lab.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.least(F.min("lab"), F.col("dst")).alias("lab"))
            .select(F.col("dst").alias("node"), "lab")
        )
    return (
        lab.groupBy(F.col("lab").cast("bigint").alias("label"))
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(20)
    )


_KCORE_K = 40


@query(
    "graph_kcore_peel_rounds",
    oracle=f"""
        WITH {_GRAPH_SQL},
        d0 AS (SELECT src, d FROM deg),
        keep1 AS (SELECT src FROM d0 WHERE d >= {_KCORE_K}),
        e1 AS (
            SELECT e.src, e.dst FROM edges e
            JOIN keep1 a ON a.src = e.src
            JOIN keep1 b ON b.src = e.dst
        ),
        d1 AS (SELECT src, COUNT(*) AS d FROM e1 GROUP BY src),
        keep2 AS (SELECT src FROM d1 WHERE d >= {_KCORE_K}),
        e2 AS (
            SELECT e.src, e.dst FROM e1 e
            JOIN keep2 a ON a.src = e.src
            JOIN keep2 b ON b.src = e.dst
        )
        SELECT r.round,
               CAST(r.n_nodes AS BIGINT) AS n_nodes,
               CAST(r.n_edges AS BIGINT) AS n_edges
        FROM (
            SELECT 0 AS round, (SELECT COUNT(*) FROM d0) AS n_nodes,
                   (SELECT COUNT(*) FROM edges) AS n_edges
            UNION ALL
            SELECT 1, (SELECT COUNT(*) FROM keep1),
                   (SELECT COUNT(*) FROM e1)
            UNION ALL
            SELECT 2, (SELECT COUNT(*) FROM keep2),
                   (SELECT COUNT(*) FROM e2)
        ) r
    """,
    tags=("graph",),
)
def graph_kcore_peel_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling, hash-verified: two fixed rounds of "drop every
    node with degree < _KCORE_K (= 40), keep only edges between survivors" on the
    symmetric supplier<->part graph, reporting (round, nodes, edges)
    for the original graph and after each peel. Pure integer degree
    thresholds — both engines agree exactly. The production variant
    (operators/kcore.py) peels to the fixpoint; this twin hash-verifies
    the peel step itself (degree recompute on the induced subgraph, the
    part that goes wrong in distributed k-core).

    Scale shape: each round is one degree groupBy + two semi-join-shaped
    survivor filters on the edge table — the production loop's exact
    per-iteration plan. The per-round accounting rows are 1-row
    aggregates crossJoined (bounded broadcasts), all inside one plan —
    nothing collects to the driver."""
    edges = _graph_edges(spark, sf_dir)

    def peel(e: DataFrame) -> "tuple[DataFrame, DataFrame]":
        d = e.groupBy("src").agg(F.count("*").alias("d"))
        keep = d.filter(F.col("d") >= _KCORE_K).select("src")
        e2 = (
            e.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
            # three consumers downstream (node count, edge count, next
            # round's degree) — materialize the induced subgraph once
            .localCheckpoint(eager=True)
        )
        return keep, e2

    k1, e1 = peel(edges)
    k2, e2 = peel(e1)

    def acct(round_no: int, nodes: DataFrame, e: DataFrame) -> DataFrame:
        return (
            nodes.agg(F.count("*").cast("bigint").alias("n_nodes"))
            .crossJoin(e.agg(F.count("*").cast("bigint").alias("n_edges")))
            .select(
                F.lit(round_no).cast("int").alias("round"),
                "n_nodes",
                "n_edges",
            )
        )

    return (
        acct(0, edges.select("src").distinct(), edges)
        .unionAll(acct(1, k1, e1))
        .unionAll(acct(2, k2, e2))
    )


# ---------------------------------------------------------------------------
# Sketch twins: count-min and bottom-k built IN-PLAN from md5-derived
# hashes, so DuckDB replays the exact sketch (the production sketches in
# operators/sketches.py fold numpy matrices inside Arrow batches —
# faster, but only invariant-checkable). Integer cell counts and integer
# sample ranks mean both twins are bit-exact.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 256

# md5-derived row hash shared by both engines: 60-bit prefix int mod w.
_CMS_BUCKET_SQL = (
    "CAST('0x' || substr(md5({r} || ':' || CAST(user_id AS VARCHAR)), 1, 15)"
    f" AS BIGINT) % {_CMS_W}"
)


@query(
    "sketch_cms_verified",
    oracle=f"""
        WITH rows_x AS (
            SELECT r.r, e.user_id FROM events e,
                 (SELECT unnest(range({_CMS_D})) AS r) r
        ),
        cells AS (
            SELECT r, {_CMS_BUCKET_SQL.format(r='r')} AS bucket,
                   COUNT(*) AS c
            FROM rows_x GROUP BY 1, 2
        ),
        probes AS (
            SELECT u.user_id, r.r,
                   {_CMS_BUCKET_SQL.format(r='r.r')} AS bucket
            FROM (SELECT DISTINCT user_id FROM events) u,
                 (SELECT unnest(range({_CMS_D})) AS r) r
        )
        SELECT p.user_id, CAST(MIN(c.c) AS BIGINT) AS est_count
        FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
        GROUP BY p.user_id
        ORDER BY est_count DESC, user_id ASC LIMIT 10
    """,
    tags=("sketch", "approx"),
)
def sketch_cms_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters, hash-verified: the 4x256 counter
    matrix is built IN-PLAN (each event explodes to 4 (row, md5-bucket)
    cells, one partial-aggregated groupBy produces the 1024-cell sketch),
    then every distinct key probes min-over-rows through a broadcast join
    against the metadata-sized sketch. Identical md5 bucket hashes in
    both engines and integer cell counts make the twin bit-exact —
    including the CMS overcounts themselves (collisions land in the same
    buckets in both engines). The production variant
    (sketch_heavy_hitters / operators/sketches.py) folds numpy matrices
    per Arrow batch — faster, invariant-checked; this twin hash-verifies
    the sketch algebra: cell addressing, merge-by-sum, min-probe.

    Scale shape: the sketch build shuffles d*w=1024 partial cells, never
    events; probes are map-side against the broadcast cell table; top-10
    via TakeOrderedAndProject with a total order."""
    ev = load_table(spark, sf_dir, "events").select("user_id")

    def bucket(r_col):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            r_col.cast("string"),
                            F.lit(":"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(_CMS_W),
        )

    rows_x = ev.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r")
    )
    cells = rows_x.groupBy("r", bucket(F.col("r")).alias("bucket")).agg(
        F.count("*").alias("c")
    )
    probes = (
        ev.distinct()
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r"),
        )
        .select("user_id", "r", bucket(F.col("r")).alias("bucket"))
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").cast("bigint").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("user_id"))
        .limit(10)
    )


_BK_K = 256
_BK_PROBS = (0.25, 0.5, 0.75, 0.9)


@query(
    "sketch_bottomk_verified",
    oracle=f"""
        WITH sample_k AS (
            SELECT value,
                   ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                   ) AS hrk
            FROM events
            QUALIFY hrk <= {_BK_K}
        ),
        ordered AS (
            SELECT value,
                   ROW_NUMBER() OVER (ORDER BY value, hrk) AS vrk,
                   COUNT(*) OVER () AS k
            FROM sample_k
        )
        SELECT p.quantile, o.value AS est_value
        FROM (SELECT unnest([{', '.join(str(p) for p in _BK_PROBS)}])
                  AS quantile) p
        JOIN ordered o
          ON o.vrk = CAST(ceil(p.quantile * o.k) AS BIGINT)
        ORDER BY p.quantile
    """,
    tags=("sketch", "approx"),
)
def sketch_bottomk_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k quantile sketch, hash-verified: the k=256 rows with the
    smallest md5(event_id) form a deterministic uniform sample (hash
    order is uniform and engine/partitioning-independent), quantile
    estimates read off the value-sorted sample at rank ceil(p*k). Both
    engines pick the identical sample and identical ranks — bit-exact,
    including the sketch's own rank error (O(1/sqrt(k)), asserted
    against exact percentiles for the production twin in
    tests/test_llm_ops.py). The production variant
    (sketch_quantile_bottomk) merges per-partition heaps through
    TakeOrderedAndProject; this twin hash-verifies the sample-selection
    and rank-readout algebra.

    Scale shape: the hash-rank window is the one global ordering, but it
    is a top-k (TakeOrderedAndProject in the production twin; here a
    window the optimizer bounds to k rows after the filter) — at true
    scale the sample selection is per-partition heaps + a k-row merge,
    volume-independent driver traffic."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    wh = Window.orderBy(F.md5(F.col("event_id").cast("string")), "event_id")
    sample_k = (
        ev.select("event_id", "value")
        .withColumn("hrk", F.row_number().over(wh))
        .filter(F.col("hrk") <= _BK_K)
    )
    wv = Window.orderBy("value", "hrk")
    ordered = sample_k.select(
        "value",
        F.row_number().over(wv).alias("vrk"),
        F.count("*").over(Window.partitionBy()).alias("k"),
    )
    probs = spark.createDataFrame(
        [(p,) for p in _BK_PROBS], "quantile double"
    )
    return (
        probs.join(
            ordered,
            ordered["vrk"]
            == F.ceil(probs["quantile"] * ordered["k"]).cast("bigint"),
        )
        .select("quantile", F.col("value").alias("est_value"))
        .orderBy("quantile")
    )


_HLL_M = 1024  # 2^10 buckets; h's low 10 bits address, the top 50 rank
# alpha_m * m^2 * 2^60 for m=1024 (0.7213/(1+1.079/m)), precomputed once so
# the only float op in the estimate is ONE division by the exact Z sum.
_HLL_NUM = 8.710803268202205e23


@query(
    "sketch_hll_verified",
    oracle=f"""
        WITH h AS (
            SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h
            FROM events
        ),
        rho_t AS (
            SELECT h % {_HLL_M} AS bucket,
                   CASE WHEN h // {_HLL_M} = 0 THEN 51
                        ELSE instr(lpad(bin(h // {_HLL_M}), 50, '0'), '1')
                   END AS rho
            FROM h
        ),
        regs AS (SELECT bucket, MAX(rho) AS r FROM rho_t GROUP BY bucket),
        spine AS (SELECT unnest(range({_HLL_M})) AS bucket),
        full_regs AS (
            SELECT COALESCE(r.r, 0) AS r
            FROM spine s LEFT JOIN regs r ON r.bucket = s.bucket
        ),
        z AS (
            SELECT CAST(SUM(CAST((1::BIGINT << (60 - r)) AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS z,
                   CAST(COUNT(*) FILTER (r > 0) AS BIGINT)
                     AS nonzero_registers
            FROM full_regs
        )
        SELECT z.nonzero_registers,
               CASE WHEN z.nonzero_registers = 0 THEN NULL
                    ELSE {_HLL_NUM!r} / CAST(z.z AS DOUBLE) END AS est_raw,
               x.exact_distinct
        FROM z, (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                     AS exact_distinct FROM events) x
    """,
    tags=("sketch", "approx"),
)
def sketch_hll_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count, hash-verified: md5-derived 60-bit
    hashes split into a 10-bit bucket address and a 50-bit rank word
    whose leading-zero count (computed by INTEGER/STRING ops — lpad(bin)
    + instr — never float log2) feeds per-bucket MAX registers; the
    harmonic-mean denominator is summed EXACTLY as integer 2^(60-r)
    terms in decimal(38,0) (max 1024 * 2^60 = 2^70, no float
    accumulation order anywhere), and the single IEEE division at the
    end is the only float op. Both engines produce the identical raw
    estimate AND identical register states — the twin verifies HLL's
    register algebra (bucket addressing, rank extraction, max-merge,
    harmonic sum), which the engine-native production variants
    (agg_approx_count_distinct's HLL++, operators/sketches.py merge)
    can only invariant-check. Raw estimator by design: the small/large
    range corrections are presentation, not register algebra — and at
    the test corpus's n << m the raw value is EXPECTED to overshoot
    (sf0.01: est_raw 811 vs exact 150 with 887 empty registers; the
    linear-counting correction m*ln(m/empty) that production HLL
    applies there needs a transcendental, which the cross-engine
    numeric discipline (SCALE.md) bans from oracle-checked plans — the
    exact_distinct and nonzero_registers columns carry the context).

    Scale shape: one map pass computes (bucket, rho); the register table
    is a 1024-row MAX aggregate (partial map-side); the spine join and
    harmonic sum run on 1024 rows. Summary size is volume-independent —
    the HLL property. exact_distinct rides along as one more partial
    aggregate for the accuracy context."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    rho_t = ev.select(h.alias("h")).select(
        F.pmod("h", F.lit(_HLL_M)).alias("bucket"),
        F.expr(f"h DIV {_HLL_M}").alias("w"),
    ).select(
        "bucket",
        F.when(F.col("w") == 0, F.lit(51))
        .otherwise(F.instr(F.lpad(F.bin("w"), 50, "0"), "1"))
        .alias("rho"),
    )
    regs = rho_t.groupBy("bucket").agg(F.max("rho").alias("r"))
    spine = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    full_regs = spine.join(regs, "bucket", "left").select(
        F.coalesce("r", F.lit(0)).alias("r")
    )
    z = full_regs.agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 60 - r) AS DECIMAL(38,0))")
        )
        .cast("decimal(38,0)")
        .alias("z"),
        F.count(F.when(F.col("r") > 0, 1)).cast("bigint").alias(
            "nonzero_registers"
        ),
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return z.crossJoin(F.broadcast(exact)).select(
        "nonzero_registers",
        # an empty item set has no meaningful raw estimate (all-zero
        # registers would report alpha*m) — NULL, empty-corpus safe
        F.when(
            F.col("nonzero_registers") == 0, F.lit(None).cast("double")
        )
        .otherwise(F.lit(_HLL_NUM) / F.col("z").cast("double"))
        .alias("est_raw"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# ALS, fixed-point: rank-2 matrix factorization, one full alternation
# (users solved against md5-seeded item factors, then items re-solved
# against those user factors), entirely in scaled-integer arithmetic.
#
# The production ml_als_recommend (analytics_ext.py, pyspark.ml's blocked
# ALS over the same customer x supplier purchase matrix) is rows-only by
# necessity: iterative least squares on floats has no SQL twin. This twin
# pins the algorithm's CORE — the per-entity normal equations
# (A = F^T F + lambda*I, b = F^T r) and their closed-form 2x2 Cramer
# solve — to a contract DuckDB replays bit-exactly:
#
# - factors are integers in units of 1/_ALS_S (S = 100), seeded from
#   md5(item) so both engines start identically;
# - every sum in A and b is exact integer arithmetic (ratings clamped to
#   _ALS_RCAP keep magnitudes analyzable);
# - the solve's one division is an EXACT floor division spelled
#   per-engine: Spark `(num - pmod(num, den)) / den` on DECIMAL(38,0)
#   (subtracting the non-negative remainder makes the decimal division
#   exact — Spark's own `div` operator silently wraps >64-bit decimals
#   through a long, measured this round, so it is unusable here), DuckDB
#   `(num - ((num % den + den) % den)) // den` on HUGEINT. Same integer
#   function, verified identical on +/-1.3e21-scale operands;
# - solved factors clamp to +/-_ALS_CLAMP BEFORE the bigint cast (when
#   den sits near its lambda^2*S^4 floor the raw quotient can exceed 64
#   bits), bounding every step-2 and scoring magnitude by construction.
#
# den > 0 always: Cauchy-Schwarz gives a11*a22 >= a12^2 even before the
# lambda*S^2 ridge terms, so den >= lambda^2*S^4 = 1e6 — no zero-division
# branch needed in either engine. Documented headroom: with |factor| <=
# 1e5, 1e7 users/items and r <= 20, the largest intermediate (S * Cramer
# numerator of the item solve) stays < 1e35 < DECIMAL(38,0)/HUGEINT.
_ALS_S = 100
_ALS_LAM_S2 = 1_000  # lambda = 0.1 in S^2 fixed-point units
_ALS_CLAMP = 100_000  # |factor| <= 1000 in real units
_ALS_RCAP = 20

_ALS_FDIV = (
    f"CAST(GREATEST(-{_ALS_CLAMP}, LEAST({_ALS_CLAMP},"
    " ({n} - (({n} % den + den) % den)) // den)) AS BIGINT)"
)
_ALS_SOLVE_SQL = f"""
    SELECT {{key}},
           CAST(a11 AS HUGEINT) * a22 - CAST(a12 AS HUGEINT) * a12 AS den,
           {_ALS_S} * (CAST(a22 AS HUGEINT) * b1
                  - CAST(a12 AS HUGEINT) * b2) AS n1,
           {_ALS_S} * (CAST(a11 AS HUGEINT) * b2
                  - CAST(a12 AS HUGEINT) * b1) AS n2
    FROM {{src}}
"""


def _als_hash(col, salt: str):
    """Deterministic seed factor in [10, 110) — md5's 60-bit prefix
    reduced mod 100, the engine-shared construction every ext5 twin
    uses (DuckDB: CAST('0x' || substr(md5(..),1,15) AS BIGINT))."""
    return F.lit(10) + F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )


def _als_fdiv_clamp(num, den):
    """Exact floor(num/den) on DECIMAL(38,0) via remainder subtraction
    (the decimal division of exactly-divisible operands is exact; no
    rounding step exists anywhere in the solve), clamped to the factor
    range BEFORE the bigint cast."""
    q = ((num - F.pmod(num, den)) / den).cast("decimal(38,0)")
    return (
        F.greatest(F.lit(-_ALS_CLAMP), F.least(F.lit(_ALS_CLAMP), q))
        .cast("bigint")
    )


def _als_solve(side: DataFrame, key: str) -> DataFrame:
    """One ALS half-sweep: per-`key` normal equations from exact integer
    sums (partial-aggregated map-side — the shuffle carries 5 longs per
    key per partition), then the closed-form 2x2 Cramer solve."""
    ag = side.groupBy(key).agg(
        (F.lit(_ALS_LAM_S2) + F.sum(F.col("f1") * F.col("f1"))).alias("a11"),
        F.sum(F.col("f1") * F.col("f2")).alias("a12"),
        (F.lit(_ALS_LAM_S2) + F.sum(F.col("f2") * F.col("f2"))).alias("a22"),
        (F.lit(_ALS_S) * F.sum(F.col("r") * F.col("f1"))).alias("b1"),
        (F.lit(_ALS_S) * F.sum(F.col("r") * F.col("f2"))).alias("b2"),
    )

    def d(c):
        return F.col(c).cast("decimal(38,0)")

    s = F.lit(_ALS_S).cast("decimal(38,0)")
    den = d("a11") * d("a22") - d("a12") * d("a12")
    n1 = s * (d("a22") * d("b1") - d("a12") * d("b2"))
    n2 = s * (d("a11") * d("b2") - d("a12") * d("b1"))
    return ag.select(
        key,
        _als_fdiv_clamp(n1, den).alias("x1"),
        _als_fdiv_clamp(n2, den).alias("x2"),
    )


@query(
    "ml_als_fixed_point",
    oracle=f"""
        WITH ratings AS (
            SELECT o.o_custkey AS u, l.l_suppkey AS it,
                   LEAST(COUNT(*), {_ALS_RCAP}) AS r
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey, l.l_suppkey
        ), vinit AS (
            SELECT it,
                   10 + CAST('0x' || substr(md5(CAST(it AS VARCHAR) || ':v1'),
                                            1, 15) AS BIGINT) % 100 AS f1,
                   10 + CAST('0x' || substr(md5(CAST(it AS VARCHAR) || ':v2'),
                                            1, 15) AS BIGINT) % 100 AS f2
            FROM (SELECT DISTINCT it FROM ratings)
        ), ua AS (
            SELECT u,
                   {_ALS_LAM_S2} + SUM(f1 * f1) AS a11,
                   SUM(f1 * f2) AS a12,
                   {_ALS_LAM_S2} + SUM(f2 * f2) AS a22,
                   {_ALS_S} * SUM(r * f1) AS b1,
                   {_ALS_S} * SUM(r * f2) AS b2
            FROM ratings JOIN vinit USING (it) GROUP BY u
        ), usol AS ({_ALS_SOLVE_SQL.format(key="u", src="ua")}
        ), ufac AS (
            SELECT u, {_ALS_FDIV.format(n="n1")} AS u1,
                      {_ALS_FDIV.format(n="n2")} AS u2
            FROM usol
        ), ib AS (
            SELECT it,
                   {_ALS_LAM_S2} + SUM(u1 * u1) AS a11,
                   SUM(u1 * u2) AS a12,
                   {_ALS_LAM_S2} + SUM(u2 * u2) AS a22,
                   {_ALS_S} * SUM(r * u1) AS b1,
                   {_ALS_S} * SUM(r * u2) AS b2
            FROM ratings JOIN ufac USING (u) GROUP BY it
        ), isol AS ({_ALS_SOLVE_SQL.format(key="it", src="ib")}
        ), ifac AS (
            SELECT it, {_ALS_FDIV.format(n="n1")} AS w1,
                       {_ALS_FDIV.format(n="n2")} AS w2
            FROM isol
        ), cand AS (
            SELECT f.u, g.it, f.u1 * g.w1 + f.u2 * g.w2 AS s
            FROM ufac f CROSS JOIN ifac g
            WHERE f.u % 50 = 0
              AND NOT EXISTS (SELECT 1 FROM ratings x
                              WHERE x.u = f.u AND x.it = g.it)
        ), ranked AS (
            SELECT u, it, s,
                   ROW_NUMBER() OVER (PARTITION BY u
                                      ORDER BY s DESC, it) AS rk
            FROM cand
        )
        SELECT u AS custkey, CAST(rk AS INT) AS rk, it AS suppkey,
               CAST(s AS BIGINT) AS score_s2
        FROM ranked WHERE rk <= 5
    """,
    tags=("ml", "iterative"),
)
def ml_als_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS, hash-verified: rank-2 factorization of the customer x
    supplier purchase matrix — one full alternation (users solved
    against md5-seeded item factors, items re-solved against the user
    factors) in 1/100-fixed-point integers, then the production query's
    recommend step: top-5 UNSEEN suppliers per every-50th customer by
    exact integer score u . w, ties broken by suppkey.

    The production ml_als_recommend (pyspark.ml blocked ALS, rows-only
    by necessity) keeps its float solver and convergence loop; this twin
    hash-verifies the normal-equations core in BOTH directions — the
    per-entity (F^T F + lambda I, F^T r) accumulation and the 2x2 Cramer
    solve, the parts a distributed ALS gets wrong (partial aggregation
    of the Gram sums, the ridge term, the solve's division) — plus the
    unseen-filter and deterministic-ranking of the recommend step.

    Scale shape: each half-sweep is ONE key-partitioned join (items:
    broadcast, dimension-sized; users: shuffle on u — the exact shape of
    a blocked-ALS sweep) + one partial-aggregated groupBy carrying 5
    longs per entity; the recommend step broadcasts the item-factor
    table under the sampled users and anti-joins the seen pairs —
    candidate volume is sampled-users x items, the honest recommend-all
    cost. Driver traffic: zero (no collect anywhere). Ratings are
    localCheckpointed once (used by both sweeps and the anti-join)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ratings = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_suppkey").alias("it"))
        .agg(F.least(F.count("*"), F.lit(_ALS_RCAP)).alias("r"))
        .localCheckpoint(eager=True)
    )
    vinit = (
        ratings.select("it")
        .distinct()
        .select(
            "it",
            _als_hash(F.col("it"), ":v1").alias("f1"),
            _als_hash(F.col("it"), ":v2").alias("f2"),
        )
    )
    # ufac has TWO consumers (the item half-sweep's join and the sampled
    # recommend step); uncached, each re-ran the ratings⋈vinit join plus
    # the user-keyed solve aggregate (guide §3.3 reuse-beats-recompute).
    # persist, not localCheckpoint: the bench evicts it right after.
    ufac = (
        _als_solve(
            ratings.join(F.broadcast(vinit), "it").select("u", "r", "f1", "f2"),
            "u",
        )
        .withColumnsRenamed({"x1": "u1", "x2": "u2"})
        .transform(track_persist)
    )
    ifac = _als_solve(
        ratings.join(ufac, "u").select(
            "it", "r", F.col("u1").alias("f1"), F.col("u2").alias("f2")
        ),
        "it",
    ).withColumnsRenamed({"x1": "w1", "x2": "w2"})
    cand = (
        ufac.filter(F.col("u") % 50 == 0)
        .crossJoin(F.broadcast(ifac))
        .join(ratings.select("u", "it"), ["u", "it"], "left_anti")
        .select(
            "u",
            "it",
            (F.col("u1") * F.col("w1") + F.col("u2") * F.col("w2")).alias("s"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy(F.col("s").desc(), F.col("it").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("u").alias("custkey"),
            F.col("rk").cast("int").alias("rk"),
            F.col("it").alias("suppkey"),
            F.col("s").cast("bigint").alias("score_s2"),
        )
    )


# ---------------------------------------------------------------------------
# k-means, fixed-point: 2 unrolled Lloyd rounds, k=4, over embeddings
# quantized to integers (q = floor(x * 1000) — one IEEE multiply of the
# exactly-widened float32 and a floor, both correctly rounded, so the
# engines agree bit-for-bit before any clustering math starts). Seeds
# are the 4 vectors with the smallest (md5(vec_id), vec_id) — the
# bottom-k twin's deterministic hash-rank sample. Assignment distance is
# exact integer SSE; ties break toward the lower centroid id; the
# centroid update is an exact per-dim floor division (remainder
# subtraction, the ALS twin's spelling), and an EMPTY cluster keeps its
# previous centroid (both engines, same CASE). The production variant
# (operators/kmeans.py: BLAS per Arrow batch, k-means++ init,
# run-to-convergence) stays the fast path; this twin hash-verifies the
# Lloyd core — assign, recompute, re-assign — including the
# empty-cluster branch.
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_Q = 1000  # quantization scale for the float32 dims
_KM_DIST_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
)


def _km_quant(col):
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * _KM_Q).cast("bigint")
    )


def _km_dist(qv, cv):
    return F.aggregate(
        F.zip_with(qv, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _km_assign(vectors: DataFrame, cents: DataFrame, cid_out: str) -> DataFrame:
    """Map-side Lloyd assignment: the k=4 centroid table collapses to a
    ONE-ROW array of (cid, cv) structs, broadcast under the vectors, and
    argmin is array_min over per-centroid (dist, cid) structs — zero
    shuffle, the plan-native analog of the production kernel's BLAS
    scoring against driver-broadcast centroids."""
    one = cents.groupBy().agg(
        F.collect_list(F.struct(F.col("cid"), F.col("cv"))).alias("cs")
    )
    best = F.array_min(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                _km_dist(F.col("qv"), c["cv"]).alias("dist"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return vectors.crossJoin(F.broadcast(one)).select(
        "vec_id",
        "qv",
        best["cid"].alias(cid_out),
        best["dist"].alias("dist"),
    )


@query(
    "ml_kmeans_fixed_point",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT))
                       AS qv
            FROM embeddings
        ), seeds AS (
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                       AS INT) - 1 AS cid,
                   qv AS cv
            FROM q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= {_KM_K}
        ), a1 AS (
            SELECT vec_id, qv, cid,
                   {_KM_DIST_SQL.format(a="qv", b="cv")} AS dist
            FROM q CROSS JOIN seeds
        ), b1 AS (
            SELECT vec_id, qv, cid AS cid1
            FROM a1
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) = 1
        ), upd AS (
            SELECT cid1 AS cid, di.i AS di,
                   COUNT(*) AS n, SUM(qv[di.i]) AS s
            FROM b1, LATERAL (SELECT unnest(range(1, 65)) AS i) di
            GROUP BY cid1, di.i
        ), newc AS (
            SELECT s.cid,
                   CASE WHEN NOT EXISTS (SELECT 1 FROM upd u
                                         WHERE u.cid = s.cid)
                        THEN s.cv
                        ELSE (SELECT list(CAST(
                                  (u.s - ((u.s % u.n + u.n) % u.n)) // u.n
                                  AS BIGINT) ORDER BY u.di)
                              FROM upd u WHERE u.cid = s.cid)
                   END AS cv
            FROM seeds s
        ), a2 AS (
            SELECT vec_id, cid,
                   {_KM_DIST_SQL.format(a="qv", b="cv")} AS dist
            FROM q CROSS JOIN newc
        ), b2 AS (
            SELECT vec_id, cid AS cid2, dist
            FROM a2
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) = 1
        ), stats AS (
            SELECT cid2 AS cid, CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(dist) AS BIGINT) AS wcss
            FROM b2 GROUP BY cid2
        )
        SELECT n.cid, COALESCE(st.n_members, 0) AS n_members,
               COALESCE(st.wcss, 0) AS wcss,
               CAST(list_reduce(list_transform(n.cv, x -> abs(x)),
                                (x, y) -> x + y) AS BIGINT) AS centroid_l1
        FROM newc n LEFT JOIN stats st USING (cid)
    """,
    tags=("ml", "iterative"),
)
def ml_kmeans_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means, hash-verified: two unrolled Lloyd rounds (assign →
    recompute → re-assign) with k=4 over the embeddings table, entirely
    in quantized-integer arithmetic — exact SSE distances, ties to the
    lower centroid id, exact floor-division centroid means, empty
    clusters keeping their previous centroid. Emits per centroid the
    round-2 membership count, the exact integer within-cluster SSE
    (which pins BOTH assignments and the recomputed centroids — any
    divergence anywhere changes it) and the updated centroid's L1 norm.

    The production k-means (operators/kmeans.py) keeps BLAS scoring and
    k-means++ init; this twin hash-verifies the Lloyd core the same way
    ml_als_fixed_point verifies the ALS normal equations.

    Scale shape: each assignment is a MAP-SIDE pass — the k-centroid
    table collapses to one broadcast row of (cid, cv) structs and argmin
    is array_min over a per-row struct array, zero shuffle, exactly the
    production kernel's broadcast-centroids shape. The update is one
    partial-aggregated groupBy carrying 64 longs + a count per cluster
    per partition. Driver traffic: zero (centroids move plan-to-plan as
    one-row DataFrames, never collected)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _km_quant(F.col("embedding")).alias("qv"))
    from pyspark.sql import Window

    wh = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    seeds = (
        q.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= _KM_K)
        .select((F.col("rn") - 1).cast("int").alias("cid"), F.col("qv").alias("cv"))
    )
    b1 = _km_assign(q, seeds, "cid1")
    upd = b1.groupBy("cid1").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.element_at("qv", d + 1)).alias(f"s{d}")
            for d in range(64)
        ],
    )
    sumarr = F.array(*[F.col(f"s{d}") for d in range(64)])
    n = F.col("n")
    newc = (
        seeds.join(upd, seeds["cid"] == upd["cid1"], "left")
        .select(
            "cid",
            F.when(n.isNull(), F.col("cv"))
            .otherwise(
                F.transform(
                    sumarr,
                    lambda s: ((s - F.pmod(s, n)) / n).cast("bigint"),
                )
            )
            .alias("cv"),
        )
        .localCheckpoint(eager=True)  # round boundary: used by assign AND output
    )
    b2 = _km_assign(q, newc, "cid2")
    stats = b2.groupBy("cid2").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("dist").cast("bigint").alias("wcss"),
    )
    return (
        newc.join(stats, newc["cid"] == stats["cid2"], "left")
        .select(
            "cid",
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
            F.coalesce("wcss", F.lit(0)).alias("wcss"),
            F.aggregate(
                F.transform(F.col("cv"), lambda x: F.abs(x)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("centroid_l1"),
        )
    )


# ---------------------------------------------------------------------------
# PQ-ADC, hash-verified: the asymmetric-distance-computation mechanics
# of product quantization — 8 subspaces x 16 codewords over the 64-dim
# quantized embeddings, codewords md5-derived integers in [-300, 300]
# (the quantized data's own range) so BOTH engines hold the identical
# codebook without training. The production vec_pq_adc_search
# (llm_vectors.py) k-means-trains its codebooks and is rows-only +
# recall-floor-checked; this twin pins what a broken ADC silently gets
# wrong — the per-subspace argmin ENCODE (ties to the lower code), the
# probe's 8x16 LOOKUP TABLE, and the table-sum SCAN — to exact integer
# arithmetic.
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_C = 16  # codewords per subspace
_PQ_D = 8  # dims per subspace

_PQ_CW_SQL = (
    "((CAST('0x' || substr(md5(CAST({m} AS VARCHAR) || ':' ||"
    " CAST({c} AS VARCHAR) || ':' || CAST({d} AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 601) - 300)"
)
_PQ_SUBDIST_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
)


def _pq_codeword(m, c, d):
    return (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            m.cast("string"),
                            F.lit(":"),
                            c.cast("string"),
                            F.lit(":"),
                            d.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(601),
        )
        - 300
    )


@query(
    "vec_pq_adc_verified",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT))
                       AS qv
            FROM embeddings
        ), cb AS (
            SELECT m.m, c.c,
                   list({_PQ_CW_SQL.format(m="m.m", c="c.c", d="d.d")}
                        ORDER BY d.d) AS w
            FROM (SELECT unnest(range({_PQ_M})) AS m) m,
                 (SELECT unnest(range({_PQ_C})) AS c) c,
                 (SELECT unnest(range({_PQ_D})) AS d) d
            GROUP BY m.m, c.c
        ), sub AS (
            SELECT vec_id, m.m,
                   list_slice(qv, m.m * {_PQ_D} + 1,
                              m.m * {_PQ_D} + {_PQ_D}) AS sv
            FROM q, (SELECT unnest(range({_PQ_M})) AS m) m
        ), enc AS (
            SELECT vec_id, m, c AS code
            FROM (
                SELECT s.vec_id, s.m, cb.c,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.vec_id, s.m
                           ORDER BY {_PQ_SUBDIST_SQL.format(a="s.sv", b="cb.w")},
                                    cb.c) AS rn
                FROM sub s JOIN cb ON cb.m = s.m
            ) WHERE rn = 1
        ), probe AS (
            SELECT vec_id FROM q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) = 1
        ), tbl AS (
            SELECT s.m, cb.c,
                   {_PQ_SUBDIST_SQL.format(a="s.sv", b="cb.w")} AS t
            FROM sub s JOIN probe p ON s.vec_id = p.vec_id
            JOIN cb ON cb.m = s.m
        ), adc AS (
            SELECT e.vec_id, CAST(SUM(t.t) AS BIGINT) AS adc_dist
            FROM enc e JOIN tbl t ON t.m = e.m AND t.c = e.code
            WHERE e.vec_id != (SELECT vec_id FROM probe)
            GROUP BY e.vec_id
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc_dist, vec_id) AS INT)
                   AS rk,
               vec_id, adc_dist
        FROM adc
        QUALIFY rk <= 10
    """,
    tags=("vectors", "ann"),
)
def vec_pq_adc_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC nearest neighbors, hash-verified: every vector encodes to
    8 4-bit codes (per-subspace argmin against a fixed md5-derived
    16-codeword book, ties to the lower code), the hash-rank-1 probe
    builds its 8x16 ADC lookup table, and candidates score as the exact
    integer table-sum over their codes — top-10 by (adc_dist, vec_id).
    All integers end to end: the codebook, the quantized dims, the
    subspace SSEs and the ADC sums replay bit-exactly in DuckDB,
    including PQ's own quantization error (the adc_dist VALUES are part
    of the checked hash, not just the neighbor ids).

    The production vec_pq_adc_search (llm_vectors.py:718) trains its
    codebooks with k-means and is rows-only + recall-floor-checked; this
    twin hash-verifies the ADC machinery itself.

    Scale shape: encode is a broadcast join against the 128-row codebook
    + one partial min-struct aggregate per (vector, subspace); the probe
    table is 128 rows broadcast into the scan-side lookup join; the
    top-10 is a TakeOrdered-style bounded sort. 8 codes per vector on
    the shuffle — the 8-byte-codes property that makes PQ the honest
    disk-scale ANN."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _km_quant(F.col("embedding")).alias("qv"))
    ms = spark.range(_PQ_M).select(F.col("id").alias("m"))
    cb = (
        spark.range(_PQ_M * _PQ_C)
        .select(
            (F.col("id") / _PQ_C).cast("bigint").alias("m"),
            F.pmod(F.col("id"), F.lit(_PQ_C)).alias("c"),
        )
        .select(
            "m",
            "c",
            F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_D - 1)),
                lambda d: _pq_codeword(F.col("m"), F.col("c"), d),
            ).alias("w"),
        )
    )
    sub = q.crossJoin(F.broadcast(ms)).select(
        "vec_id",
        "m",
        F.slice(
            F.col("qv"), F.col("m").cast("int") * _PQ_D + 1, _PQ_D
        ).alias("sv"),
    )
    subdist = F.aggregate(
        F.zip_with(F.col("sv"), F.col("w"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    enc = (
        sub.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "c", subdist.alias("sd"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("sd", "c")).alias("best"))
        .select("vec_id", "m", F.col("best.c").alias("code"))
    )
    from pyspark.sql import Window

    wh = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    probe = (
        q.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("probe_id"), "qv")
    )
    tbl = (
        probe.crossJoin(F.broadcast(ms))
        .select(
            "probe_id",
            "m",
            F.slice(
                F.col("qv"), F.col("m").cast("int") * _PQ_D + 1, _PQ_D
            ).alias("sv"),
        )
        .join(F.broadcast(cb), "m")
        # tm/tc: distinct names on the lookup-table side — enc and tbl
        # both descend from `ms`, and joining same-named columns that
        # trace to one DataFrame leans on Spark's self-join dataset-id
        # disambiguation (fragile across versions; triggers the
        # "trivially true predicate" warning).
        .select(
            "probe_id",
            F.col("m").alias("tm"),
            F.col("c").alias("tc"),
            subdist.alias("t"),
        )
    )
    adc = (
        enc.join(
            F.broadcast(tbl),
            (F.col("m") == F.col("tm")) & (F.col("code") == F.col("tc")),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("vec_id")
        .agg(F.sum("t").cast("bigint").alias("adc_dist"))
    )
    wr = Window.orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 10)
        .select(F.col("rk").cast("int").alias("rk"), "vec_id", "adc_dist")
    )


# ---------------------------------------------------------------------------
# MMR, hash-verified: three unrolled greedy selections over a bounded
# hash-deterministic candidate pool. The production vec_mmr_diversify
# (analytics_ext.py) runs the greedy loop driver-side over its bounded
# 50 x dim candidate block on float cosines and is rows-only +
# independent-MMR-pytest checked; this twin pins the greedy CORE — the
# selected-set diversity penalty (distance to the NEAREST selected
# item), the relevance/diversity trade in the score, and the
# (score desc, vec_id) argmax tiebreak — to exact integer arithmetic on
# the quantized embeddings. Relevance is -d2(i, probe) and the penalty
# min_{j in S} d2(i, j), i.e. lambda = 1/2 MMR up to the positive scale
# both engines share.
# ---------------------------------------------------------------------------

_MMR_POOL = 6


def _mmr_d2_sql(a: str, b: str) -> str:
    return _KM_DIST_SQL.format(a=a, b=b)


@query(
    "vec_mmr_fixed_steps",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT))
                       AS qv
            FROM embeddings
        ), probe AS (
            SELECT vec_id, qv FROM q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) = 1
        ), pool AS (
            SELECT c.vec_id, c.qv,
                   {_mmr_d2_sql("c.qv", "p.qv")} AS d2p
            FROM q c, probe p
            WHERE c.vec_id != p.vec_id
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY {_mmr_d2_sql("c.qv", "p.qv")}, c.vec_id)
                <= {_MMR_POOL}
        ), s1 AS (
            SELECT vec_id, qv, d2p FROM pool
            QUALIFY ROW_NUMBER() OVER (ORDER BY d2p, vec_id) = 1
        ), r2 AS (
            SELECT c.vec_id, c.qv, c.d2p,
                   {_mmr_d2_sql("c.qv", "s.qv")} - c.d2p AS score
            FROM pool c, s1 s WHERE c.vec_id != s.vec_id
        ), s2 AS (
            SELECT vec_id, qv, d2p, score FROM r2
            QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) = 1
        ), r3 AS (
            SELECT c.vec_id,
                   LEAST({_mmr_d2_sql("c.qv", "a.qv")},
                         {_mmr_d2_sql("c.qv", "b.qv")}) - c.d2p AS score
            FROM pool c, s1 a, s2 b
            WHERE c.vec_id != a.vec_id AND c.vec_id != b.vec_id
        ), s3 AS (
            SELECT vec_id, score FROM r3
            QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) = 1
        )
        SELECT 1 AS step, vec_id, -d2p AS mmr_score FROM s1
        UNION ALL SELECT 2, vec_id, score FROM s2
        UNION ALL SELECT 3, vec_id, score FROM s3
    """,
    tags=("vectors", "rerank"),
)
def vec_mmr_fixed_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking, hash-verified: probe = the hash-rank-1 vector;
    pool = its {_MMR_POOL} nearest candidates by exact integer SSE
    (TakeOrderedAndProject); then THREE unrolled greedy picks — step 1
    pure relevance (min d2 to probe), steps 2-3 maximize
    (distance to the nearest already-selected item) - (distance to the
    probe), ties toward the lower vec_id. Emits (step, vec_id,
    mmr_score) with scores part of the checked hash.

    Scale shape: the only data-sized work is the pool selection (one
    map-side distance column + a bounded top-k); every greedy step is a
    join between the <= {_MMR_POOL}-row pool and 1-row selection frames
    (broadcast). The production variant keeps its driver-side numpy
    greedy over the same bounded-block shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _km_quant(F.col("embedding")).alias("qv"))
    from pyspark.sql import Window

    wh = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    probe = (
        q.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("pid"), F.col("qv").alias("pqv"))
    )
    pool = (
        q.crossJoin(F.broadcast(probe))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "vec_id", "qv", _km_dist(F.col("qv"), F.col("pqv")).alias("d2p")
        )
        .orderBy(F.col("d2p").asc(), F.col("vec_id").asc())
        .limit(_MMR_POOL)
        .localCheckpoint(eager=True)  # <= 6 rows, reused by all 3 steps
    )
    s1 = pool.orderBy(F.col("d2p").asc(), F.col("vec_id").asc()).limit(1)
    sel1 = s1.select(
        F.col("vec_id").alias("v1"), F.col("qv").alias("qv1")
    )
    r2 = (
        pool.crossJoin(F.broadcast(sel1))
        .filter(F.col("vec_id") != F.col("v1"))
        .select(
            "vec_id",
            "qv",
            "d2p",
            (_km_dist(F.col("qv"), F.col("qv1")) - F.col("d2p")).alias(
                "score"
            ),
        )
    )
    s2 = r2.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(1)
    sel2 = s2.select(
        F.col("vec_id").alias("v2"), F.col("qv").alias("qv2")
    )
    r3 = (
        pool.crossJoin(F.broadcast(sel1))
        .crossJoin(F.broadcast(sel2))
        .filter(
            (F.col("vec_id") != F.col("v1"))
            & (F.col("vec_id") != F.col("v2"))
        )
        .select(
            "vec_id",
            (
                F.least(
                    _km_dist(F.col("qv"), F.col("qv1")),
                    _km_dist(F.col("qv"), F.col("qv2")),
                )
                - F.col("d2p")
            ).alias("score"),
        )
    )
    s3 = r3.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(1)
    one = F.lit(1).cast("int")
    return (
        s1.select(one.alias("step"), "vec_id", (-F.col("d2p")).alias("mmr_score"))
        .unionByName(
            s2.select(
                F.lit(2).cast("int").alias("step"), "vec_id",
                F.col("score").alias("mmr_score"),
            )
        )
        .unionByName(
            s3.select(
                F.lit(3).cast("int").alias("step"), "vec_id",
                F.col("score").alias("mmr_score"),
            )
        )
    )


# ---------------------------------------------------------------------------
# IVF, hash-verified: inverted-file ANN over the quantized embeddings —
# 4 hash-rank coarse cells, nprobe=2, exact integer rerank inside the
# probed cells. The production sign-LSH / IVF / ML-LSH searchers
# (llm_vectors.py) are recall-checked; this twin pins the IVF CONTRACT
# itself — cell assignment, the probe's nearest-cells choice, and the
# cell-bounded candidate set (a vector OUTSIDE the probed cells must
# never appear, even if it is the true nearest neighbor: the recall
# trade is part of the checked hash, exactly like the CMS overcounts).
# ---------------------------------------------------------------------------

_IVF_NPROBE = 2
_IVF_TOPK = 5


@query(
    "vec_ivf_verified",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT))
                       AS qv
            FROM embeddings
        ), cents AS (
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                       AS INT) - 1 AS cid,
                   qv AS cv
            FROM q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= {_KM_K}
        ), assign AS (
            SELECT vec_id, qv, cid AS cell
            FROM (
                SELECT c.vec_id, c.qv, k.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.vec_id
                           ORDER BY {_KM_DIST_SQL.format(a="c.qv", b="k.cv")},
                                    k.cid) AS rn
                FROM q c CROSS JOIN cents k
            ) WHERE rn = 1
        ), probe AS (
            SELECT vec_id, qv FROM q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) = 1
        ), probe_cells AS (
            SELECT k.cid
            FROM cents k, probe p
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY {_KM_DIST_SQL.format(a="p.qv", b="k.cv")}, k.cid)
                <= {_IVF_NPROBE}
        ), cand AS (
            SELECT a.vec_id, a.cell,
                   {_KM_DIST_SQL.format(a="a.qv", b="p.qv")} AS d2
            FROM assign a
            JOIN probe_cells pc ON a.cell = pc.cid
            CROSS JOIN probe p
            WHERE a.vec_id != p.vec_id
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY d2, vec_id) AS INT) AS rk,
               vec_id, cell, d2
        FROM cand
        QUALIFY rk <= {_IVF_TOPK}
    """,
    tags=("vectors", "ann"),
)
def vec_ivf_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nearest neighbors, hash-verified: every vector assigns to its
    nearest of 4 hash-rank coarse cells (exact integer SSE, ties to the
    lower cell id); the hash-rank-1 probe searches only its nprobe=2
    nearest cells; candidates rerank by exact integer distance, top-5 by
    (d2, vec_id). The emitted rows carry the cell id and the exact d2,
    so the checked hash pins assignment, cell choice, the cell-bounded
    candidate set (missing a cross-cell true neighbor is CORRECT IVF
    behavior and part of the contract) and the rerank order.

    The production IVF searcher (llm_vectors.py:171) k-means-trains its
    cells and is recall-floor-checked; this twin hash-verifies the
    inverted-file mechanics. Scale shape: assignment is the k-means
    twin's map-side broadcast-centroid pass; the probed-cell filter is a
    broadcast semi-join on a 2-row cell list — candidate volume is
    cell-bounded (the IVF point); the top-5 is a bounded TakeOrdered."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _km_quant(F.col("embedding")).alias("qv"))
    from pyspark.sql import Window

    wh = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    cents = (
        q.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= _KM_K)
        .select(
            (F.col("rn") - 1).cast("int").alias("cid"),
            F.col("qv").alias("cv"),
        )
    )
    assign = _km_assign(q, cents, "cell").select("vec_id", "qv", "cell")
    probe = (
        q.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("pid"), F.col("qv").alias("pqv"))
    )
    probe_cells = (
        cents.crossJoin(F.broadcast(probe))
        .select("cid", _km_dist(F.col("pqv"), F.col("cv")).alias("cd2"))
        .orderBy(F.col("cd2").asc(), F.col("cid").asc())
        .limit(_IVF_NPROBE)
        .select(F.col("cid").alias("cell"))
    )
    cand = (
        assign.join(F.broadcast(probe_cells), "cell")
        .crossJoin(F.broadcast(probe))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "vec_id", "cell", _km_dist(F.col("qv"), F.col("pqv")).alias("d2")
        )
    )
    wr = Window.orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _IVF_TOPK)
        .select(F.col("rk").cast("int").alias("rk"), "vec_id", "cell", "d2")
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation, hash-verified: recall@10 of the derandomized IVF
# search against exact integer brute force, at 1 and 2 probes, for the 3
# hash-rank probe queries. The production vec_ann_recall (llm_vectors.py)
# evaluates the k-means-trained IVF on float cosines and is rows-only +
# recall-floor/monotonicity-pytest checked; this twin (VERDICT r9 task 7)
# pins the EVAL harness itself — the exact top-10 ground truth, the
# probe-prefix fanout, the cell-bounded approximate top-10, and the
# hit-set intersection — to integers both engines replay bit-exactly,
# including the recall loss (a cross-cell true neighbor missing from the
# 1-probe arm is part of the checked hash, the vec_ivf_verified idiom).
# ---------------------------------------------------------------------------

_ANNR_QUERIES = 3
_ANNR_K = 10
_ANNR_PROBES = (1, 2)


@query(
    "vec_ann_recall_verified",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT))
                       AS qv
            FROM embeddings
        ), cents AS (
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                       AS INT) - 1 AS cid,
                   qv AS cv
            FROM q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= {_KM_K}
        ), assign AS (
            SELECT vec_id, qv, cid AS cell
            FROM (
                SELECT c.vec_id, c.qv, k.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.vec_id
                           ORDER BY {_KM_DIST_SQL.format(a="c.qv", b="k.cv")},
                                    k.cid) AS rn
                FROM q c CROSS JOIN cents k
            ) WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS qid, qv AS pqv FROM q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                <= {_ANNR_QUERIES}
        ), exact AS (
            SELECT p.qid, a.vec_id
            FROM assign a CROSS JOIN probes p
            WHERE a.vec_id != p.qid
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY p.qid
                ORDER BY {_KM_DIST_SQL.format(a="a.qv", b="p.pqv")},
                         a.vec_id) <= {_ANNR_K}
        ), pcells AS (
            SELECT p.qid, k.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.qid
                       ORDER BY {_KM_DIST_SQL.format(a="p.pqv", b="k.cv")},
                                k.cid) AS crn
            FROM cents k CROSS JOIN probes p
        ), fan AS (
            SELECT qid, np.n AS n_probes, cid
            FROM pcells, (SELECT unnest([{", ".join(map(str, _ANNR_PROBES))}])
                          AS n) np
            WHERE crn <= np.n
        ), approx AS (
            SELECT f.qid, f.n_probes, a.vec_id
            FROM assign a
            JOIN fan f ON a.cell = f.cid
            JOIN probes p ON p.qid = f.qid
            WHERE a.vec_id != f.qid
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY f.qid, f.n_probes
                ORDER BY {_KM_DIST_SQL.format(a="a.qv", b="p.pqv")},
                         a.vec_id) <= {_ANNR_K}
        ), base AS (
            SELECT p.qid, np.n AS n_probes
            FROM probes p, (SELECT unnest([{", ".join(map(str, _ANNR_PROBES))}])
                            AS n) np
        ), ec AS (
            SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY qid
        ), hits AS (
            SELECT ap.qid, ap.n_probes, COUNT(*) AS n_hit
            FROM approx ap
            JOIN exact e ON e.qid = ap.qid AND e.vec_id = ap.vec_id
            GROUP BY ap.qid, ap.n_probes
        )
        SELECT b.qid, CAST(b.n_probes AS INT) AS n_probes,
               COALESCE(ec.n_exact, 0) AS n_exact,
               COALESCE(h.n_hit, 0) AS n_hit
        FROM base b
        LEFT JOIN ec ON ec.qid = b.qid
        LEFT JOIN hits h ON h.qid = b.qid AND h.n_probes = b.n_probes
    """,
    tags=("vectors", "ann", "eval"),
)
def vec_ann_recall_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall@10 evaluation, hash-verified: for each of the 3
    hash-rank probe queries, the EXACT integer top-10 (brute force over
    the quantized embeddings) is intersected with the derandomized-IVF
    top-10 at nprobe=1 and nprobe=2 (hash-rank coarse cells, ties to the
    lower cid — vec_ivf_verified's contract), emitting (qid, n_probes,
    n_exact, n_hit). All integers: the checked hash pins the ground
    truth, the probe-prefix fanout, the cell-bounded candidate set AND
    the measured recall loss itself — more probes can only add
    candidates, so n_hit is monotone in n_probes by construction in both
    engines.

    Scale shape: assignment is the map-side broadcast-centroid pass
    (k=4 rows); the exact arm broadcasts 3 probe rows under the corpus
    scan (linear, the cost any recall eval must pay once per corpus);
    the approx arm joins a broadcast <=2-cell-per-(probe, arm) fanout;
    both top-10s are bounded window ranks; the final join is
    probe-count-sized. Zero driver traffic, no data-sized product."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _km_quant(F.col("embedding")).alias("qv"))
    from pyspark.sql import Window

    wh = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    ranked = q.withColumn("rn", F.row_number().over(wh))
    cents = ranked.filter(F.col("rn") <= _KM_K).select(
        (F.col("rn") - 1).cast("int").alias("cid"), F.col("qv").alias("cv")
    )
    assign = _km_assign(q, cents, "cell").select("vec_id", "qv", "cell")
    probes = ranked.filter(F.col("rn") <= _ANNR_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("pqv")
    )
    wq = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact = (
        assign.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _km_dist(F.col("qv"), F.col("pqv")).alias("d2"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _ANNR_K)
        .select("qid", "vec_id")
    )
    wc = Window.partitionBy("qid").orderBy(F.col("cd2").asc(), F.col("cid").asc())
    pcells = (
        cents.crossJoin(F.broadcast(probes))
        .select("qid", "cid", _km_dist(F.col("pqv"), F.col("cv")).alias("cd2"))
        .withColumn("crn", F.row_number().over(wc))
    )
    nps = F.explode(F.array(*[F.lit(n) for n in _ANNR_PROBES])).alias("n_probes")
    fan = (
        pcells.select("qid", "cid", "crn")
        .select("qid", "cid", "crn", nps)
        .filter(F.col("crn") <= F.col("n_probes"))
        .select("qid", "n_probes", F.col("cid").alias("cell"))
    )
    wa = Window.partitionBy("qid", "n_probes").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    approx = (
        assign.join(F.broadcast(fan), "cell")
        .join(F.broadcast(probes), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "n_probes", "vec_id",
            _km_dist(F.col("qv"), F.col("pqv")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= _ANNR_K)
        .select("qid", "n_probes", "vec_id")
    )
    base = probes.select("qid").select("qid", nps)
    ec = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    hits = (
        approx.join(exact, ["qid", "vec_id"])
        .groupBy("qid", "n_probes")
        .agg(F.count("*").alias("n_hit"))
    )
    zero = F.lit(0).cast("bigint")
    return (
        base.join(F.broadcast(ec), "qid", "left")
        .join(F.broadcast(hits), ["qid", "n_probes"], "left")
        .select(
            "qid",
            F.col("n_probes").cast("int").alias("n_probes"),
            F.coalesce("n_exact", zero).alias("n_exact"),
            F.coalesce("n_hit", zero).alias("n_hit"),
        )
    )
