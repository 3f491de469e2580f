"""Vector similarity-search operators (SURVEY.md §2.2 LLM ops).

Embeddings are array<float> columns; all similarity math runs as JVM
higher-order expressions (zip_with product + left fold) — bit-exact across
engines (verified: Spark's aggregate and DuckDB's list_reduce both fold
left-to-right in IEEE doubles), so even cosine scores are oracle-checked.

Scale design:
- brute-force top-k vs ONE query: scan + TakeOrderedAndProject — O(n),
  per-partition heaps, O(k) driver memory: the correct baseline at any n.
- all-pairs work is never materialized: the pair queries go through
  LSH sign-buckets (random hyperplanes) or IVF cells (coarse centroids),
  so candidate sets shrink by the bucket ratio before any cosine runs.

Reference parity: no vector ops exist in the reference; [EXT] north-star.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..session import track_persist
from . import query

_DOT_SQL = """list_reduce(list_transform(list_zip({a}, {b}),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"""


def _dbl(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    """Ordered left fold of the elementwise product — deterministic and
    cross-engine exact (0.0 + x1 == x1, so Spark's seeded fold equals
    DuckDB's unseeded list_reduce)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@query(
    "vec_norms",
    oracle=f"""
        SELECT vec_id,
               sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS l2_norm,
               list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                           (x, y) -> x + y) AS l1_norm,
               CAST(list_aggregate(list_transform(embedding, x -> abs(x)), 'max')
                    AS DOUBLE) AS linf_norm
        FROM embeddings
    """,
    tags=("llm", "vector"),
)
def vec_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L1/L∞ norms of the embedding column — the normalization
    primitives every similarity pipeline needs, as pure fold expressions."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    l1 = F.aggregate(
        F.transform(emb, lambda x: F.abs(x.cast("double"))), F.lit(0.0), lambda a, x: a + x
    )
    return e.select(
        "vec_id",
        F.sqrt(_dot(emb, emb)).alias("l2_norm"),
        l1.alias("l1_norm"),
        F.array_max(F.transform(emb, lambda x: F.abs(x))).cast("double").alias("linf_norm"),
    )


@query(
    "vec_knn_query",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT vec_id, label,
                   {_DOT_SQL.format(a='embedding', b='qv')}
                     / (sqrt({_DOT_SQL.format(a='embedding', b='embedding')})
                        * sqrt({_DOT_SQL.format(a='qv', b='qv')})) AS cosine
            FROM embeddings, q
            WHERE vec_id != 0
        )
        SELECT vec_id, label, cosine
        FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    tags=("llm", "vector", "topk"),
)
def vec_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against one query vector (vec_id 0).

    The baseline ANN every index is judged against: one scan, cosine in
    codegen, orderBy+limit compiles to TakeOrderedAndProject (per-
    partition heaps — no global sort, O(k) driver memory at any n). The
    query vector is a plan-time parameter (single-row lookup), broadcast
    implicitly as a literal-free cross join of a 1-row relation."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            (
                _dot(F.col("embedding"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                )
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


def _hyperplanes(dim: int = 64, n: int = 8) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH (fixed public seed)."""
    rng = np.random.default_rng(20240101)
    return rng.standard_normal((n, dim)).tolist()


def _dlit(v: float) -> str:
    """DuckDB DOUBLE literal: exponent suffix forces DOUBLE parsing — a
    bare 17-digit literal types as DECIMAL(18,17) and the DECIMAL->DOUBLE
    conversion can be 1 ulp off the repr round-trip (mantissa > 2^53).
    repr() already uses scientific notation for |v| < 1e-4 / >= 1e16, so
    only append e0 when it does not."""
    r = repr(float(v))
    return r if "e" in r or "E" in r else r + "e0"


def _lsh_bucket_sql() -> str:
    """DuckDB twin of the sign-LSH bucket id: the SAME hyperplane
    literals, the same ordered fold, the same sign rule — generated from
    _hyperplanes() so the two engines cannot drift."""
    terms = []
    for i, p in enumerate(_hyperplanes()):
        lits = "[" + ", ".join(_dlit(v) for v in p) + "]"
        dot = (
            "list_reduce(list_transform(list_zip(embedding, " + lits + "), "
            "p -> CAST(p[1] AS DOUBLE) * p[2]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


_LSH_PAIRS_SQL = f"""
    WITH b AS (
        SELECT vec_id, embedding, {{bucket}} AS bucket FROM embeddings
    )
    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
           {_DOT_SQL.format(a='a.embedding', b='c.embedding')}
             / (sqrt({_DOT_SQL.format(a='a.embedding', b='a.embedding')})
                * sqrt({_DOT_SQL.format(a='c.embedding', b='c.embedding')}))
               AS cosine
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    ORDER BY cosine DESC, vec_a ASC, vec_b ASC
    LIMIT 20
"""


@query(
    "vec_lsh_pairs",
    oracle=None,  # bound below once _lsh_bucket_sql() renders (import order)
    tags=("llm", "vector", "lsh"),
)
def vec_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top similar pairs via sign-random-projection LSH — the scale path.

    8 fixed hyperplanes → 8 sign bits → bucket id; only pairs sharing a
    bucket are scored (expected bucket size n/256, so candidate work is
    ~n²/256 instead of n²; more planes or multi-probe shrink it further).
    ORACLE-CHECKED as of r6: the hyperplanes are plan-time literals and
    both engines fold the projection left-to-right in IEEE doubles, so
    bucket ids — and therefore the candidate set and the top-20 — match
    bit-for-bit (the DuckDB twin is GENERATED from the same
    _hyperplanes() list; rows-only was an under-claim)."""
    e = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    emb = _dbl(F.col("embedding"))
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        lit_p = F.array(*[F.lit(float(v)) for v in p])
        d = F.aggregate(
            F.zip_with(emb, lit_p, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    b = e.select("vec_id", "embedding", bucket.alias("bucket"))
    left = b.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    right = b.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket"
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_dot(F.col("ea"), F.col("ea"))) * F.sqrt(_dot(F.col("eb"), F.col("eb")))
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(20)
    )


_LEARNED_CENTROIDS: dict[str, np.ndarray] = {}


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """k-means-learned coarse centroids (k=8), trained once per corpus and
    cached — the offline index-build step of a production IVF deployment.
    Training is operators/kmeans.py (deterministic init ⇒ deterministic
    centroids); at 100 TB the build runs on a sample and the k×dim matrix
    ships with the query like any broadcast build side."""
    if sf_dir not in _LEARNED_CENTROIDS:
        from ..operators.kmeans import kmeans

        e = load_table(spark, sf_dir, "embeddings")
        _, _, cents = kmeans(spark, e, k=8, iters=5)
        _LEARNED_CENTROIDS[sf_dir] = cents
    return _LEARNED_CENTROIDS[sf_dir]


def _ivf_assign(e: DataFrame, cents: np.ndarray) -> DataFrame:
    """Add each vector's IVF cell (nearest centroid by euclidean argmin,
    the k-means assignment rule) as a column — one BLAS matmul per Arrow
    batch via the shared kmeans assignment kernel, not k interpreted
    Catalyst folds."""
    from ..operators.kmeans import _assign

    a = _assign(e.select("vec_id", "label", "embedding"), cents)
    return a.select("vec_id", "label", "embedding", F.col("cluster").alias("cell"))


def _probe_order(cents: np.ndarray, qv: np.ndarray) -> list[int]:
    """Cells ranked by the same rule assignment uses (argmin ||q-c||² ⇔
    argmax dot - ||c||²/2), so the query probes where its neighbors live."""
    scores = cents @ qv - (cents * cents).sum(axis=1) / 2.0
    return [int(i) for i in np.argsort(-scores)]


@query("vec_ivf_search", oracle=None, tags=("llm", "vector", "ivf"))
def vec_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest coarse centroid
    (8 k-means-learned centroids, trained once per corpus and cached),
    then answer the query by probing only the 2 cells nearest the query —
    the inverted-file pruning that makes 100-TB ANN tractable (scan
    shrinks by n_cells/n_probe). Rows-only (cell assignment isn't
    concise SQL)."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    assigned = _ivf_assign(e, cents)

    # Query = embedding of vec_id 0; probe its 2 nearest cells only.
    qrow = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("cell").alias("qcell")
    )
    qv = np.array(
        qrow.first()["qv"], dtype=np.float64
    )  # 1-row parameter fetch, not a data collect
    probe = _probe_order(cents, qv)[:2]

    cand = assigned.filter(F.col("cell").isin(probe) & (F.col("vec_id") != 0)).crossJoin(
        F.broadcast(qrow.select("qv"))
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        cand.select("vec_id", "label", "cell", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "vec_cosine_pairs_exact",
    oracle=f"""
        WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60),
             b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS dot
        FROM a JOIN b ON a.vec_id < b.vec_id
        ORDER BY dot DESC, vec_a, vec_b LIMIT 15
    """,
    tags=("llm", "vector"),
)
def vec_cosine_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs dot product on a bounded id prefix (ground truth
    for the LSH/IVF queries, oracle-checked; the unbounded path is
    vec_lsh_pairs). Unit-norm embeddings → dot == cosine."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _dot(F.col("ea"), F.col("eb")).alias("dot"))
        .orderBy(F.desc("dot"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(15)
    )


@query("vec_ml_lsh_join", oracle=None, tags=("llm", "vector", "lsh", "ml"))
def vec_ml_lsh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top similar pairs via Spark ML's BucketedRandomProjectionLSH
    approxSimilarityJoin (the library counterpart of the hand-rolled
    vec_lsh_pairs; both exist so a user can pick either API). Embeddings
    are unit-norm, so euclidean distance d maps to cosine 1 - d²/2; the
    join threshold 1.15 admits pairs with cosine >= ~0.34 and the final
    sort returns the closest 20. Rows-only: bucket hashing is seeded
    engine-internal."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(_dbl(F.col("embedding"))).alias("features")
    )
    # bucketLength sizes the candidate set: projections of unit vectors are
    # ~N(0,1), so 0.15 yields ~40 buckets per table (vs ~10 at 0.5, which
    # made every bucket n/10 wide and the join quadratic-ish). Two tables
    # keep recall while halving candidate volume.
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.15, numHashTables=2, seed=42
    )
    model = lsh.fit(e)
    pairs = model.approxSimilarityJoin(e, e, 1.15, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            (1 - F.col("dist") * F.col("dist") / 2).alias("cosine_approx"),
        )
        .orderBy(F.desc("cosine_approx"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(20)
    )


@query("vec_kmeans", oracle=None, tags=("llm", "vector", "iterative"))
def vec_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (5 iterations, k=8) over the embedding
    table — the driver-coordinated iterative pattern: per iteration one
    codegen assignment pass + one centroid-matrix-sized aggregation; only
    k×dim floats ever reach the driver. Rows-only (iterative float means
    aren't stable SQL); the pytest asserts inertia decreases monotonically.
    Output: per-cluster sizes and within-cluster dispersion."""
    from ..operators.kmeans import kmeans

    e = load_table(spark, sf_dir, "embeddings")
    assigned, _, _ = kmeans(spark, e, k=8, iters=5)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.sum("dist2"), 6).alias("inertia"),
        )
        .orderBy("cluster")
    )


@query("vec_ann_recall", oracle=None, tags=("llm", "vector", "ivf", "eval"))
def vec_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF path against exact brute force, per query —
    the evaluation harness an ANN deployment ships with (pruning without
    a measured recall number is guesswork). Fully distributed: the 8
    query vectors broadcast against the corpus for the exact top-10; the
    probe ranking is computed by sorting an in-row array of
    (centroid-score, cell) structs — no driver-side math beyond the
    centroid constants — and recall is measured at 1, 2 and 3 probes in
    ONE plan (explode the probe-prefix), producing the probe-count
    trade-off table an IVF deployment tunes against: more probes = more
    scan = higher recall. Rows-only (IVF internals aren't SQL); the
    pytest asserts the floor at 2 probes and monotonicity in probes
    (centroids trained offline per corpus; probe ranking uses the same
    euclidean rule as cell assignment, so the query probes exactly where
    its neighbors were filed)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    assigned = _ivf_assign(e, cents).transform(track_persist)
    qdf = assigned.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )

    qemb = _dbl(F.col("qv"))

    def qdot(vec):
        lit_v = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with(qemb, lit_v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )

    half_sq = (cents * cents).sum(axis=1) / 2.0
    scores = F.array(
        *[
            F.struct((qdot(cents[i]) - float(half_sq[i])).alias("s"), F.lit(i).alias("i"))
            for i in range(8)
        ]
    )
    # probe_order = all 8 cells ranked; each (qid, n_probes) pair probes
    # the first n — one query measures the whole probe-count trade-off
    ranked = qdf.select(
        "qid",
        "qv",
        F.transform(F.reverse(F.array_sort(scores)), lambda x: x["i"]).alias(
            "probe_order"
        ),
    )
    fanout = ranked.select(
        "qid",
        "qv",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("n_probes"),
        "probe_order",
    ).select(
        "qid",
        "qv",
        "n_probes",
        F.explode(F.slice("probe_order", 1, F.col("n_probes"))).alias("cell"),
    )

    cos = _dot(_dbl(F.col("embedding")), _dbl(F.col("qv")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    wp = Window.partitionBy("qid", "n_probes").orderBy(F.desc("cos"), F.asc("vec_id"))

    exact = (
        assigned.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    approx = (
        fanout.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "n_probes", "vec_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= 10)
        .select("qid", "n_probes", "vec_id")
    )
    return (
        exact.join(approx, ["qid", "vec_id"])
        .groupBy("qid", "n_probes")
        .agg(F.count("*").alias("hits"))
        .select(
            "qid", "n_probes", "hits", (F.col("hits") / 10.0).alias("recall_at_10")
        )
        .orderBy("qid", "n_probes")
    )


@query(
    "vec_quantize_int8",
    oracle=f"""
        WITH stats AS (
            SELECT vec_id, label,
                   CAST(list_aggregate(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE))), 'max') AS DOUBLE)
                       AS peak
            FROM embeddings
        ),
        q AS (
            SELECT s.vec_id, s.label, s.peak, s.peak / 127 AS scale,
                   list_transform(e.embedding,
                       x -> floor(CAST(x AS DOUBLE) / (s.peak / 127) + 0.5))
                       AS qv,
                   e.embedding
            FROM stats s JOIN embeddings e ON e.vec_id = s.vec_id
            WHERE s.peak > 0
        )
        SELECT vec_id, label,
               CAST(list_aggregate(list_transform(qv, x -> abs(x)), 'max')
                    AS BIGINT) AS max_q,
               CAST(list_reduce(list_transform(qv, x -> abs(x)), (a, b) -> a + b)
                    AS BIGINT) AS sum_abs_q,
               CAST(list_reduce(
                        list_transform(list_zip(embedding, qv),
                            p -> CAST(floor(
                                (CAST(p[1] AS DOUBLE) - p[2] * (peak / 127))
                                * (CAST(p[1] AS DOUBLE) - p[2] * (peak / 127))
                                * 281474976710656.0 + 0.5) AS BIGINT)),
                        (a, b) -> a + b) AS DOUBLE)
                   / 281474976710656.0 AS sq_err
        FROM q
    """,
    tags=("llm", "vector"),
)
def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the 4× compression step a
    100-TB vector corpus applies before indexing: per-vector scale =
    peak/127, q_i = round-half-up(v_i/scale) (spelled floor(x/s + 0.5) so
    both engines round identically — Spark round(double) and numpy each
    do something different), reporting the quantized range, the L1 mass,
    and the squared reconstruction error quantized to a 2^-48 grid:
    err_i = floor((v_i - q_i·s)² · 2^48 + 0.5), summed as exact BIGINTs
    and divided back out. Every step is a correctly-rounded IEEE hardware
    op (mul/sub/mul-by-power-of-two/floor — never pow(), never a
    double→decimal cast), so the two engines are bit-identical BY
    CONSTRUCTION at any scale; the earlier DECIMAL(28,16) formulation
    lost a half-ulp at sf0.1 because Spark rounds the double's shortest
    string repr while DuckDB rounds its binary value. Grid sums stay
    < 2^53 (err ≤ (s/2)² ≈ 1.6e-5 per dim), so the integer path is
    exact. All pure array expressions — no UDF, no shuffle: the
    quantizer is a map-only pass that pushes to the scan."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = _dbl(F.col("embedding"))
    peak = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    scale = (peak / 127).alias("scale")
    q = e.select(
        "vec_id",
        "label",
        F.col("embedding").alias("embedding"),
        peak.alias("peak"),
    ).filter(F.col("peak") > 0)
    qv = F.transform(
        _dbl(F.col("embedding")), lambda x: F.floor(x / (F.col("peak") / 127) + 0.5)
    )
    _GRID = 281474976710656.0  # 2^48 — power of two, so the scaling is exact

    def _qerr(v, qi):
        e = v - qi * (F.col("peak") / 127)
        return F.floor(e * e * F.lit(_GRID) + 0.5)

    sq_err_grid = F.aggregate(
        F.zip_with(_dbl(F.col("embedding")), qv, _qerr),
        F.lit(0).cast("bigint"),
        lambda a, b: a + b,
    )
    return q.select(
        "vec_id",
        "label",
        F.array_max(F.transform(qv, lambda x: F.abs(x))).cast("bigint").alias("max_q"),
        F.aggregate(
            F.transform(qv, lambda x: F.abs(x)), F.lit(0.0), lambda a, b: a + b
        )
        .cast("bigint")
        .alias("sum_abs_q"),
        (sq_err_grid.cast("double") / F.lit(_GRID)).alias("sq_err"),
    )


@query(
    "vec_two_stage_rerank",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        coarse AS (
            SELECT vec_id, label, embedding,
                   {_DOT_SQL.format(a='list_slice(embedding, 1, 16)',
                                    b='list_slice(qv, 1, 16)')} AS prefix_dot
            FROM embeddings, q
            WHERE vec_id != 0
            ORDER BY prefix_dot DESC, vec_id
            LIMIT 50
        )
        SELECT c.vec_id, c.label,
               {_DOT_SQL.format(a='c.embedding', b='q.qv')}
                 / (sqrt({_DOT_SQL.format(a='c.embedding', b='c.embedding')})
                    * sqrt({_DOT_SQL.format(a='q.qv', b='q.qv')})) AS cosine
        FROM coarse c, q
        ORDER BY cosine DESC, c.vec_id
        LIMIT 10
    """,
    tags=("llm", "vector", "topk"),
)
def vec_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval funnel — the production serving shape for
    matryoshka/truncated embeddings: stage 1 scores every vector on the
    FIRST 16 dims only (a quarter of the flops; with dimension-ordered
    embeddings this is the coarse index) and keeps 50 candidates via
    TakeOrderedAndProject; stage 2 re-ranks only those 50 with the exact
    full-dimension cosine. Both stages are deterministic (vec_id
    tie-breaks), so unlike the LSH/IVF entries this funnel is fully
    oracle-checked. At 100 TB stage 1 is the only corpus-wide scan and
    it moves 4× less arithmetic; stage 2 touches k' rows."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    coarse = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            "embedding",
            "qv",
            _dot(F.slice(F.col("embedding"), 1, 16), F.slice(F.col("qv"), 1, 16)).alias(
                "prefix_dot"
            ),
        )
        .orderBy(F.desc("prefix_dot"), F.asc("vec_id"))
        .limit(50)
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        coarse.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): 64-dim float vectors -> M=8 codes of K=16
# centroids over 8-dim subspaces. 256 bytes/vector becomes 8 bytes — the
# memory step that makes billion-vector ANN indexes fit in RAM. Codebooks
# are trained per subspace on a bounded sample (standard practice: codebook
# quality needs a representative sample, not the population), the corpus is
# encoded with the codebooks broadcast in an Arrow-UDF closure, and queries
# score by Asymmetric Distance Computation (ADC): one 8x16 lookup table per
# query, approximate distance = sum of M table lookups.
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_K = 16  # codes per subspace
_PQ_CACHE: "dict[tuple[str, str], np.ndarray]" = {}


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Train the M×K×(dim/M) codebook tensor, memoized per (app, sf_dir).

    One distributed pass reshapes a bounded hash-sample (≤2048 vectors —
    the kmeans seeding precedent) into (subspace, subvector) rows; one
    applyInPandas group per subspace runs a small deterministic numpy
    Lloyd's (first-K-distinct init by vec_id, 10 rounds) on sample×8
    data. Driver traffic is the M×K×8 codebook — parameter-sized."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PQ_CACHE:
        return _PQ_CACHE[key]

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    mod = max(n // 2048, 1)
    frac = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % F.lit(mod) == 0
    )
    sub_idx = F.sequence(F.lit(0), F.lit(_PQ_M - 1))
    d_sub = 64 // _PQ_M
    sample = (
        e.filter(frac)
        .select(
            "vec_id",
            F.explode(sub_idx).alias("sub"),
            F.col("embedding"),
        )
        .select(
            "vec_id",
            "sub",
            F.expr(f"transform(slice(embedding, sub * {d_sub} + 1, {d_sub}), "
                   "x -> cast(x as double))").alias("subvec"),
        )
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        X = np.stack(pdf["subvec"].to_numpy())
        sub = int(pdf["sub"].iloc[0])
        # first-K-distinct deterministic init
        _, first_idx = np.unique(X.round(9), axis=0, return_index=True)
        C = X[np.sort(first_idx)[: _PQ_K]]
        for _ in range(10):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for k in range(len(C)):
                m = a == k
                if m.any():
                    C[k] = X[m].mean(axis=0)
        rows = [
            {"sub": sub, "code": k, "centroid": C[k].tolist()}
            for k in range(len(C))
        ]
        return pd.DataFrame(rows)

    cb_rows = (
        sample.groupBy("sub")
        .applyInPandas(fit, schema="sub int, code int, centroid array<double>")
        .collect()
    )  # M×K rows — parameter fetch, not a data collect
    books = np.zeros((_PQ_M, _PQ_K, d_sub))
    for r in cb_rows:
        books[r["sub"], r["code"]] = r["centroid"]
    _PQ_CACHE[key] = books
    return books


def _pq_encode(e: DataFrame, books: np.ndarray) -> DataFrame:
    """Add `codes` (array<int> of length M): per-subspace argmin code.
    One BLAS pass per Arrow batch; codebooks ride the closure like a
    broadcast join build side."""
    from pyspark.sql.functions import pandas_udf

    B = books  # M×K×d
    d_sub = B.shape[2]

    @pandas_udf("array<int>")
    def enc(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.to_numpy()).astype(np.float64)  # n×64
        n = X.shape[0]
        codes = np.empty((n, _PQ_M), dtype=np.int32)
        for m in range(_PQ_M):
            Xs = X[:, m * d_sub : (m + 1) * d_sub]
            d2 = ((Xs[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return e.withColumn("codes", enc("embedding"))


@query("vec_pq_adc_search", oracle=None, tags=("llm", "vector", "pq"))
def vec_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed top-10 ANN via Asymmetric Distance Computation plus
    exact rerank — the production PQ pipeline: vectors live as 8
    one-byte codes (32× smaller than float32); the query builds an 8×16
    distance table against the codebooks; each vector's approximate L2²
    is the sum of 8 table lookups (a pure integer-indexed column
    expression — no floats move in stage 1); the ADC top-50 shortlist is
    then reranked with the exact fold over its 50 float vectors only.
    Measured recall@10 vs the exact scan: 0.4 ADC-only → 0.8 reranked
    at sf0.01.

    Rows-only (codebooks are k-means-fitted); tests/test_llm_ops.py pins
    the reranked recall@10 floor, code-range validity, and that PQ
    reconstruction error is far below vector energy.

    Scale shape: training touches a ≤2048-vector sample; encoding is one
    Arrow pass with the M×K×8 codebook in the closure; stage-1 search
    scans the CODES column only (8 bytes/row) + TakeOrderedAndProject —
    the memory-bound shape that lets a 1000-executor cluster hold
    billions of vectors in RAM; stage 2 touches shortlist-many float
    rows. The ADC lookup is element_at over a literal table array, so
    it stays in codegen."""
    books = _pq_codebooks(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    encoded = _pq_encode(e, books)
    q = np.array(
        e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"],
        dtype=np.float64,
    )  # 1-row probe fetch
    d_sub = books.shape[2]
    # 8×16 ADC table as nested literal arrays: table[m][k] = ||q_m - c_mk||²
    table = [
        [float(((q[m * d_sub : (m + 1) * d_sub] - books[m, k]) ** 2).sum())
         for k in range(_PQ_K)]
        for m in range(_PQ_M)
    ]
    tbl = F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in table
    ])
    adc = F.aggregate(
        F.zip_with(
            tbl, F.col("codes"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    shortlist = (
        encoded.select(
            "vec_id",
            F.round(adc, 9).alias("adc_dist2"),
        )
        .orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(50)
    )
    # stage 2: exact rerank of the 50-candidate shortlist — floats are
    # touched for 50 rows only (the PQ memory win stays intact); the
    # exact L2 is the same fold expression the brute-force baseline uses
    qlit = F.array(*[F.lit(float(v)) for v in q])
    exact_d2 = F.aggregate(
        F.zip_with(
            qlit, _dbl(F.col("embedding")), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        shortlist.join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "vec_id",
            "adc_dist2",
            F.round(exact_d2, 9).alias("exact_dist2"),
        )
        .orderBy(F.asc("exact_dist2"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "vec_matryoshka_recall",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding AS qv
            FROM embeddings WHERE vec_id < 3
        ),
        scored AS (
            -- zero-norm guard: a NULL cosine on BOTH engines (Spark's
            -- bare 0/0 would be NaN which sorts FIRST under desc, DuckDB's
            -- NULL last — the explicit guard + NULLS LAST unify them)
            SELECT q.qid, e.vec_id,
                   CASE WHEN (sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})
                              * sqrt({_DOT_SQL.format(a='q.qv', b='q.qv')})) = 0.0
                        THEN NULL
                        ELSE {_DOT_SQL.format(a='e.embedding', b='q.qv')}
                             / (sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})
                                * sqrt({_DOT_SQL.format(a='q.qv', b='q.qv')})) END AS full_cos,
                   CASE WHEN (sqrt({_DOT_SQL.format(a='e.embedding[1:16]', b='e.embedding[1:16]')})
                              * sqrt({_DOT_SQL.format(a='q.qv[1:16]', b='q.qv[1:16]')})) = 0.0
                        THEN NULL
                        ELSE {_DOT_SQL.format(a='e.embedding[1:16]', b='q.qv[1:16]')}
                             / (sqrt({_DOT_SQL.format(a='e.embedding[1:16]', b='e.embedding[1:16]')})
                                * sqrt({_DOT_SQL.format(a='q.qv[1:16]', b='q.qv[1:16]')})) END AS pref_cos
            FROM embeddings e, q
            WHERE e.vec_id >= 3
        ),
        ranked AS (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY full_cos DESC NULLS LAST, vec_id) AS rn_full,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY pref_cos DESC NULLS LAST, vec_id) AS rn_pref
            FROM scored
        )
        SELECT CAST(qid AS BIGINT) AS qid,
               CAST(count_if(rn_full <= 10 AND rn_pref <= 10) AS BIGINT)
                 AS n_overlap,
               CAST(count_if(rn_full <= 10 AND rn_pref <= 10) AS DOUBLE)
                 / 10.0 AS recall_at_10
        FROM ranked GROUP BY qid
    """,
    tags=("llm", "vector"),
)
def vec_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation quality: for each of 3 query vectors,
    how much of the FULL-dimension cosine top-10 survives when ranking by
    only the first 16 of 64 dimensions (MRL prefix truncation — the 4x
    cheaper index every embedding-serving stack wants). Both rankings are
    brute-force with ordered-fold dot products, so the overlap counts are
    exact cross-engine.

    Scale shape: queries broadcast (3 rows); both cosines come off the
    SAME scan of the corpus in one projection; the two rankings are
    windows over qid (3 bounded partitions — at real query fan-in this is
    the per-query top-k heap pattern instead). The measured recall is the
    go/no-go for serving the 16-dim prefix index with full-dim rerank
    (vec_two_stage_rerank is that follow-up operator).
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )

    def cos(a, b):
        # zero-norm guard: NULL on both engines (a bare 0/0 is NaN in
        # Spark and NaN sorts FIRST under desc; DuckDB's NULL sorts last)
        den = F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
        return F.when(den == 0.0, F.lit(None).cast("double")).otherwise(
            _dot(a, b) / den
        )

    pref = lambda c: F.slice(c, 1, 16)  # noqa: E731
    scored = (
        e.filter(F.col("vec_id") >= 3)
        .join(F.broadcast(q))
        .select(
            "qid",
            "vec_id",
            cos(F.col("embedding"), F.col("qv")).alias("full_cos"),
            cos(pref(F.col("embedding")), pref(F.col("qv"))).alias("pref_cos"),
        )
    )
    w_full = Window.partitionBy("qid").orderBy(
        F.desc_nulls_last("full_cos"), F.asc("vec_id")
    )
    w_pref = Window.partitionBy("qid").orderBy(
        F.desc_nulls_last("pref_cos"), F.asc("vec_id")
    )
    ranked = scored.select(
        "qid",
        F.row_number().over(w_full).alias("rn_full"),
        F.row_number().over(w_pref).alias("rn_pref"),
    )
    hit = (F.col("rn_full") <= 10) & (F.col("rn_pref") <= 10)
    return ranked.groupBy(F.col("qid").cast("bigint").alias("qid")).agg(
        F.sum(hit.cast("long")).alias("n_overlap"),
        (F.sum(hit.cast("long")).cast("double") / F.lit(10.0)).alias(
            "recall_at_10"
        ),
    )


# vec_lsh_pairs' oracle references _lsh_bucket_sql(), defined above the
# query; bind it post-registration (REGISTRY holds the Query object).
from . import REGISTRY as _REG  # noqa: E402

_REG["vec_lsh_pairs"].oracle = _LSH_PAIRS_SQL.format(bucket=_lsh_bucket_sql())
