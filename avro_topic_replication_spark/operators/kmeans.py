"""Distributed Lloyd's k-means over the embedding column.

The canonical driver-coordinated iterative shape (identical to MLlib's):
per iteration ONE distributed pass assigns every vector to its nearest
centroid and reduces per-cluster sums; only the k×dim centroid matrix
(tiny) ever reaches the driver, which broadcasts it back inside the
assignment UDF closure for the next pass.

Assignment is an Arrow-batched pandas UDF doing a single n×d @ d×k
matrix multiply per batch — the k·d dot products per row stay in BLAS
instead of k interpreted Catalyst folds (measured 4-6× faster at
sf0.1). Centroid update is a posexplode + groupBy(cluster, dim) average
— JVM-native with map-side partial aggregation, so each executor emits
at most k×dim partial rows regardless of data size.

At 100 TB nothing changes: the per-iteration cost is one scan + one
k×dim-sized aggregation; centroids remain driver-side metadata exactly
like a broadcast-join build side.

Reference parity: none (the reference has no compute); [EXT] — supports
the IVF ANN path (vec_ivf_search) with learned instead of seeded cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _assign(df: DataFrame, cents: np.ndarray) -> DataFrame:
    """Add `cluster` (argmin ||x-c||²) and `dist2` columns from the k×dim
    centroid matrix — one BLAS matmul per Arrow batch, no Python per row."""
    C = np.ascontiguousarray(cents, dtype=np.float64)
    half_sq = (C * C).sum(axis=1) / 2.0  # k

    @pandas_udf("struct<cluster: int, dist2: double>")
    def nearest(emb: pd.Series) -> pd.DataFrame:
        X = np.stack(emb.to_numpy()).astype(np.float64)  # n×d
        scores = X @ C.T - half_sq  # n×k: dot - ||c||²/2
        cl = scores.argmax(axis=1)
        best = scores[np.arange(len(cl)), cl]
        # ||x-c||² = ||x||² - 2·(dot - ||c||²/2)
        d2 = (X * X).sum(axis=1) - 2.0 * best
        return pd.DataFrame({"cluster": cl.astype(np.int32), "dist2": d2})

    a = df.withColumn("_a", nearest("embedding"))
    return a.select(*df.columns, F.col("_a.cluster").alias("cluster"), F.col("_a.dist2").alias("dist2"))


def _kmeanspp_seed(vectors: DataFrame, k: int, sample_cap: int = 2048) -> np.ndarray:
    """k-means++ seeding over a deterministic hash-sample of the corpus.

    The sample (≤ sample_cap rows — bounded driver fetch, like a broadcast
    build side; at 100 TB the same cap holds because seeding quality needs
    a representative sample, not the population) is drawn RNG-free with
    the engine's md5-threshold idiom so it is reproducible under any
    partitioning; the D² seeding walk runs in numpy with a fixed seed."""
    n = vectors.count()
    frac_bits = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
    keep = frac_bits.cast("long") % F.lit(max(n // sample_cap, 1)) == 0
    sample = vectors.filter(keep).select("embedding").collect()
    X = np.array([r["embedding"] for r in sample], dtype=np.float64)

    rng = np.random.default_rng(20240303)
    cents = [X[int(rng.integers(len(X)))]]
    for _ in range(1, k):
        d2 = np.min(
            ((X[:, None, :] - np.array(cents)[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        s = d2.sum()
        if s <= 0:
            # every sampled point duplicates an existing centroid; a uniform
            # draw here could only repeat a seed (guaranteed empty cluster),
            # so stop with the distinct seeds found — Lloyd's runs with
            # len(cents) clusters
            break
        cents.append(X[int(rng.choice(len(X), p=d2 / s))])
    return np.array(cents, dtype=np.float64)


def kmeans(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = 8,
    iters: int = 5,
    init: str = "first-k",
) -> tuple[DataFrame, list[float], np.ndarray]:
    """Run Lloyd's iterations; return (assignments, inertia history,
    final k×dim centroid matrix).

    ``vectors`` needs columns (vec_id, embedding). init="first-k" (the
    default) seeds with the first k vectors by vec_id — deterministic and
    free. init="kmeans++" seeds by D² sampling over a bounded hash-sample
    (_kmeanspp_seed); measured on this near-uniform synthetic corpus it
    converges to the same inertia within 0.5% (463.6 vs 465.4 at sf0.01),
    so the cheaper deterministic seed stays default — on genuinely
    clustered corpora the D² walk is the init that avoids empty/split
    clusters and is worth the extra sampling pass."""
    if init == "kmeans++":
        cents = _kmeanspp_seed(vectors, k)
    else:
        first = (
            vectors.orderBy("vec_id").limit(k).select("embedding").collect()
        )  # k×dim parameter fetch
        cents = np.array([r["embedding"] for r in first], dtype=np.float64)

    inertia: list[float] = []
    assigned = _assign(vectors, cents)
    for _ in range(iters):
        # one distributed pass: per-cluster component sums + counts + inertia
        stats = (
            assigned.select(
                "cluster", "dist2", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("v").cast("double")).alias("s"),
                F.count("*").alias("n"),
                F.sum(F.col("dist2")).alias("d2"),
            )
            .collect()
        )  # k×dim rows — centroid-matrix-sized, not data-sized
        new_cents = cents.copy()
        for r in stats:
            new_cents[r["cluster"], r["dim"]] = r["s"] / r["n"]
        # dist2 is replicated across the dim explode; count it at dim 0 only
        inertia.append(float(sum(r["d2"] for r in stats if r["dim"] == 0)))
        cents = new_cents
        assigned = _assign(vectors, cents)
    return assigned.select("vec_id", "cluster", "dist2"), inertia, cents
