"""Distributed Lloyd's k-means over the embedding column.

The canonical driver-coordinated iterative shape (identical to MLlib's):
per iteration ONE distributed pass assigns every vector to its nearest
centroid and reduces per-cluster sums; only the k×dim centroid matrix
(tiny) ever reaches the driver, which broadcasts it back as literals for
the next pass. Assignment distance runs as codegen column expressions
(unit-ish vectors → nearest = max dot product); centroid update is a
posexplode + groupBy average — a single shuffle keyed by (cluster, dim).

At 100 TB nothing changes: the per-iteration cost is one scan + one
k×dim-sized aggregation; centroids remain driver-side metadata exactly
like a broadcast-join build side.

Reference parity: none (the reference has no compute); [EXT] — supports
the IVF ANN path (vec_ivf_search) with learned instead of seeded cells.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _assign(df: DataFrame, cents: np.ndarray) -> DataFrame:
    """Add `cluster` (argmin ||x-c||² == argmax dot - ½||c||²) and `dist2`
    columns from literal centroids — pure codegen, no Python per row."""
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def dot_lit(vec: np.ndarray):
        lit_v = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with(emb, lit_v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )

    sq_norm = F.aggregate(
        F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    cluster = F.lit(0)
    c0 = cents[0]
    best_score = dot_lit(c0) - float(c0 @ c0) / 2.0
    for i in range(1, len(cents)):
        ci = cents[i]
        score = dot_lit(ci) - float(ci @ ci) / 2.0
        cluster = F.when(score > best_score, F.lit(i)).otherwise(cluster)
        best_score = F.greatest(score, best_score)
    # ||x-c||² = ||x||² - 2·(dot - ||c||²/2)
    return df.withColumn("cluster", cluster).withColumn(
        "dist2", sq_norm - 2.0 * best_score
    )


def kmeans(
    spark: SparkSession, vectors: DataFrame, k: int = 8, iters: int = 5
) -> tuple[DataFrame, list[float]]:
    """Run Lloyd's iterations; return (assignments, inertia history).

    ``vectors`` needs columns (vec_id, embedding). Init = the first k
    vectors by vec_id (deterministic; k-means++ would drop in here)."""
    init = (
        vectors.orderBy("vec_id").limit(k).select("embedding").collect()
    )  # k×dim parameter fetch
    cents = np.array([r["embedding"] for r in init], dtype=np.float64)

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
    return assigned.select("vec_id", "cluster", "dist2"), inertia
