"""Distributed PageRank over an edge list (iterative link analysis).

The centrality primitive beside connected components (queries/llm_dedup
clustering): rank mass flows along out-edges each round with damping,
until the rank vector stabilizes. Implemented exactly like the other
iterative operators in this repo (dedup_clusters, kmeans, BPE):

- per round: ONE join of ranks onto the edge list + one groupBy(dst) —
  both hash-shuffles on node keys, partial-aggregated map-side;
- dangling nodes' mass is redistributed uniformly (a 1-value aggregate,
  not a collect of data);
- ``localCheckpoint`` per round truncates the lineage that would
  otherwise double per iteration;
- the only driver-sized values are the dangling-mass scalar and the
  convergence delta.

At 100 TB the same loop runs with the edge list pre-partitioned
(bucketed) on src so the per-round join is co-located; rounds are
O(diameter-ish) for convergence at fixed tolerance.

Reference parity: none (the reference has no graph surface); [EXT]
north-star per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank over ``edges(src, dst, weight)``; returns (node, rank).

    Weights are normalized per src (transition probabilities). Ranks are
    initialized uniform at 1/n and renormalized each round so the total
    mass stays exactly 1 (dangling redistribution).

    The rank loop narrows ``shuffle.partitions`` to 8 for its duration
    (restored on exit): per-round state is node-table-sized, so at 32
    partitions task overhead dominates — the same narrowing
    dedup_clusters and run_to_memory use. A cluster run sizes this to
    nodes/partition-target instead."""
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _pagerank_loop(spark, edges, damping, iters)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def _pagerank_loop(
    spark: SparkSession, edges: DataFrame, damping: float, iters: int
) -> DataFrame:
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar: node count (plan-time, one job)
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_mass"))
        )
        # checkpoint FIRST, then take the renormalization scalar from the
        # checkpointed data — one materializing action per round, the
        # 1-value agg and the next round's join both reuse it
        new_ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        # dangling mass: renormalize so total rank stays exactly 1
        total = new_ranks.agg(F.sum("rank")).collect()[0][0]
        ranks = new_ranks.select(
            "node", (F.col("rank") / F.lit(float(total))).alias("rank")
        )
    return ranks
