"""Distributed PageRank over an edge list (iterative link analysis).

The centrality primitive beside connected components (queries/llm_dedup
clustering): rank mass flows along out-edges each round with damping,
for a fixed iteration count. Implemented exactly like the other
iterative operators in this repo (dedup_clusters, kmeans, BPE):

- per round: ONE join of ranks onto the edge list + one groupBy(dst) —
  both hash-shuffles on node keys, partial-aggregated map-side;
- dangling nodes' mass is redistributed UNIFORMLY (the textbook
  definition): dangling mass is derived from a 1-value aggregate of the
  round's contributions, never a collect of data;
- ``localCheckpoint`` per round truncates the lineage that would
  otherwise double per iteration;
- the only driver-sized value is the per-round dangling-mass scalar.

At 100 TB the same loop runs with the edge list pre-partitioned
(bucketed) on src so the per-round join is co-located; the iteration
count trades accuracy for rounds (a production run adds an L1-delta
stop on top, one more scalar per round).

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
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank over ``edges(src, dst, weight)``; returns (node, rank).

    Weights are normalized per src (transition probabilities); ranks
    start uniform at 1/n; each round every node receives the teleport
    share (1-d)/n plus d·(its in-flow + the uniform share of dangling
    mass), so total mass stays 1 by construction. The loop runs at most
    ``iters`` rounds and stops early when the L1 delta
    Σ|rank_t - rank_(t-1)| drops below ``tol``. The delta probe is a
    scalar over the already-checkpointed node-sized frame, but even a
    tiny extra job costs ~0.5 s at toy scale, so it runs every 5th
    round only (and never after the final round) — fixed-round runs pay
    zero probe overhead, long convergence runs stop within 5 rounds of
    converging. Pass ``tol=0`` to disable probing entirely. An EMPTY
    edge list yields an empty result with the caller's node type (no
    graph → no ranks), not an error.

    The input edge plan is materialized ONCE up front (localCheckpoint,
    at the session's shuffle width — the edge build may be fact-sized);
    only the node-sized rank loop then runs under a narrowed
    ``shuffle.partitions`` of 8, where task overhead would otherwise
    dominate (the dedup_clusters / run_to_memory narrowing). A cluster
    run sizes the loop width to nodes/partition-target instead."""
    edges = edges.localCheckpoint(eager=True)  # fact-sized build runs once
    if not edges.take(1):
        # empty result carries the input's own node type (src ∪ dst share it)
        return edges.select(
            F.col("src").alias("node"), F.lit(0.0).cast("double").alias("rank")
        ).limit(0)
    # conf.get without a default returns the effective SQLConf value, so the
    # restores below are unconditional (never leaves the session narrowed).
    # AQE is OFF inside the loop only: every round re-plans otherwise
    # (~0.3 s/round of driver re-optimization at toy scale), and its
    # partition coalescing fights the fixed-width co-located loop — the
    # measured A/B at sf0.1 is 3.9 s → 1.9 s for 5 rounds. A cluster run
    # handles skew by sizing the loop width instead.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_loop(edges, damping, iters, tol)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _pagerank_loop(
    edges: DataFrame, damping: float, iters: int, tol: float
) -> DataFrame:
    # nodes and the transition table are hash-partitioned ON THEIR JOIN
    # KEYS before the one-time checkpoint: localCheckpoint preserves
    # outputPartitioning, so every round's rank⋈edge join and the final
    # node⋈contrib join reuse the layout instead of re-shuffling the
    # (fact-derived) edge table per round — the round's only Exchange is
    # the contribution groupBy(dst).
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(8, "node")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar: node count (plan-time, one job)
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p"))
        .repartition(8, "src")
        .localCheckpoint(eager=True)
    )
    # dangling node set is static: nodes with no out-edges (node-sized)
    dang = nodes.join(
        out_w, nodes.node == out_w.src, "left_anti"
    ).localCheckpoint(eager=True)
    ranks = nodes.select(
        "node", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    for i in range(iters):
        # dangling mass (rank held by no-out-edge nodes) rides the SAME
        # plan as a broadcast 1-row aggregate — no driver round-trip,
        # exactly one job per round (the checkpoint materialization)
        dmass = ranks.join(dang, "node").agg(F.sum("rank").alias("dm"))
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_mass"))
        )
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping)
            * (F.coalesce("in_mass", F.lit(0.0)) + F.coalesce("dm", F.lit(0.0)) / n)
        ).alias("rank")
        base = nodes.join(contrib, nodes.node == contrib.dst, "left").crossJoin(
            F.broadcast(dmass)
        )
        probe = tol > 0 and i < iters - 1 and (i + 1) % 5 == 0
        if not probe:
            ranks = base.select("node", new_rank).localCheckpoint(eager=True)
            continue
        # probe round: carry prev_rank through the SAME checkpoint job,
        # then one scalar agg over the node-sized materialized frame
        stepped = (
            base.join(ranks.withColumnRenamed("rank", "prev_rank"), "node")
            .select("node", new_rank, "prev_rank")
            .localCheckpoint(eager=True)
        )
        ranks = stepped.select("node", "rank")
        delta = stepped.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("d")
        ).first()["d"]
        if delta is not None and delta < tol:
            break
    return ranks
