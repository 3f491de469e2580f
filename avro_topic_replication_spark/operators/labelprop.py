"""Synchronous label propagation over an undirected edge list —
community detection (Raghavan et al. 2007), the modularity-free
counterpart to the connected-components clustering in queries/llm_dedup.

Each round every node adopts the most frequent label among its
neighbors, ties broken DETERMINISTICALLY by the smaller label (classic
LPA resolves ties randomly; this variant trades a little community
granularity for run-to-run, engine-independent reproducibility — the
same trade every md5-based sampler in this repo makes). Synchronous
updates on bipartite-ish structures can oscillate, so the loop runs a
fixed round count rather than to a fixpoint.

Dataflow per round (the dedup_clusters / pagerank loop shape):
- ONE join of current labels onto the symmetrized edge list (node-keyed),
- groupBy (node, neighbor_label) count — partial-aggregated map-side,
- per-node argmax via max_by over the (count, -label) order key,
- ``localCheckpoint`` to truncate per-round lineage.

Shuffles carry 3 scalars per row; no driver-side data at any point. At
100 TB the edge list is bucketed on node so the per-round join is
co-located — identical to the pagerank deployment note.

Reference parity: none (the reference has no graph surface); [EXT]
north-star per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def label_propagation(
    spark: SparkSession, edges: DataFrame, iters: int = 5
) -> DataFrame:
    """LPA over undirected ``edges(s1, s2)``; returns (node, label).

    Labels start as the node id; after ``iters`` synchronous rounds each
    node carries its community's label (the minimum id that won the
    neighborhood votes). An empty edge list yields an empty result with
    the caller's node type. The loop narrows ``shuffle.partitions`` to 8
    and disables AQE exactly like operators/pagerank.py (state is
    node-sized; task overhead dominates otherwise), restoring both
    unconditionally.
    """
    edges = edges.localCheckpoint(eager=True)
    if not edges.take(1):
        return edges.select(
            F.col("s1").alias("node"), F.col("s1").alias("label")
        ).limit(0)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _lpa_loop(edges, iters)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _lpa_loop(edges: DataFrame, iters: int) -> DataFrame:
    sym = (
        edges.select(F.col("s1").alias("node"), F.col("s2").alias("nbr"))
        .union(edges.select(F.col("s2").alias("node"), F.col("s1").alias("nbr")))
        .repartition(8, "nbr")  # the per-round join key is the NEIGHBOR id
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("node")
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        votes = (
            sym.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
                ),
                "nbr",
            )
            .groupBy("node", "nbr_label")
            .agg(F.count("*").alias("votes"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max_by(
                    "nbr_label",
                    F.struct(
                        F.col("votes").alias("v"),
                        (-F.col("nbr_label")).alias("tb"),
                    ),
                ).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels
