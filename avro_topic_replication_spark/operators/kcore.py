"""k-core decomposition by iterative peeling — the degeneracy-based
subgraph filter (Seidman 1983): repeatedly delete nodes of degree < k
until none remain; what survives is the (unique) maximal subgraph where
every node has ≥ k neighbors inside it.

The k-core is UNIQUE regardless of peel order, so the operator is fully
deterministic without any tie-break machinery — unlike LPA, every engine
and every partitioning produces the same node set.

Dataflow per round (the dedup_clusters / pagerank / labelprop loop
shape): one degree aggregate over the surviving symmetrized edges, one
semi-join to keep qualifying nodes, one semi-join to shrink the edge
list, ``localCheckpoint`` to truncate lineage. The fixpoint probe is the
surviving-node count — a 1-value scalar per round, monotonically
non-increasing, so the loop ends after at most |V| rounds (in practice
O(peel depth)).

At 100 TB the edge list is bucketed on node so per-round joins are
co-located; rounds shrink the data, never grow it.

Reference parity: none (the reference has no graph surface); [EXT]
north-star per SURVEY §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kcore(spark: SparkSession, edges: DataFrame, k: int = 2) -> DataFrame:
    """The k-core of undirected ``edges(s1, s2)``; returns (node, degree)
    with the degree measured INSIDE the core. Empty input (or a graph
    whose k-core is empty) yields an empty result.

    Narrows ``shuffle.partitions`` / disables AQE inside the loop and
    restores both unconditionally (operators/pagerank.py mechanics).
    """
    edges = edges.localCheckpoint(eager=True)
    if not edges.take(1):
        return edges.select(
            F.col("s1").alias("node"), F.lit(0).cast("bigint").alias("degree")
        ).limit(0)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _kcore_loop(edges, k)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _kcore_loop(edges: DataFrame, k: int) -> DataFrame:
    sym = (
        edges.select(F.col("s1").alias("node"), F.col("s2").alias("nbr"))
        .union(edges.select(F.col("s2").alias("node"), F.col("s1").alias("nbr")))
        .repartition(8, "node")
        .localCheckpoint(eager=True)
    )
    n_prev = None
    while True:
        deg = sym.groupBy("node").agg(F.count("*").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("node")
        n = keep.count()  # 1-value fixpoint probe, monotone non-increasing
        if n == 0:
            return deg.filter(F.lit(False)).select("node", "degree")
        if n == n_prev:
            return deg.filter(F.col("degree") >= k)
        n_prev = n
        sym = (
            sym.join(keep, "node", "left_semi")
            .join(
                keep.withColumnRenamed("node", "nbr"), "nbr", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
