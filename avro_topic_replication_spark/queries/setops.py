"""Set-operation surface (SURVEY.md §2.2 "Set operations")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _cust_year(spark, sf_dir, year: int) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == year).select(
        F.col("o_custkey").alias("custkey")
    )


@query(
    "setop_union_all",
    oracle="""
        SELECT custkey, src FROM (
            SELECT o_custkey AS custkey, 'urgent' AS src FROM orders
            WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_custkey AS custkey, 'big' AS src FROM orders
            WHERE o_totalprice > 400000
        )
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no shuffle — just concatenated partitions)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey"), F.lit("urgent").alias("src")
    )
    big = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey"), F.lit("big").alias("src")
    )
    return urgent.unionByName(big)


@query(
    "setop_union_distinct",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union-all + dedup shuffle."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    return urgent.unionByName(big).distinct()


@query(
    "setop_intersect",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both years."""
    return _cust_year(spark, sf_dir, 1997).intersect(_cust_year(spark, sf_dir, 1998))


@query(
    "setop_except",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): 1997 customers who churned in 1998."""
    return _cust_year(spark, sf_dir, 1997).subtract(_cust_year(spark, sf_dir, 1998))


@query(
    "setop_intersect_all",
    oracle="""
        SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS qty
        FROM lineitem WHERE l_linestatus = 'O' AND l_quantity <= 5
        INTERSECT ALL
        SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS qty
        FROM lineitem WHERE l_linestatus = 'F' AND l_quantity <= 5
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two sides)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 5)
    a = li.filter(F.col("l_linestatus") == "O").select(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").cast("int").alias("qty")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").cast("int").alias("qty")
    )
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
        SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS qty
        FROM lineitem WHERE l_linestatus = 'O' AND l_quantity <= 3
        EXCEPT ALL
        SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS qty
        FROM lineitem WHERE l_linestatus = 'F' AND l_quantity <= 3
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicity = max(0, a−b))."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 3)
    a = li.filter(F.col("l_linestatus") == "O").select(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").cast("int").alias("qty")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").cast("int").alias("qty")
    )
    return a.exceptAll(b)
