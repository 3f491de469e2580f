"""Non-parquet sources + sinks (SURVEY.md §2.2 "Sources / sinks").

Each query proves WRITE + READ parity: a lineitem slice goes out through
the sink under test into the scratch dir, comes back through the matching
source with an explicit schema, and must hash-match the DuckDB oracle
reading the ORIGINAL parquet — so any serialization loss (float
formatting, date parsing, partition-column handling) fails the gate.
Doubles survive because both CSV/JSON writers emit shortest-round-trip
representations and both parsers are correctly rounded.

Scale notes: explicit schemas on read (schema inference is a full extra
scan at 100 TB); the parquet sink partitions by a low-cardinality column
and the read-back filter prunes to one partition directory — the
layout/pruning contract that matters on a real lake.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.replay import SCRATCH
from . import query

_SLICE_SQL = """
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice,
           l_returnflag, CAST(l_shipdate AS DATE) AS ship_day
    FROM lineitem WHERE l_orderkey < 100
"""

_SLICE_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_linenumber int, l_quantity double, "
    "l_extendedprice double, l_returnflag string, ship_day date"
)


def _slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


def _scratch(sf_dir: str, name: str) -> str:
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(SCRATCH, "io", sf_tag, name)


@query("source_csv_roundtrip", oracle=_SLICE_SQL, tags=("source", "csv"))
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + CSV source with explicit schema and header; values must
    survive the text round trip bit-exactly."""
    path = _scratch(sf_dir, "csv")
    _slice(spark, sf_dir).write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(_SLICE_SCHEMA).option("header", "true").csv(path)


@query("source_json_roundtrip", oracle=_SLICE_SQL, tags=("source", "json"))
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source with explicit schema (inference would be
    a second full scan at scale — never on by default here)."""
    path = _scratch(sf_dir, "json")
    _slice(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema(_SLICE_SCHEMA).json(path)


@query(
    "sink_parquet_partitioned",
    oracle="""
        SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice,
               CAST(l_shipdate AS DATE) AS ship_day, l_returnflag
        FROM lineitem WHERE l_orderkey < 100 AND l_returnflag = 'R'
    """,
    tags=("sink", "parquet"),
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned read-back: the filter
    on the partition column must prune to the single l_returnflag=R
    directory (visible as PartitionFilters in the scan plan) — the
    write-side layout decision that pays for itself on every later read."""
    path = _scratch(sf_dir, "parquet_part")
    _slice(spark, sf_dir).write.mode("overwrite").partitionBy("l_returnflag").parquet(
        path
    )
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "ship_day",
        "l_returnflag",
    )
