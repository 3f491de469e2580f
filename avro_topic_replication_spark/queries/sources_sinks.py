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


_BINFIX_DIR = os.path.join(SCRATCH, "io", "binfix")


def _binary_fixture() -> str:
    """Deterministic blob files (scale-independent, regenerated on demand):
    the binaryFile source needs real files on disk, and a fixed byte
    pattern lets one oracle path serve every sf."""
    os.makedirs(_BINFIX_DIR, exist_ok=True)
    for i in range(4):
        body = bytes((i * 37 + j * 11) % 256 for j in range(1024 + 257 * i))
        with open(os.path.join(_BINFIX_DIR, f"blob_{i}.bin"), "wb") as f:
            f.write(body)
    return _BINFIX_DIR


@query(
    "source_binaryfile",
    oracle=f"""
        SELECT regexp_extract(filename, '[^/]+$') AS file,
               size AS length,
               sha256(hex(content)) AS content_sha
        FROM read_blob('{_BINFIX_DIR}/*.bin')
    """,
    tags=("source", "binary", "multimodal"),
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingest (`binaryFile` source) — the entry point for
    multimodal blobs (images/audio) that arrive as files, not rows. Each
    file becomes one row of (path, length, content BinaryType); content is
    fingerprinted via sha2 over its hex encoding (DuckDB's sha256 only
    hashes VARCHAR, and both engines agree on uppercase hex, so the hex
    route makes the digest cross-engine comparable). Reads a deterministic
    blob fixture so the oracle's read_blob sees byte-identical files at
    any scale. At 100 TB: binaryFile splits per-file (one task per blob),
    so parallelism scales with file count; pair with maxPartitionBytes for
    many-small-file corpora."""
    path = _binary_fixture()
    df = spark.read.format("binaryFile").load(os.path.join(path, "*.bin"))
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("file"),
        "length",
        F.sha2(F.hex("content"), 256).alias("content_sha"),
    )
