"""Catalog: load the driver's parquet testdata as normalized DataFrames.

Tables (FIXTURES.md Group B): region nation customer supplier part orders
lineitem events documents embeddings, one parquet per table under an sf dir.

Normalization contract (so Spark results hash-match the DuckDB oracle, which
reads the same parquet directly):

- ``events.ts`` is INT64 TIMESTAMP(NANOS) in parquet. DuckDB truncates it to
  microseconds on read; Spark cannot read it at all without
  ``spark.sql.legacy.parquet.nanosAsLong=true``. We read ns-as-long and
  rebuild ``ts`` as TIMESTAMP_NTZ via ``ts div 1000`` microseconds — the same
  truncation DuckDB applies, verified value-for-value.
- Everything else is read as-is (ms timestamps arrive as TIMESTAMP_NTZ).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .session import ensure_runtime_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# In-process schema cache — the engine's one-table metastore. A bare
# spark.read.parquet() re-infers the schema from the footer on EVERY call
# (measured 90-165 ms per call on this testdata vs ~45 ms with an explicit
# schema, r12 profile), and the registry's ~350 queries issue 500+
# load_table calls per bench sweep. Keyed on (realpath, mtime_ns, size) so
# a regenerated table re-infers; holds metadata only (a StructType), never
# data or results, exactly like a catalog/metastore would at 100 TB.
_SCHEMA_CACHE: dict[tuple[str, int, int], StructType] = {}


def table_schema(spark: SparkSession, path: str) -> StructType:
    """The parquet file's schema, inferred once per (path, mtime, size)."""
    st = os.stat(path)
    key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalized (see module docstring)."""
    ensure_runtime_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(table_schema(spark, path)).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-long -> µs -> NTZ anchored at the epoch; timestampadd on an NTZ
        # literal is timezone-independent, matching DuckDB's truncating read.
        df = df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (for spark.sql entry points)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(prefix + name)
