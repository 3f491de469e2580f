"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered query's Spark DataFrame and its oracle SQL via DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted by
full value tuple). Floats must match to 1e-9 relative — queries are designed
(decimal-domain aggregation) to match bit-exactly, so any drift is a bug.
"""

from __future__ import annotations

import math
import os

import duckdb

from avro_topic_replication_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    # Normalize values for cross-engine comparison.
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    return (type(v).__name__, v)


def _sort_key(row):
    return [repr(c) for c in row]


def _values_equal(a, b, rel=1e-9) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= rel * max(abs(a), abs(b), 1.0)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_values_equal(x, y, rel) for x, y in zip(a, b))
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    oracle = con.execute(sql)
    oracle_cols = [d[0] for d in oracle.description]
    oracle_rows = [tuple(r) for r in oracle.fetchall()]

    if sorted(spark_cols) != sorted(oracle_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return problems
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} oracle={len(oracle_rows)}")

    # reorder columns by sorted name in both
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s_sorted = sorted(([row[i] for i in s_idx] for row in spark_rows), key=_sort_key)
    o_sorted = sorted(([row[i] for i in o_idx] for row in oracle_rows), key=_sort_key)

    shown = 0
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        if not _values_equal(list(sr), list(orow)):
            problems.append(f"row {i} differs: spark={sr!r} oracle={orow!r}")
            shown += 1
            if shown >= 5:
                problems.append("... further row diffs suppressed")
                break
    return problems
