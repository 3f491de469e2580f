"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered query's Spark DataFrame and its oracle SQL via DuckDB over
the same parquet tables, then compares row count, column names, pandas
dtypes, and bit-exact values after canonicalization (columns sorted by name,
rows sorted by all columns) — the same shape as the driver's canonicalizer,
and at least as strict: no float tolerance, no int==float coercion. Queries
are designed (decimal-domain aggregation, deterministic tiebreaks) to match
bit-exactly, so any drift is a bug here, not oracle noise.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from avro_topic_replication_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, rows sorted by every column — driver shape.

    Sorting requires hashable cells: any query under oracle check must emit
    scalar columns only (arrays are serialized to strings in both engines).
    """
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _norm_dtype(dt) -> str:
    """Normalize a pandas dtype to a comparable tag.

    datetime64 resolution (ns vs us) differs by transport (Arrow vs duckdb
    fetch) without any semantic difference, so it is collapsed; everything
    else must match exactly — int64 vs float64 is a real failure.
    """
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"
    if s in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"):
        # The driver's hash is value-based for integers: int32 vs int64 with
        # equal values passes (fn_string_regex_split n_words, r01). Only the
        # int-vs-float distinction is load-bearing (agg_conditional, r01).
        return "int"
    if s in ("float32", "float64"):
        return s
    return s


def _datify(df: pd.DataFrame) -> pd.DataFrame:
    """Spark DateType lands as object-of-datetime.date while DuckDB DATE
    lands as datetime64 — semantically identical (driver passes them);
    normalize to datetime64 so the dtype check compares like with like."""
    import datetime as _dt

    for col in df.columns:
        if df[col].dtype == object:
            non_null = df[col].dropna()
            if len(non_null) and isinstance(non_null.iloc[0], _dt.date):
                df[col] = pd.to_datetime(df[col])
    return df


def _col_equal(a: pd.Series, b: pd.Series) -> bool:
    if len(a) != len(b):
        return False
    if np.issubdtype(a.dtype, np.floating) and np.issubdtype(b.dtype, np.floating):
        av, bv = a.to_numpy(), b.to_numpy()
        both_nan = np.isnan(av) & np.isnan(bv)
        return bool(np.all((av == bv) | both_nan))
    if str(a.dtype).startswith("datetime64") or str(b.dtype).startswith("datetime64"):
        return bool(
            pd.to_datetime(a).astype("datetime64[us]").equals(
                pd.to_datetime(b).astype("datetime64[us]")
            )
        )
    return a.equals(b) or bool(np.all(a.to_numpy() == b.to_numpy()))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_pdf = _datify(spark_df.toPandas())
    o_pdf = _datify(con.execute(sql).df())

    if sorted(s_pdf.columns) != sorted(o_pdf.columns):
        return [
            f"columns differ: spark={sorted(s_pdf.columns)} oracle={sorted(o_pdf.columns)}"
        ]
    if len(s_pdf) != len(o_pdf):
        problems.append(f"row count differs: spark={len(s_pdf)} oracle={len(o_pdf)}")

    try:
        s_c, o_c = _canon(s_pdf), _canon(o_pdf)
    except TypeError as e:  # unhashable cells → the driver would record err
        return [f"canonicalize failed (driver would err): {e}"]

    for col in s_c.columns:
        sd, od = _norm_dtype(s_c[col].dtype), _norm_dtype(o_c[col].dtype)
        if sd != od:
            problems.append(f"dtype differs on {col!r}: spark={sd} oracle={od}")
    if problems:
        return problems

    for col in s_c.columns:
        if not _col_equal(s_c[col], o_c[col]):
            diff = s_c[col].astype(object) != o_c[col].astype(object)
            idx = list(np.nonzero(diff.to_numpy())[0][:3])
            samples = [
                (int(i), s_c[col].iloc[i], o_c[col].iloc[i]) for i in idx
            ]
            problems.append(f"values differ on {col!r} (bit-exact): {samples}")
    return problems
