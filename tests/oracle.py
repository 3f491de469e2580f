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


def _null_nan_counts_spark(spark_df, cols: "list[str]"):
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}\0null"))
        aggs.append(
            F.sum((~F.col(c).isNull() & F.isnan(c)).cast("long")).alias(
                f"{c}\0nan"
            )
        )
    row = spark_df.agg(*aggs).first()
    return {c: (row[f"{c}\0null"] or 0, row[f"{c}\0nan"] or 0) for c in cols}


def _check_null_vs_nan(
    spark_df, con, sql: str, s_pdf, o_pdf, problems: "list[str]"
) -> None:
    """NULL and NaN both land as NaN in a float64 pandas column, so the
    frame comparison cannot tell them apart — but the external driver's
    value hash CAN. Compare per-column (n_null, n_nan) pairs directly on
    the engines (count-level: a same-count positional swap would also
    have to dodge the value comparison on every other column).

    Cost gate: the re-execution of both sides only runs when a float
    column actually SHOWS NaN in either pandas frame — if neither frame
    has a NaN there is nothing conflated, so the common all-values case
    pays nothing."""
    import math

    dbl = [f for f, t in spark_df.dtypes if t in ("double", "float")]
    dbl = [
        c
        for c in dbl
        if (c in s_pdf.columns and s_pdf[c].isna().any())
        or (c in o_pdf.columns and o_pdf[c].isna().any())
    ]
    if not dbl:
        return
    s_counts = _null_nan_counts_spark(spark_df, dbl)
    o_rows = con.execute(sql).fetchall()
    o_cols = [d[0] for d in con.description]
    for c in dbl:
        if c not in o_cols:
            continue
        i = o_cols.index(c)
        onull = sum(1 for r in o_rows if r[i] is None)
        onan = sum(
            1
            for r in o_rows
            if isinstance(r[i], float) and math.isnan(r[i])
        )
        if s_counts[c] != (onull, onan):
            problems.append(
                f"NULL/NaN split differs on {c!r}: spark(null,nan)="
                f"{s_counts[c]} oracle=({onull}, {onan})"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_pdf = _datify(spark_df.toPandas())
    o_pdf = _datify(con.execute(sql).df())
    _check_null_vs_nan(spark_df, con, sql, s_pdf, o_pdf, problems)

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
            if len(s_c) == 0 and len(o_c) == 0 and "object" in (sd, od):
                # a zero-row frame can't reveal its element type on the
                # pandas side (Spark DateType → object needs a value for
                # _datify to recognize); the driver hashes no values here,
                # so an object-vs-typed mismatch on empty frames is
                # transport noise, not a schema difference
                continue
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
