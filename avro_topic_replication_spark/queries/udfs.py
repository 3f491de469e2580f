"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 "UDF surface").

Ladder of Python-extension points, worst-to-best for 100 TB:

- scalar Python UDF: row-at-a-time, pickled per row — the SLOW path; one
  query exists to cover the API, with the same logic shown as pure column
  expressions in fn_* queries (always prefer those).
- pandas_udf (scalar): Arrow-batched, vectorized numpy — 10-100× the
  row UDF; the right tool when an expression genuinely needs Python.
- pandas_udf (grouped agg) + applyInPandas: per-group vectorized kernels.
- mapInArrow / applyInArrow (Spark 4): Arrow RecordBatch/Table in and out
  with NO pandas materialization — zero-copy for strings/binary, the top
  rung when the kernel speaks Arrow compute or feeds an Arrow-native
  library (tokenizers, image decoders, parquet writers).
- UDTF: one row in, many rows out, arrow-batched.

Cross-engine exactness notes: integer kernels are trivially exact; float
kernels use np.cumsum (a sequential left fold, bit-identical to Spark's
aggregate() and DuckDB's list_reduce) rather than np.sum/np.dot (pairwise/
BLAS summation — different rounding).

Reference parity: the reference has no UDF surface (its one transform is
GenericRecord field access, ReplicationApplication.java:71); [EXT].
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ..catalog import load_table
from . import query


@query(
    "udf_scalar_python",
    oracle="""
        SELECT c_custkey,
               c_name || ' [' || CASE WHEN c_acctbal < 0 THEN 'DEBT'
                                      WHEN c_acctbal < 5000 THEN 'MID'
                                      ELSE 'RICH' END || ']' AS tagged
        FROM customer WHERE c_custkey < 300
    """,
    tags=("udf",),
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (API coverage; the bounded input is
    deliberate — this path serializes every row through Python and is
    never the 100-TB answer; the identical logic runs JVM-side in
    conditional_expressions)."""

    @F.udf(returnType=StringType())
    def tag(name, bal):
        band = "DEBT" if bal < 0 else ("MID" if bal < 5000 else "RICH")
        return f"{name} [{band}]"

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select("c_custkey", tag("c_name", "c_acctbal").alias("tagged"))


@query(
    "udf_pandas_cosine",
    oracle="""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               list_reduce(list_transform(list_zip(embedding, qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(list_zip(embedding, embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(list_zip(qv, qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)))
                 AS cosine
        FROM embeddings, q
    """,
    tags=("udf", "llm", "vector"),
)
def udf_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF: cosine similarity vs a fixed query vector.

    The numpy kernel is fully vectorized across the batch (2-D stack, one
    cumsum per axis) — the 10-100× path over row UDFs. np.cumsum is used
    instead of np.dot because it accumulates strictly left-to-right,
    bit-matching the SQL fold oracle (np.dot's BLAS/pairwise summation
    rounds differently)."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = np.array(
        e.filter(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64
    )  # 1-row plan-time parameter fetch

    @F.pandas_udf(DoubleType())
    def cosine(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)  # (batch, dim)
        dot = np.cumsum(m * qv, axis=1)[:, -1]
        nrm = np.sqrt(np.cumsum(m * m, axis=1)[:, -1])
        qn = np.sqrt(np.cumsum(qv * qv)[-1])
        return pd.Series(dot / (nrm * qn))

    return e.select("vec_id", cosine("embedding").alias("cosine"))


@query(
    "udf_grouped_agg_pandas",
    oracle="""
        SELECT lang,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    """,
    tags=("udf", "agg"),
)
def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf grouped aggregation (Series → scalar UDAF): integer
    kernels so the result is exact regardless of accumulation order.
    Partial aggregation does NOT apply to pandas UDAFs — all group rows
    ship to one executor — so at 100 TB, keys must be well-distributed
    (they are here) or the kernel re-expressed as built-ins."""

    @F.pandas_udf("long")
    def total(chars: pd.Series) -> int:
        return int(chars.sum())

    @F.pandas_udf("long")
    def n(chars: pd.Series) -> int:
        return int(len(chars))

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        total("n_chars").alias("total_chars"), n("n_chars").alias("n_docs")
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc
        FROM documents GROUP BY lang, source
    """,
    tags=("udf", "agg"),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: each (lang, source) group arrives as one
    pandas frame, the kernel emits one summary row. The general escape
    hatch for per-group logic built-ins can't express (here the kernel is
    integer-exact so the oracle hash-matches)."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(pdf["n_chars"].sum())],
                "first_doc": [int(pdf["doc_id"].min())],
                "last_doc": [int(pdf["doc_id"].max())],
            }
        )

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").applyInPandas(
        summarize,
        schema="lang string, source string, n_docs long, total_chars long, "
        "first_doc long, last_doc long",
    )


@query(
    "udf_udtf_words",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
            FROM documents WHERE doc_id < 50
        )
        SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[CAST(i AS INT)] AS word
        FROM t, unnest(range(1, least(len(toks), 5) + 1)) AS u(i)
    """,
    tags=("udf", "udtf"),
)
def udf_udtf_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one document row in, first-5-word rows out (the
    lateral-expand extension point; Spark 3.5+). The same expansion is
    expressible with posexplode — the UDTF exists for logic that isn't."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class FirstWords:
        def eval(self, text: str):
            for i, w in enumerate(text.lower().split()[:5]):
                yield i, w

    spark.udtf.register("first_words", FirstWords)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, f.pos, f.word "
        "FROM __udtf_docs, LATERAL first_words(text) AS f"
    )


@query(
    "udf_map_in_arrow",
    oracle="""
        SELECT doc_id,
               CAST(n_chars * 2 AS BIGINT) AS n2,
               CAST(length(string_split(text, ' ')[1]) AS INTEGER) AS first_len
        FROM documents
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Spark 4 Arrow-native map): the batch iterator yields
    pyarrow RecordBatches directly — one memory layout end to end, no
    pandas materialization, which removes the pandas block-construction
    overhead pandas UDFs pay and keeps non-numeric columns (strings here)
    zero-copy. The kernel computes with pyarrow.compute (vectorized C++),
    so the Python worker never loops over rows. This sits one rung above
    pandas UDFs on the module's worst-to-best ladder; use it when the
    kernel is expressible in Arrow compute or feeds an Arrow-native
    library (tokenizers, parquet writers)."""
    import pyarrow as pa

    def kernel(it):
        import pyarrow.compute as pc

        for batch in it:
            ix = {n: i for i, n in enumerate(batch.schema.names)}
            first = pc.list_element(
                pc.split_pattern(batch.column(ix["text"]), " "), 0
            )
            yield pa.record_batch(
                {
                    "doc_id": batch.column(ix["doc_id"]),
                    "n2": pc.multiply(
                        pc.cast(batch.column(ix["n_chars"]), pa.int64()),
                        pa.scalar(2, pa.int64()),
                    ),
                    "first_len": pc.cast(
                        pc.utf8_length(first), pa.int32()
                    ),
                }
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    return d.mapInArrow(kernel, "doc_id long, n2 long, first_len int")


@query(
    "udf_apply_in_arrow",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM documents
        GROUP BY lang
    """,
    tags=("udf", "arrow"),
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow (Spark 4 Arrow-native grouped map): each language
    group arrives as ONE pyarrow Table and the kernel reduces it with
    pyarrow.compute — integer sums, so the result is exact and
    hash-checked (the aggregation itself is the JVM twin `agg_*`
    family's job; this query exists to pin the Arrow grouped-map API
    and its schema/keying contract). Same caveat as applyInPandas: the
    whole group materializes in one worker, so key cardinality and
    group size must be bounded — languages here, never doc_id."""
    import pyarrow as pa

    def kernel(key, table):
        import pyarrow.compute as pc

        return pa.table(
            {
                "lang": [key[0]],
                "n_docs": pa.array([table.num_rows], pa.int64()),
                "sum_chars": pa.array(
                    [pc.sum(table.column("n_chars")).as_py()], pa.int64()
                ),
                "min_doc": pa.array(
                    [pc.min(table.column("doc_id")).as_py()], pa.int64()
                ),
            }
        )

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").applyInArrow(
        kernel, "lang string, n_docs long, sum_chars long, min_doc long"
    )
