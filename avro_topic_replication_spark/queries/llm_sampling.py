"""Reproducible sampling + dataset splitting (training-data pipeline ops).

A 100-TB corpus is never trained on whole: pipelines need (a) a
reproducible sample for iteration, (b) stratified rates per language /
source to rebalance the mixture, (c) a deterministic train/val/test
split that survives re-runs, repartitions and backfills.

The scale-correct primitive for all three is HASH-based selection:
``md5(key)`` is uniform on hex strings, so a lexicographic prefix
threshold selects an exact fraction, per-row, with no RNG state, no
seed-vs-partitioning coupling, and no shuffle — the predicate pushes
into the scan stage and the same row lands in the same split on every
engine and every run (which also makes it fully oracle-checkable,
unlike seeded ``sample()``). Spark's native seeded ``sampleBy`` is kept
as a rows-only entry for API parity.

Reference parity: none (the reference has no compute); [EXT] mandated
by the LLM-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

# md5 prefix thresholds: fraction = int(threshold, 16) / 16**4
_P10 = "1999"  # ~10.0% (0x1999 / 0x10000)
_TRAIN = "cccc"  # ~80%
_VAL = "e666"  # next ~10%; remainder = test


def _bkt(col):
    """4-hex-digit uniform bucket of a key — identical in Spark and DuckDB."""
    return F.substring(F.md5(col.cast("string")), 1, 4)


_BKT_SQL = "substring(md5(CAST({k} AS VARCHAR)), 1, 4)"


@query(
    "sample_hash_fraction",
    oracle=f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE {_BKT_SQL.format(k='doc_id')} < '{_P10}'
    """,
    tags=("llm", "sampling"),
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample of the corpus: md5-bucket the key, keep
    buckets under the threshold. No RNG, no shuffle — the predicate
    evaluates per row inside the scan stage, so the sample is identical
    at any partitioning and any scale."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_bkt(F.col("doc_id")) < _P10).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "sample_stratified_rates",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
        FROM documents
        WHERE {_BKT_SQL.format(k='doc_id')} <
              CASE WHEN lang = 'en' THEN '0ccc' ELSE '3333' END
        GROUP BY lang
    """,
    tags=("llm", "sampling"),
)
def sample_stratified_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling to rebalance the language mixture:
    majority-class 'en' keeps ~5%, every other language ~20% — the
    up/down-weighting step of corpus curation. Same hash-threshold
    trick, with the per-stratum rate selected by a conditional; at 100 TB
    a rates DIM TABLE broadcast-joined on the stratum key replaces the
    CASE (same plan shape, data-driven rates)."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit("0ccc")).otherwise(F.lit("3333"))
    return (
        d.filter(_bkt(F.col("doc_id")) < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


@query(
    "split_train_val_test",
    oracle=f"""
        SELECT CASE WHEN {_BKT_SQL.format(k='doc_id')} < '{_TRAIN}' THEN 'train'
                    WHEN {_BKT_SQL.format(k='doc_id')} < '{_VAL}' THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
    tags=("llm", "sampling"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: disjoint md5-bucket
    ranges of the document key. A given doc_id lands in the same split
    forever — across re-runs, engines, backfills and scale factors —
    which is the leakage-safety property a training pipeline actually
    needs (seeded random splits lose it the moment data order changes)."""
    d = load_table(spark, sf_dir, "documents")
    b = _bkt(F.col("doc_id"))
    split = (
        F.when(b < _TRAIN, F.lit("train")).when(b < _VAL, F.lit("val")).otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query("sample_native_seeded", oracle=None, tags=("llm", "sampling"))
def sample_native_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native stratified sampler (`sampleBy`) for API parity —
    per-stratum Bernoulli with a fixed seed. Rows-only: the seeded RNG
    stream is engine-internal (partition-order coupled), exactly the
    reproducibility gap the hash-based variants above close."""
    d = load_table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    fractions = {lg: (0.05 if lg == "en" else 0.2) for lg in langs}
    return (
        d.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


@query("sketch_heavy_hitters", oracle=None, tags=("llm", "sketch", "approx"))
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the event stream's user_id: one
    Arrow-batched pass folds every partition into a 4×256 counter matrix,
    the matrices merge in a d·w-row aggregate, and the merged sketch
    (metadata-sized) broadcasts into a map-side estimator — the mergeable-
    summary shape that finds hot keys at 100 TB without shuffling every
    distinct key (operators/sketches.py documents the public CM bounds).
    Rows-only: estimates overcount by design (pytest asserts the
    est >= exact invariant and ranking agreement against the exact count)."""
    from ..operators.sketches import build_sketch, estimate_counts

    ev = load_table(spark, sf_dir, "events")
    sketch = build_sketch(ev, "user_id").collect()  # d·w cells, not data-sized
    users = ev.select("user_id").distinct()
    return (
        estimate_counts(users, "user_id", sketch)
        .orderBy(F.desc("est_count"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "sample_reservoir_per_group",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents
        )
        SELECT doc_id, lang, n_chars, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 20
    """,
    tags=("llm", "sampling"),
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum uniform sample (the deterministic reservoir):
    rank every doc within its language by the md5 of its key and keep the
    first 20 — hash order is uniform, so this is a k-reservoir whose
    membership is stable across runs, engines, and repartitioning (a
    seeded reservoir loses all three the moment row order changes). The
    window partitions by stratum — full parallelism, no global sort; at
    100 TB the rank can further prune via a per-stratum approximate
    hash-threshold pre-filter so the window only sees ~k candidates."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "lang", "n_chars", "rk")
    )


@query("sketch_quantile_bottomk", oracle=None, tags=("llm", "sketch", "approx"))
def sketch_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bottom-k quantile sketch over the event values: every
    partition emits its k smallest-hash (hash, value) pairs, the global
    merge is a TakeOrderedAndProject (per-partition heaps, k rows to the
    driver), and quantiles read off the sorted k-sample — rank error
    O(1/√k), volume-independent state, the third mergeable summary next
    to HLL (distinct) and count-min (frequency). Rows-only: the sample
    is deterministic but the estimates are approximate by design
    (tests/test_llm_ops.py asserts rank-error bounds vs the exact
    percentiles)."""
    from ..operators.sketches import bottomk_quantiles

    ev = load_table(spark, sf_dir, "events")
    probs = [0.25, 0.5, 0.75, 0.9]
    est = bottomk_quantiles(ev, "event_id", "value", probs)
    return spark.createDataFrame(
        [(p, e) for p, e in zip(probs, est)], "quantile double, est_value double"
    )


@query(
    "sample_domain_mixture",
    oracle=f"""
        WITH counts AS (
            SELECT source,
                   COUNT(*) AS n_available,
                   1 + (CAST(substring(source, 4) AS INTEGER) % 4) AS w
            FROM documents GROUP BY source
        ),
        sums AS (
            SELECT SUM(w) AS sw, SUM(n_available) AS n_total FROM counts
        ),
        rates AS (
            SELECT source, n_available,
                   CAST(floor(LEAST(
                       1.0,
                       (CAST(w AS DOUBLE) / sw)
                           * (0.5 * n_total) / n_available
                   ) * 65536) AS BIGINT) AS thr
            FROM counts, sums
        ),
        kept AS (
            SELECT d.source
            FROM documents d JOIN rates r USING (source)
            WHERE r.thr >= 65536
               OR {_BKT_SQL.format(k='d.doc_id')} < printf('%04x', r.thr)
        )
        SELECT r.source,
               CAST(r.n_available AS BIGINT) AS n_available,
               CAST(r.thr AS BIGINT) AS thr,
               CAST(COALESCE(k.n, 0) AS BIGINT) AS n_sampled
        FROM rates r
        LEFT JOIN (SELECT source, COUNT(*) AS n FROM kept GROUP BY source) k
               USING (source)
    """,
    tags=("llm", "sampling"),
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling with a DATA-DRIVEN rates table — the
    production form of ``sample_stratified_rates``' CASE expression.
    Target mixture weights per source domain (here w = 1 + idx mod 4,
    standing in for curated domain weights a-la mC4/DoReMi), a total
    budget of half the corpus, and per-domain acceptance rate
    min(1, share_d · B / n_d) — computed IN-PLAN from two tiny
    aggregates, converted to a 4-hex md5 threshold, and broadcast-joined
    back onto the corpus so the per-row keep decision is a pure scan
    predicate. Emits per-domain accounting (available, threshold,
    sampled).

    Scale shape: corpus is touched twice (domain counts; the filtered
    count), both partial-aggregated on the low-cardinality domain key;
    the rates table is domains-sized and broadcast. Rate → threshold
    uses floor(rate·65536) with an explicit thr ≥ 65536 keep-all guard
    (a 4-hex lexicographic compare cannot express rate 1.0), and the
    double arithmetic runs in the same order on integer inputs in both
    engines, so thresholds — and therefore the sampled set — match
    exactly."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_available")).withColumn(
        "w", 1 + F.substring("source", 4, 10).cast("int") % 4
    )
    sums = counts.agg(
        F.sum("w").alias("sw"), F.sum("n_available").alias("n_total")
    )
    rate = F.least(
        F.lit(1.0),
        (F.col("w").cast("double") / F.col("sw"))
        * (0.5 * F.col("n_total"))
        / F.col("n_available"),
    )
    rates = counts.crossJoin(F.broadcast(sums)).select(
        "source",
        "n_available",
        F.floor(rate * 65536).cast("bigint").alias("thr"),
    )
    kept = d.join(F.broadcast(rates), "source").filter(
        (F.col("thr") >= 65536)
        | (_bkt(F.col("doc_id")) < F.format_string("%04x", F.col("thr")))
    )
    kept_counts = kept.groupBy("source").agg(F.count("*").alias("n"))
    return (
        rates.join(kept_counts, "source", "left")
        .select(
            "source",
            F.col("n_available").cast("bigint").alias("n_available"),
            F.col("thr").cast("bigint").alias("thr"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_sampled"),
        )
    )
