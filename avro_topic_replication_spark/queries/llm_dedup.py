"""Deduplication operators for LLM data pipelines (SURVEY.md §2.2 LLM ops).

Four families, each in its scalable formulation:

- exact dedup: hash-groupBy on sha256 — one shuffle of (hash, id), the
  canonical 100-TB dedup (never a self-join).
- near-dup via MinHash + banded LSH: shingle → k minhashes → band keys →
  explode bands → candidate pairs only within equal band buckets → verify
  true Jaccard on candidates. Work is O(n·k + candidates), not O(n²).
- SimHash: 16-bit signature from md5 token hashes (md5 so the DuckDB
  oracle reproduces it bit-for-bit; engine hashes differ across engines).
- exact n-gram Jaccard: the ground-truth verifier, deliberately bounded to
  a fixed doc_id prefix so it stays O(1) while remaining oracle-checkable
  (the unbounded scale path IS the MinHash query).

Reference parity: the reference has no dedup (its only transform is the
re-key at ReplicationApplication.java:71); all [EXT] north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

_SHINGLES_SQL = """list_distinct(list_transform(range(1, greatest(length(text) - 2, 1)),
                                 i -> substring(text, CAST(i AS INT), 4)))"""


def _shingles_col(text_col: str = "text"):
    c = F.col(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - 3, F.lit(1))),
            lambda i: c.substr(i, F.lit(4)),
        )
    )


@query(
    "dedup_exact",
    oracle="""
        SELECT sha256(text) AS text_sha,
               min(doc_id) AS keeper_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY sha256(text)
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest doc_id.

    The scale shape: the shuffle carries only (32-byte hash, id) pairs —
    never the text — so 100 TB of documents dedups with a ~TB shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2("text", 256).alias("text_sha"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


@query(
    "dedup_exact_keep_first",
    oracle="""
        SELECT doc_id, lang, source FROM (
            SELECT doc_id, lang, source,
                   row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup returning the surviving rows (keep-first-by-doc_id):
    the row_number-over-hash idiom — one shuffle on the hash, emits full
    rows for the keepers only."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, {_SHINGLES_SQL} AS s
            FROM documents WHERE doc_id < 300
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    """,
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-gram Jaccard near-dup pairs (ground truth for MinHash).

    Deliberately bounded to doc_id < 300 — an O(n²) self-join is the
    verifier, not the scale path; dedup_minhash_lsh is the unbounded
    formulation. The bound keeps this oracle-checkable at every sf."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sh = d.select("doc_id", _shingles_col().alias("s"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


@query("dedup_minhash_lsh", oracle=None, tags=("llm", "dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup detection — the 100-TB formulation.

    shingle(4-gram) → 16 minhash values (xxhash64 seeded by slot) → 4
    bands of 4 → explode to (band_id, band_signature) keys → self-join on
    equal band keys gives CANDIDATE pairs only → verify true Jaccard on
    candidates, keep >= 0.5. With j=0.9 dup pairs, P(candidate) =
    1-(1-j⁴)⁴ ≈ 0.96; work is O(n·k) + O(candidates) — no all-pairs
    product ever materializes. Engine-native xxhash64 → rows-only check
    (tests assert it finds the exact query's ground-truth pairs).
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", _shingles_col().alias("s"))
    # 16 minhashes: slot i -> min over shingles of xxhash64(shingle, i)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: F.array_min(F.transform(F.col("s"), lambda x: F.xxhash64(x, i))),
    )
    sigs = sh.select("doc_id", "s", sig.alias("sig"))
    # 4 bands of 4 slots; band key = hash of the slice (posexplode keeps band id)
    bands = sigs.select(
        "doc_id",
        "s",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.xxhash64(F.slice("sig", b * 4 + 1, 4).cast("string")),
            )
        ).alias("band_id", "band_key"),
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"), "band_id", "band_key"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"), "band_id", "band_key"
    )
    cand = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        cand.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def _simhash_sql() -> str:
    """Oracle SQL for the 16-bit SimHash; generated from the same loop
    shape as the Spark column (see _simhash_col) so both engines stay in
    lockstep. Token hash = first 4 hex digits of md5 (cross-engine
    identical); bit b of the signature is 1 when the sum over tokens of
    ±1 (by token-hash bit b) is positive."""
    toks_sql = "string_split_regex(lower(text), '\\s+')"
    hs_sql = f"list_transform({toks_sql}, w -> CAST(('0x' || substring(md5(w), 1, 4)) AS INT))"
    bit_terms_sql = []
    for b in range(16):
        term = (
            f"CASE WHEN list_aggregate(list_transform(hs, h -> ((h // {1 << b}) % 2) * 2 - 1),"
            f" 'sum') > 0 THEN {1 << b} ELSE 0 END"
        )
        bit_terms_sql.append(term)
    return f"""
        WITH t AS (SELECT doc_id, {hs_sql} AS hs FROM documents)
        SELECT doc_id, {' + '.join(bit_terms_sql)} AS simhash16
        FROM t
    """


def _simhash_col():
    """Spark twin of _simhash_sql (built lazily — Column construction
    needs an active session, which doesn't exist at import time)."""
    toks = F.split(F.lower("text"), r"\s+")
    hs = F.transform(toks, lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("int"))

    def bit_term(b):
        sum_b = F.aggregate(
            hs,
            F.lit(0),
            lambda acc, h: acc + (((h / (1 << b)).cast("int") % 2) * 2 - 1),
        )
        return F.when(sum_b > 0, F.lit(1 << b)).otherwise(F.lit(0))

    col = F.lit(0)
    for b in range(16):
        col = col + bit_term(b)
    return col


@query("dedup_simhash", oracle=_simhash_sql(), tags=("llm", "dedup"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures (near-dup docs agree on most bits; dedup
    then buckets by signature or hamming-ball probes). Pure expression —
    md5-derived bits so the oracle matches bit-for-bit; at scale swap md5
    for xxhash64 (same plan, cheaper hash)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", _simhash_col().cast("int").alias("simhash16"))
