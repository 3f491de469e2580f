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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from ..catalog import load_table
from ..session import track_persist
from . import query

# 6-gram shingles: 4-grams give ordinary same-language documents a ~0.4
# baseline Jaccard (common English 4-grams), which floods banded LSH with
# weak candidates; 6-grams push the non-dup baseline under ~0.25 while
# true near-dups stay >= 0.9 (measured on this corpus).
_SHINGLES_SQL = """list_distinct(list_transform(range(1, greatest(length(text) - 4, 1)),
                                 i -> substring(text, CAST(i AS INT), 6)))"""


@F.pandas_udf(ArrayType(StringType()))  # type object: no session needed at import
def _shingles_udf(texts: pd.Series) -> pd.Series:
    out = []
    for t in texts:
        if t is None:
            out.append([])
            continue
        n = max(len(t) - 5, 1)
        # dict.fromkeys == array_distinct: dedup preserving first occurrence
        out.append(list(dict.fromkeys(t[i : i + 6] for i in range(n))))
    return pd.Series(out)


def _shingles_col(text_col: str = "text"):
    """Distinct 6-gram shingles of a text column.

    Arrow-batched Python slicing rather than Catalyst
    sequence+transform+substr: higher-order lambdas run interpreted (no
    codegen), and shingling the sf0.1 corpus measured 5.2s interpreted vs
    ~1s in the UDF. Semantics match _SHINGLES_SQL exactly (window start
    1..max(len-5,1); a <6-char text yields itself)."""
    return _shingles_udf(F.col(text_col))


def _pack_shingle_code(s: str) -> int:
    """int64 code for one shingle — see _shingle_codes_udf for the contract."""
    import hashlib

    b = s.encode("utf-8")
    if len(b) <= 8 and (not b or b[0] < 0x80):
        # non-negative: ASCII first byte keeps the sign bit 0
        return int.from_bytes(b.ljust(8, b"\0"), "big", signed=True)
    d = hashlib.blake2b(b, digest_size=8).digest()
    # fallback digests strictly negative so the ranges never meet
    return -(int.from_bytes(d, "big") >> 1) - 1


@F.pandas_udf(ArrayType(LongType()))
def _shingle_codes_udf(texts: pd.Series) -> pd.Series:
    """Distinct 6-gram shingles PACKED into int64 codes.

    NOT a hash: a shingle of ≤8 UTF-8 bytes with an ASCII first byte
    (every 6-char ASCII shingle) NUL-pads to exactly 8 bytes and converts
    big-endian signed — an injective map onto the NON-NEGATIVE longs (the
    ASCII lead byte keeps the sign bit 0), so distinctness, document
    frequency, intersections and Jaccard over codes are IDENTICAL to the
    string computation the oracle runs, while every downstream
    exchange/cache/groupBy moves fixed-width longs instead of strings
    (~3× cheaper end-to-end, measured). Everything else — >8-byte
    shingles AND ≤8-byte shingles whose first byte is ≥0x80 (a packed
    value there would come out negative and land inside the digest
    range) — falls back to a blake2b-64 digest mapped strictly negative,
    so the two ranges never meet; deterministic, and collision odds at
    corpus scale are ~|shingles|²/2⁶⁴.

    ASCII texts (the whole synthetic corpus; chars == bytes, every code
    the non-negative packed form) take a vectorized numpy path: one
    sliding-window view over the byte buffer, six shifts, one unique —
    replacing ~len(t) Python-level slice+encode+from_bytes calls per
    document (guide §4.2: batch work inside the UDF goes to native
    code). np.unique returns SORTED distinct codes where the scalar
    path preserves first occurrence — every consumer (explode,
    array_intersect size, pmod→min minhash) is order-free, so results
    are identical. Non-ASCII or None falls back to the scalar path.
    Measured: the dedup family's shingle pass 0.59 s -> 0.18 s wall at
    sf0.1 (isolated dedup_ngram_jaccard 5.92 s -> 5.1 s)."""
    shifts = np.array([56, 48, 40, 32, 24, 16], dtype=np.int64)
    out = []
    for t in texts:
        if t is None:
            out.append([])
            continue
        if len(t) >= 6 and t.isascii():
            b = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            w = np.lib.stride_tricks.sliding_window_view(b, 6)
            codes = (w.astype(np.int64) << shifts).sum(axis=1)
            out.append(np.unique(codes))
            continue
        n = max(len(t) - 5, 1)
        out.append(
            [_pack_shingle_code(s) for s in dict.fromkeys(t[i : i + 6] for i in range(n))]
        )
    return pd.Series(out)


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


# Discriminative-shingle candidate generation: a shingle seen in more than
# _DF_CAP docs can't identify a near-dup pair (it's corpus boilerplate) and
# is what makes a naive inverted-index self-join quadratic — Σ df² explodes
# on boilerplate. Prefix-filtered similarity joins therefore generate
# candidates from rare shingles only and verify exact Jaccard on the full
# sets afterwards; pairs sharing *no* rare shingle are out of scope by
# definition (both the DataFrame plan and the oracle SQL apply the same
# rule, so the engines agree by construction).
_DF_CAP = 100

# Intersection sizes come from the inverted index (cand ⋈ inv ⋈ inv,
# GROUP BY pair) rather than per-pair list_intersect: inv rows are
# per-doc DISTINCT shingles, so count(*) == len(list_intersect) exactly,
# and the hash-join shape is ~8x faster in DuckDB (r11: 37s -> 4s at
# sf0.001, value-identical both SFs — the old list_intersect FILTER
# evaluated two O(|s|) intersects per candidate over 99k candidates).
# MATERIALIZED pins single evaluation where the clusters oracles
# reference pairs from multiple recursive branches.
_PAIRS_SQL = f"""
    sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS s FROM documents),
    inv AS MATERIALIZED (SELECT doc_id, unnest(s) AS g FROM sh),
    rare AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= {_DF_CAP}),
    rinv AS (SELECT doc_id, g FROM inv JOIN rare USING (g)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM rinv a JOIN rinv b ON a.g = b.g AND a.doc_id < b.doc_id
             WHERE a.doc_id < 300),
    isect AS MATERIALIZED (
        SELECT c.doc_a, c.doc_b, count(*) AS ni
        FROM cand c
        JOIN inv a ON a.doc_id = c.doc_a
        JOIN inv b ON b.doc_id = c.doc_b AND b.g = a.g
        GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS MATERIALIZED (
        SELECT i.doc_a, i.doc_b,
               CAST(i.ni AS DOUBLE) / (len(x.s) + len(y.s) - i.ni) AS jaccard
        FROM isect i JOIN sh x ON x.doc_id = i.doc_a JOIN sh y ON y.doc_id = i.doc_b
        WHERE CAST(i.ni AS DOUBLE) / (len(x.s) + len(y.s) - i.ni) >= 0.5
    )
"""


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase exact-Jaccard near-dup join (DataFrame twin of _PAIRS_SQL).

    Runs on int64 shingle CODES (_shingle_codes_udf — injective packing,
    value-identical to the oracle's string computation) so the persist,
    the df groupBy, the candidate join and the verify intersections all
    move fixed-width longs."""
    d = load_table(spark, sf_dir, "documents")
    # The shingle table feeds five consumers (df count, both candidate
    # sides, both verify sides); persist amortizes the shingling pass
    # across them (A/B-measured 4.4 s vs 5.5 s for an eager
    # localCheckpoint under bench conditions at sf0.1).
    sh = d.select("doc_id", _shingle_codes_udf(F.col("text")).alias("s")).transform(track_persist)
    inv = sh.select("doc_id", F.explode("s").alias("g"))
    # global df via partial-aggregated groupBy (the shuffle carries one
    # (g, count) partial per shingle per partition, never the 2.5M inv
    # rows a window-over-g would move), then join the rare set back.
    # Catalyst broadcasts it while it's small and falls back to a shuffle
    # join when the rare tail outgrows the threshold at corpus scale.
    rare = (
        inv.groupBy("g").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _DF_CAP)
        .select("g")
    )
    # rinv feeds both sides of the candidate self-join; Spark re-executes a
    # referenced subplan per reference, which would run the df groupBy +
    # join twice over the 1M-row inverted index. The rare-shingle postings
    # list is tiny (~17k rows at sf0.1) — checkpoint it once.
    rinv = inv.join(rare, "g").select("doc_id", "g").localCheckpoint(eager=True)
    cand = (
        rinv.filter(F.col("doc_id") < 300)
        .select(F.col("doc_id").alias("doc_a"), "g")
        .join(rinv.select(F.col("doc_id").alias("doc_b"), "g"), "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    xa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    xb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    jac = inter / (F.size("sa") + F.size("sb") - inter)
    return (
        cand.join(xa, "doc_a")
        .join(xb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"WITH {_PAIRS_SQL} SELECT doc_a, doc_b, jaccard FROM pairs",
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 6-gram Jaccard near-dup pairs (ground truth for MinHash) as a
    two-phase prefix-filtered similarity join: (1) candidates = doc pairs
    sharing at least one DISCRIMINATIVE shingle (global df <= 100; an
    inverted-index self-join restricted to rare shingles, so the work is
    Σ_rare df² — bounded by cap·|inv| — instead of the boilerplate-driven
    Σ_all df² that makes naive inverted joins quadratic); (2) exact
    Jaccard on the full shingle sets for candidates only, via native
    array_intersect. The LEFT endpoint is bounded (doc_id < 300) to keep
    the oracle small; the right side scans the whole corpus — planted
    near-dup partners live at random ids, so a both-sides bound goes
    vacuous as n grows. The fully unbounded scale path is
    dedup_minhash_lsh (same two-phase shape, minhash bands as phase 1)."""
    return _jaccard_pairs(spark, sf_dir)


@query("dedup_minhash_lsh", oracle=None, tags=("llm", "dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup detection — the 100-TB formulation.

    shingle(6-gram) → 16 minhash values (xxhash64 seeded by slot) → 4
    bands of 4 → explode to (band_id, band_signature) keys → self-join on
    equal band keys gives CANDIDATE pairs only → verify true Jaccard on
    candidates, keep >= 0.5. With j=0.9 dup pairs, P(candidate) =
    1-(1-j⁴)⁴ ≈ 0.96; work is O(n·k) + O(candidates) — no all-pairs
    product ever materializes. Engine-native xxhash64 → rows-only check
    (tests assert it finds the exact query's ground-truth pairs).
    """
    from pyspark.sql.types import ArrayType, LongType

    d = load_table(spark, sf_dir, "documents", rebalance_on="doc_id")
    # The shingle table feeds three consumers (signatures + both sides of
    # the candidate-verify join); persist it so the shingling + distinct
    # pass runs once, not three times. Long codes (injective packing, see
    # _shingle_codes_udf) keep the cache and every join long-typed.
    sh = d.select("doc_id", _shingle_codes_udf(F.col("text")).alias("s")).transform(track_persist)

    # Each shingle is hashed ONCE in the JVM (xxhash64 → 31-bit); the 16
    # minhash slots are affine permutations (h·a+b mod P) of that hash,
    # computed vectorized in an Arrow-batched pandas UDF. Rationale:
    # higher-order lambdas run interpreted (no codegen), so 16 string-hash
    # passes over every shingle cost ~26 s at sf0.1; one JVM hash pass +
    # a numpy (n_shingles × 16) min costs ~4 s — same signatures family,
    # 6× cheaper, and the UDF moves only long arrays through Arrow.
    P = 4294967311  # prime > 2^32
    rng = np.random.default_rng(20240202)
    A = rng.integers(1, 1 << 31, size=16, dtype=np.int64)
    B = rng.integers(0, 1 << 31, size=16, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash16(harrs: pd.Series) -> pd.Series:
        out = []
        for h in harrs:
            hv = np.asarray(h, dtype=np.int64)[:, None]  # (n_shingles, 1)
            out.append(((hv * A + B) % P).min(axis=0))
        return pd.Series(out)

    # codes are already integers (injective packing) — the old per-shingle
    # JVM string hash collapses to a pmod reduction into the 31-bit domain
    # the affine permutations expect
    hashed = sh.select(
        "doc_id",
        F.transform("s", lambda x: F.pmod(x, F.lit(2147483647))).alias("h"),
    )
    # sigs feeds three consumers (band keys + both sides of the estimate
    # prefilter); each reference would re-run the JVM hash pass + minhash
    # UDF over the full shingle table. The signature table is n×16 longs —
    # checkpoint it once.
    sigs = hashed.select("doc_id", minhash16("h").alias("sig")).localCheckpoint(
        eager=True
    )
    # Band rows carry ONLY (doc_id, band_id, band_key) — 3 scalars. The
    # shingle arrays (~500 strings/doc) never enter the band shuffle; they
    # are re-joined for the (small) candidate set only.
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.xxhash64(F.slice("sig", b * 4 + 1, 4).cast("string")),
            )
        ).alias("band_id", "band_key"),
    )
    left = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    cand = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Ordinary same-language docs share enough common 4-grams (j≈0.4)
    # that 4-row bands admit many weak candidates (~150k at sf0.1).
    # Before the expensive exact verify, prefilter on the MinHash
    # ESTIMATE — matching slots / 16 over the two 16-long signatures —
    # which kills weak pairs for the cost of 16 integer compares. Pairs
    # at the 0.5 boundary have ~10% estimator false-negatives; the
    # strong near-dups the operator exists for (j>=0.9) pass with
    # probability ~1.
    sig_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("siga"))
    sig_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sigb"))
    est = (
        F.size(
            F.filter(
                F.zip_with("siga", "sigb", lambda x, y: x == y), lambda m: m
            )
        ).cast("double")
        / 16.0
    )
    likely = (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .filter(est >= 0.35)
        .select("doc_a", "doc_b")
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        likely.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
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


@query("dedup_simhash", oracle=_simhash_sql(), tags=("llm", "dedup"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures (near-dup docs agree on most bits; dedup
    then buckets by signature or hamming-ball probes). md5-derived bits so
    the oracle matches bit-for-bit; the per-bit vote runs vectorized in an
    Arrow-batched pandas UDF over the JVM-hashed token ints — integer math
    is exact either way, and the 16 interpreted per-bit folds the pure-
    expression version needed cost ~5 s at sf0.1 vs ~1.5 s here. At scale
    swap md5 for xxhash64 (same plan, cheaper hash)."""
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def simhash16(hs: pd.Series) -> pd.Series:
        bits = np.arange(16, dtype=np.int64)
        out = np.empty(len(hs), dtype=np.int32)
        for i, h in enumerate(hs):
            hv = np.asarray(h, dtype=np.int64)[:, None]  # (n_tokens, 1)
            votes = (((hv >> bits) & 1) * 2 - 1).sum(axis=0)  # (16,)
            out[i] = int(((votes > 0).astype(np.int64) << bits).sum())
        return pd.Series(out)

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    hs = F.transform(toks, lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("int"))
    return d.select("doc_id", simhash16(hs).alias("simhash16"))


@query(
    "dedup_clusters",
    oracle=f"""
        WITH RECURSIVE {_PAIRS_SQL},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (
            SELECT doc_id FROM documents WHERE doc_id < 300
            UNION SELECT doc_a FROM pairs
            UNION SELECT doc_b FROM pairs
        ),
        reach AS (
            SELECT doc_id AS a, doc_id AS b FROM nodes
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
        FROM reach GROUP BY a
    """,
    tags=("llm", "dedup", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS via connected components — the step after pair
    detection that actual dedup needs (A~B and B~C must collapse to one
    keeper even when A~C was never scored). Iterative min-label
    propagation over the near-dup edge set: each round every node takes
    the min label in its neighborhood (one hop per round), until a full
    fixpoint — labels only ever decrease, so an unchanged label SUM over
    a round means converged, checked with one centroid-sized agg action
    per round instead of a fixed round count. Each round ends in
    ``localCheckpoint`` — the labels table is referenced twice per
    iteration, and without lineage truncation the logical plan doubles
    per round (2^rounds subtrees, OOM in a default-heap driver). Bounded
    here to the doc_id < 300 ground-truth subset so DuckDB's recursive
    CTE can act as the oracle. At 100 TB the identical loop runs on the
    MinHash candidate edges, each iteration one shuffle join + one
    checkpointed materialization of a (node, label) table — the standard
    DataFrame connected-components shape, with convergence always
    O(diameter) rounds."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").transform(track_persist)
    pairs.count()  # materialize under the full-width shuffle config
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).transform(track_persist)
    nodes = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id")
        # pair endpoints outside the id window are cluster members too
        .union(pairs.select(F.col("doc_a").alias("doc_id")))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    # The iteration state is edge-count-sized, far below the session's
    # fact-table shuffle width; per-round cost here is stage overhead, so
    # narrow the shuffle for the loop and restore after (a cluster run
    # sizes this to |edges| / target-partition-size instead).
    # conf.get without a default returns the effective SQLConf value, so
    # the restore in the finally is unconditional (ADVICE r5: a None-guard
    # could leave the session narrowed to 8 forever). AQE off inside the
    # loop only — per-round re-planning costs ~0.3 s at toy scale and its
    # coalescing fights the fixed-width loop (the pagerank r6 A/B).
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        prev_sum = None
        for _ in range(30):  # safety cap ≫ any real near-dup chain diameter
            neighbor_min = (
                edges.join(labels, edges.doc_b == labels.doc_id)
                .groupBy(F.col("doc_a").alias("doc_id"))
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            new_labels = (
                labels.join(neighbor_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                    ).alias("cluster_id"),
                )
            )
            # truncate lineage: labels feeds two joins next round, and an
            # uncheckpointed loop doubles the plan every iteration
            labels = new_labels.localCheckpoint(eager=True)
            cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
            if cur_sum == prev_sum:  # monotone labels: equal sum == fixpoint
                break
            prev_sum = cur_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    edges.unpersist()
    pairs.unpersist()
    return labels.select("doc_id", F.col("cluster_id").cast("long").alias("cluster_id"))


_EDOT_SQL = """list_reduce(list_transform(list_zip({a}, {b}),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"""


@query(
    "dedup_embedding_cosine",
    oracle=f"""
        WITH e AS (
            SELECT d.doc_id, d.lang, emb.embedding
            FROM documents d JOIN embeddings emb ON d.doc_id = emb.vec_id
            WHERE d.doc_id < 250
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.lang AS lang_a, b.lang AS lang_b,
               round({_EDOT_SQL.format(a='a.embedding', b='b.embedding')}
                     / (sqrt({_EDOT_SQL.format(a='a.embedding', b='a.embedding')})
                        * sqrt({_EDOT_SQL.format(a='b.embedding', b='b.embedding')})),
                     6) AS cosine
        FROM e a JOIN e b ON a.doc_id < b.doc_id
        ORDER BY cosine DESC, doc_a, doc_b LIMIT 20
    """,
    tags=("llm", "dedup", "vector"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: the semantic-similarity arm of the dedup
    family (exact hash / MinHash / SimHash / n-gram Jaccard catch textual
    duplication; embedding cosine catches paraphrases the lexical methods
    miss). Documents join their embedding rows (doc_id == vec_id), pairs
    are ranked by cosine, the top candidates surface with both sides'
    language metadata for the keep/drop decision. Oracle-checked on a
    bounded id prefix (exact all-pairs is the ground-truth tier); the
    unbounded scale path is the sign-LSH bucketing of vec_lsh_pairs —
    never all-pairs — with this exact scorer verifying only
    bucket-colliding candidates. Cosine is the same deterministic
    left-fold both engines evaluate bit-identically, rounded at 6dp only
    to make the ORDER BY tie-free."""
    from .llm_vectors import _dot

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    emb = load_table(spark, sf_dir, "embeddings")
    e = d.join(emb, d.doc_id == emb.vec_id).select("doc_id", "lang", "embedding")
    a = e.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"),
        F.col("embedding").alias("ea"),
    )
    b = e.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
        F.col("embedding").alias("eb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_dot(F.col("ea"), F.col("ea"))) * F.sqrt(_dot(F.col("eb"), F.col("eb")))
    )
    # broadcast the bounded side: the theta join compiles to
    # BroadcastNestedLoopJoin (streamed × small build), not a
    # CartesianProduct shuffle — same rows, partition-parallel probe
    return (
        a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "lang_a", "lang_b", F.round(cos, 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(20)
    )


@query("dedup_ml_minhash_join", oracle=None, tags=("llm", "dedup", "approx"))
def dedup_ml_minhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via Spark ML's MinHashLSH approxSimilarityJoin — the
    library counterpart of the hand-rolled dedup_minhash_lsh (both APIs
    exist for the same reason vec_lsh_pairs has vec_ml_lsh_join: a user
    picks either). Shingles hash into a fixed binary feature space
    (HashingTF 2^16, binary — presence, not counts, since MinHash is a
    set sketch), MinHashLSH buckets by 2 independent minhash tables, and
    the join's Jaccard DISTANCE threshold 0.6 admits pairs with
    similarity >= 0.4 on the hashed-feature sets.

    The join is BOUNDED — probe side doc_id < 300 (the exact-Jaccard
    ground truth's own candidate bound), build side doc_id < 1000 (a
    superset of the whole sf0.01 ground-truth corpus) — because ML
    MinHashLSH's approxSimilarityJoin OR-amplifies over numHashTables
    tables of a SINGLE minhash value each (it cannot express the banded
    AND of dedup_minhash_lsh), and on a low-vocabulary corpus the
    buckets are enormous: measured at sf0.1, the widest bucket holds
    612 of 5000 docs, a 300-doc probe against the full corpus already
    yields 150k candidate pairs, and the unbounded self-join runs 129 s
    vs ~3 s bounded. The hand-rolled banded version IS the 100-TB
    self-join path; this entry exists for library-API parity. Rows-only:
    hash seeds are engine-internal; tests assert consistency against
    the exact-Jaccard ground truth (dedup_ngram_jaccard). Wall time is
    dominated by one-time ML-pipeline initialization on first execution
    (~8 s; steady-state re-run is 2.0 s at sf0.1, measured)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    sh = d.select("doc_id", _shingles_udf(F.col("text")).alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 16, binary=True
    )
    # persist: fit + both approxSimilarityJoin sides re-execute their input
    # plan, which would re-run the shingle UDF pass three times otherwise
    feats = tf.transform(sh).transform(track_persist)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=2, seed=7)
    model = lsh.fit(feats)
    probe = feats.filter(F.col("doc_id") < 300)
    pairs = model.approxSimilarityJoin(probe, feats, 0.6, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (1 - F.col("jaccard_dist")).alias("jaccard_sim"),
        )
        .orderBy(F.desc("jaccard_sim"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(50)
    )


@query(
    "dedup_cluster_representatives",
    oracle=f"""
        WITH RECURSIVE {_PAIRS_SQL},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (
            SELECT doc_id FROM documents WHERE doc_id < 300
            UNION SELECT doc_a FROM pairs
            UNION SELECT doc_b FROM pairs
        ),
        reach AS (
            SELECT doc_id AS a, doc_id AS b FROM nodes
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        comp AS (
            SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
            FROM reach GROUP BY a
        ),
        memb AS (
            SELECT c.doc_id, c.cluster_id, d.n_chars
            FROM comp c JOIN documents d USING (doc_id)
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY n_chars DESC, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
            FROM memb
        )
        SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
               doc_id AS rep_doc, n_chars AS rep_chars
        FROM ranked WHERE rn = 1
    """,
    tags=("llm", "dedup"),
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper selection — the step a production dedup pipeline actually
    ships: after connected components collapse near-dup pairs into
    clusters, each cluster keeps its BEST member (here: most content,
    ties to the smallest doc_id) rather than the arbitrary min-label
    doc that the components algorithm happens to use as the cluster id.
    Returns one row per cluster with its size and representative.

    Scale shape: reuses dedup_clusters' iterative label propagation
    (O(diameter) checkpointed rounds), then one documents join for the
    quality column and one cluster-keyed window whose partitions are
    cluster-sized — tiny after dedup. The quality key is pluggable
    (n_chars here because it's oracle-exact; production uses the
    text_quality_score / text_rare_token_ratio signals)."""
    clusters = dedup_clusters(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    memb = clusters.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wc = Window.partitionBy("cluster_id")
    return (
        memb.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            "n_members",
            F.col("doc_id").alias("rep_doc"),
            F.col("n_chars").alias("rep_chars"),
        )
    )


@query(
    "dedup_line_rewrite",
    oracle="""
        WITH chunked AS (
            SELECT doc_id,
                   list_transform(
                       range(1, CAST(ceil(len(string_split(text, ' ')) / 10.0)
                                     AS INTEGER) + 1),
                       i -> array_to_string(
                           list_slice(string_split(text, ' '),
                                      (i - 1) * 10 + 1, (i - 1) * 10 + 10), ' ')
                   ) AS chunks
            FROM documents
        ),
        exploded AS (
            SELECT c.doc_id, g.i AS chunk_idx, c.chunks[g.i] AS chunk
            FROM chunked c,
                 LATERAL (SELECT unnest(range(1, len(c.chunks) + 1)) AS i) g
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
            FROM exploded
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                                   ORDER BY chunk_idx), '') AS rewritten
        FROM ranked
        GROUP BY doc_id
    """,
    tags=("llm", "dedup"),
)
def dedup_line_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide LINE-level exact dedup with document rewrite — the
    C4/CCNet step that removes repeated boilerplate lines across the
    whole corpus while keeping every document's first occurrence, then
    reassembles each document from its surviving lines in order. The
    corpus here has no newlines, so a "line" is a fixed 10-word segment
    (same operator shape, deterministic segmentation); the full
    rewritten text is emitted, so the oracle hash checks the actual
    reassembly, not just the counts.

    Scale shape (contrast with dedup_span_rewrite, which dedups repeated
    spans WITHIN a neighborhood): segmentation is a per-row array
    expression in the scan stage; the only corpus-sized shuffle carries
    (line-hash → here the line itself, doc_id, idx) triples; keep-first
    is a line-keyed window over duplicate-group-sized partitions
    (dedup_exact_keep_first mechanics); the rewrite re-aggregates by
    doc_id (second shuffle) with an order-pinned string_agg. At 100 TB
    the line column is replaced by xxhash64(line) in the window key so
    the shuffle carries 8-byte hashes, with the line text riding only
    the doc-keyed rewrite — same plan, smaller exchange."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_chunks = F.ceil(F.size(words) / F.lit(10.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.concat_ws(" ", F.slice(words, (i - 1) * 10 + 1, 10)),
    )
    exploded = d.select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    ).select("doc_id", (F.col("pos") + 1).alias("chunk_idx"), "chunk")
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct("chunk_idx", "chunk")
    )
    return ranked.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum((F.col("rn") == 1).cast("int")).cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["chunk"],
            ),
        ).alias("rewritten"),
    )
