"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.2 LLM ops).

All pure column expressions — tokenization, quality scoring, language ID,
fingerprinting, and shingling run JVM-side inside whole-stage codegen with
zero Python on the hot path, so they scale like any projection: embarrass-
ingly parallel, no shuffle, predicate/column pruning intact. Each query has
a DuckDB oracle built from the same Python word lists so the two engines
stay in lockstep.

Reference parity note: the reference (timtebeek/avro-topic-replication)
has no text operators — this entire module is [EXT] surface mandated by
the north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

# Tiny embedded stopword lists (public, common knowledge). One Python
# source generates both the Spark expression and the oracle SQL.
STOP_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "was",
           "it", "for", "on", "with", "as", "at", "by", "be", "this", "that")
STOP_DE = ("der", "die", "das", "und", "oder", "von", "zu", "im", "ist",
           "war", "es", "für", "auf", "mit", "als", "bei", "sein", "ein")
STOP_FR = ("le", "la", "les", "et", "ou", "de", "à", "dans", "est",
           "était", "il", "pour", "sur", "avec", "comme", "par", "être", "un")


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _spark_list(words: tuple[str, ...]):
    return F.array(*[F.lit(w) for w in words])


_TOKENS_SQL = "string_split_regex(lower(text), '\\s+')"


def _tokens_col():
    return F.split(F.lower("text"), r"\s+")


def quality_gate():
    """THE char-level quality gate (length 100-20000, punct ratio < 0.1,
    digit ratio < 0.2) as a boolean Column over a ``text`` column — the
    single definition shared by text_quality_score's passes_quality,
    pipeline_corpus_curation's filter, text_quality_classifier's weak
    labels, and stream_live_doc_curation's streaming filter, so one
    threshold tweak cannot silently desynchronize them."""
    n_chars = F.length("text")
    punct_ratio = (
        F.regexp_count("text", F.lit(r"[\p{Punct}]")).cast("double") / n_chars
    )
    digit_ratio = F.regexp_count("text", F.lit("[0-9]")).cast("double") / n_chars
    return (
        n_chars.between(100, 20000) & (punct_ratio < 0.1) & (digit_ratio < 0.2)
    )


_LANGID_PRED_SQL = f"""
        hits AS (
            SELECT doc_id, lang,
                   len(list_filter(toks, w -> list_contains({_sql_list(STOP_EN)}, w))) AS en_hits,
                   len(list_filter(toks, w -> list_contains({_sql_list(STOP_DE)}, w))) AS de_hits,
                   len(list_filter(toks, w -> list_contains({_sql_list(STOP_FR)}, w))) AS fr_hits
            FROM t
        ),
        pred AS (
            SELECT doc_id, lang, en_hits, de_hits, fr_hits,
                   CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                        WHEN de_hits >= fr_hits THEN 'de'
                        ELSE 'fr' END AS predicted_lang
            FROM hits
        )"""


def _langid_hits_and_pred():
    """Stopword-hit counts and the argmax prediction Column — THE lang-id
    heuristic, shared by text_lang_id and text_langid_eval so the eval
    always measures exactly the classifier that runs."""
    toks = _tokens_col()

    def hits(words):
        return F.size(
            F.filter(toks, lambda w: F.array_contains(_spark_list(words), w))
        )

    en, de, fr = hits(STOP_EN), hits(STOP_DE), hits(STOP_FR)
    pred = (
        F.when((en >= de) & (en >= fr), "en")
        .when(de >= fr, "de")
        .otherwise("fr")
    )
    return en, de, fr, pred


@query(
    "text_tokenize_stats",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
        SELECT doc_id,
               len(toks) AS n_tokens,
               CAST(list_aggregate(list_transform(toks, w -> length(w)), 'sum')
                    AS BIGINT) AS total_token_chars,
               CAST(list_aggregate(list_transform(toks, w -> length(w)), 'sum') AS DOUBLE)
                 / len(toks) AS avg_token_len,
               len(list_filter(toks, w -> list_contains({_sql_list(STOP_EN)}, w)))
                 AS n_stopwords,
               CAST(len(list_filter(toks, w -> list_contains({_sql_list(STOP_EN)}, w)))
                    AS DOUBLE) / len(toks) AS stopword_ratio
        FROM t
    """,
    tags=("llm", "text"),
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + token/stopword statistics, all JVM-side.

    The 100-TB shape: a stateless projection — no shuffle, trivially
    partition-parallel; the regex split and higher-order filter stay in
    codegen (no Python UDF)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens_col()
    tok_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(_spark_list(STOP_EN), w)))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        tok_chars.cast("bigint").alias("total_token_chars"),
        (tok_chars.cast("double") / F.size(toks)).alias("avg_token_len"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / F.size(toks)).alias("stopword_ratio"),
    )


@query(
    "text_quality_score",
    oracle="""
        SELECT doc_id,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digits,
               len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
               CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                 / length(text) AS punct_ratio,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / length(text) AS digit_ratio,
               (length(text) BETWEEN 100 AND 20000)
                 AND (CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                      / length(text) < 0.1)
                 AND (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                      / length(text) < 0.2) AS passes_quality
        FROM documents
    """,
    tags=("llm", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality gates (length / punctuation / digit
    ratios) — the standard pre-training corpus filter, as a pure
    projection."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = F.regexp_count("text", F.lit(r"[\p{Punct}]"))
    n_digits = F.regexp_count("text", F.lit("[0-9]"))
    n_upper = F.regexp_count("text", F.lit("[A-Z]"))
    punct_ratio = n_punct.cast("double") / n_chars
    digit_ratio = n_digits.cast("double") / n_chars
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
        n_upper.alias("n_upper"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        quality_gate().alias("passes_quality"),
    )


@query(
    "text_lang_id",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents),
        {_LANGID_PRED_SQL}
        SELECT doc_id, lang, en_hits, de_hits, fr_hits, predicted_lang
        FROM pred
    """,
    tags=("llm", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (the classic cheap heuristic): count
    hits against per-language function-word lists, argmax with a
    deterministic tie rule. Column-expression only — at 100 TB this runs
    at scan speed."""
    d = load_table(spark, sf_dir, "documents")
    en, de, fr, pred = _langid_hits_and_pred()
    return d.select(
        "doc_id",
        "lang",
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        pred.alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
        WITH n AS (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                       ' +', ' ', 'g')) AS norm
            FROM documents
        )
        SELECT doc_id,
               md5(norm) AS norm_md5,
               CAST(('0x' || substring(md5(norm), 1, 15)) AS BIGINT) AS fp60,
               length(norm) AS norm_len
        FROM n
    """,
    tags=("llm", "text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprint: normalize (lowercase, strip
    non-alnum, collapse whitespace) then hash — the key for fuzzy-exact
    dedup that survives formatting noise. fp60 packs the first 15 hex
    digits into a bigint (cheap join/partition key at scale)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " ")
    )
    md5 = F.md5(norm)
    return d.select(
        "doc_id",
        md5.alias("norm_md5"),
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint").alias("fp60"),
        F.length(norm).alias("norm_len"),
    )


@query(
    "text_shingle_stats",
    oracle="""
        WITH s AS (
            SELECT doc_id,
                   list_transform(range(1, greatest(length(text) - 2, 1)),
                                  i -> substring(text, CAST(i AS INT), 4)) AS sh
            FROM documents
        )
        SELECT doc_id,
               len(sh) AS n_shingles,
               len(list_distinct(sh)) AS n_distinct_shingles,
               CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) AS shingle_diversity
        FROM s
    """,
    tags=("llm", "text", "dedup"),
)
def text_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 4-gram shingling (the MinHash substrate) + diversity
    ratio. sequence+transform keeps it in codegen; the shingle arrays
    never leave the executor — only the counts come back."""
    d = load_table(spark, sf_dir, "documents", rebalance_on="doc_id")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("text") - 3, F.lit(1))),
        lambda i: F.col("text").substr(i, F.lit(4)),
    )
    return d.select(
        "doc_id",
        F.size(sh).alias("n_shingles"),
        F.size(F.array_distinct(sh)).alias("n_distinct_shingles"),
        (F.size(F.array_distinct(sh)).cast("double") / F.size(sh)).alias(
            "shingle_diversity"
        ),
    )


@query(
    "text_tfidf",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
        WHERE tf.tf >= 3
    """,
    tags=("llm", "text", "tfidf"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: explode tokens → term frequency per doc, document frequency
    per term (both partial-aggregated shuffles), idf = ln(N/df) joined
    back. The tf>=3 cut bounds output; tfidf is rounded to 6 so the one
    transcendental (ln) can't differ in the last ulp across libm builds.

    Scale: two hash aggregations + one (broadcastable) join on term —
    no per-doc vocabularies ever collect anywhere."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # plan-time scalar (one cheap count job)
    return (
        tf.join(dfreq, "term")
        .filter(F.col("tf") >= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@query(
    "pipeline_corpus_curation",
    oracle="""
        WITH q AS (
            SELECT doc_id, lang, text FROM documents
            WHERE length(text) BETWEEN 100 AND 20000
              AND CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                    / length(text) < 0.1
              AND CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    / length(text) < 0.2
        ),
        d AS (
            SELECT doc_id, lang, text,
                   row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
            FROM q
        ),
        s AS (
            SELECT doc_id, lang, text FROM d
            WHERE rn = 1
              AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split_regex(lower(text), '\\s+'))) AS BIGINT)
                 AS total_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars
        FROM s GROUP BY lang
    """,
    tags=("llm", "text", "pipeline"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly curation job as ONE declarative plan — the composition
    the whole LLM-ops surface exists for: quality gates (length / punct /
    digit ratios, pure projection) → exact dedup keep-first (one shuffle
    on the content hash) → reproducible ~50% hash sample (map-side
    predicate) → per-language corpus accounting (one partial-agg
    shuffle). Two shuffles end to end, every stage JVM-side; Catalyst
    fuses the quality filter into the scan and the sample predicate into
    the dedup output — nothing materializes between stages. The same
    plan at 100 TB is bounded by the two shuffles, both on keys with no
    skew (content hash, language)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    quality = quality_gate()
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    survivors = (
        d.filter(quality)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < "8000")
    )
    toks = F.split(F.lower("text"), r"\s+")
    return survivors.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).cast("bigint").alias("total_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


@query(
    "text_pii_redaction",
    oracle="""
        WITH withpii AS (
            SELECT doc_id,
                   text || ' Contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(pii_text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(pii_text, '555-[0-9]{4}')) AS n_phones,
               sha256(regexp_replace(regexp_replace(pii_text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                   '555-[0-9]{4}', '[PHONE]', 'g')) AS redacted_sha
        FROM withpii
    """,
    tags=("llm", "text", "pii"),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training corpus gets:
    detect and replace email addresses and phone-shaped strings with
    placeholder tokens, pure regexp_replace projections in codegen (no
    shuffle, no Python). The corpus is synthetic, so deterministic PII is
    appended per doc first — both engines build the identical string, and
    the sha256 of the redacted output proves byte-identical scrubbing,
    not just equal counts. Regexes stay in the Java/RE2 common subset so
    the two engines match."""
    d = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"555-[0-9]{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(pii_text, email_re, "[EMAIL]"), phone_re, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.regexp_count(pii_text, F.lit(email_re)).alias("n_emails"),
        F.regexp_count(pii_text, F.lit(phone_re)).alias("n_phones"),
        F.sha2(redacted, 256).alias("redacted_sha"),
    )


# GPT-2-style pre-tokenizer, portability-reduced: contraction suffixes,
# letter runs, digit runs, single non-alnum marks. Both Java regex (Spark)
# and RE2 (DuckDB) interpret this subset identically — no lookarounds, no
# unicode property classes.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]"
_BPE_SQL = _BPE_RE.replace("'", "''")
_WS_RE = r"[^ \t\n]+"


@query(
    "text_bpe_token_count",
    oracle=f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_bpe_tokens,
               len(regexp_extract_all(text, '{_WS_RE}')) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '{_WS_RE}')), 1)
                 AS bpe_per_word
        FROM documents
    """,
    tags=("llm", "text", "tokens"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (contraction suffixes / letter runs / digit runs / punctuation marks)
    counted per document next to the whitespace word count — the
    tokens-per-word ratio is the standard proxy for how expensive a
    document is to a subword tokenizer (code and non-English text run
    high). Pure regexp_extract_all column expressions — stateless
    projection, zero shuffle, the same regex subset evaluated by Java
    regex and RE2 so both engines count identically."""
    d = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))
    ws = F.regexp_extract_all("text", F.lit(_WS_RE), F.lit(0))
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        (
            F.size(bpe).cast("double")
            / F.greatest(F.size(ws), F.lit(1))
        ).alias("bpe_per_word"),
    )


@query(
    "text_rare_token_ratio",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        vocab AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY word
        ),
        stats AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS vsize
            FROM vocab
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.cnt * s.vsize < s.total THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rare,
               CAST(SUM(CASE WHEN v.cnt * s.vsize < s.total THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS rare_frac
        FROM tok t JOIN vocab v ON v.word = t.word CROSS JOIN stats s
        GROUP BY t.doc_id
    """,
    tags=("llm", "text"),
)
def text_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative rarity scoring (the integer-exact stand-in for the
    CCNet/Gopher LM-perplexity filter, which needs a trained model): a
    token is "rare" when its corpus count is below the mean vocabulary
    count, and each document reports how much of it is rare tokens. The
    mean-count comparison stays in integers (cnt · |V| < Σcnt) — no float
    thresholds, so the result is bit-exact cross-engine; the one double
    division happens per output row at the end.

    Scale shape: the vocabulary aggregate partial-combines map-side
    (word-keyed, zipf-skewed but count-only rows); the corpus stats are a
    1-row broadcast; the token→vocab join is word-keyed with counts only.
    At 100 TB the vocab table is millions of rows — still join-sized —
    and nothing quadratic appears anywhere."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = tok.groupBy("word").agg(F.count("*").cast("bigint").alias("cnt"))
    stats = vocab.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("vsize"),
    )
    rare = F.when(F.col("cnt") * F.col("vsize") < F.col("total"), 1).otherwise(0)
    return (
        tok.join(vocab, "word")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(rare).cast("bigint").alias("n_rare"),
            (F.sum(rare).cast("double") / F.count("*")).alias("rare_frac"),
        )
    )


@query(
    "text_langid_eval",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents),
        {_LANGID_PRED_SQL},
        conf AS (
            SELECT lang, predicted_lang, COUNT(*) AS n
            FROM pred GROUP BY 1, 2
        ),
        tot AS (SELECT lang, SUM(n) AS lang_n FROM conf GROUP BY lang)
        SELECT c.lang, c.predicted_lang, CAST(c.n AS BIGINT) AS n,
               round(CAST(c.n AS DOUBLE) / t.lang_n, 6) AS frac_of_lang,
               c.lang = c.predicted_lang AS is_correct
        FROM conf c JOIN tot t USING (lang)
    """,
    tags=("llm", "text", "eval"),
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality evaluation for the stopword language ID: the
    confusion matrix of (true lang, predicted lang) with per-true-lang
    fractions — the eval harness a curation pipeline runs before
    trusting a cheap classifier at 100 TB (here it quantifies exactly
    how the 3-list heuristic collapses es/zh into the en/de/fr label
    set). Pure reuse of text_lang_id's prediction expression followed by
    a states²-bounded aggregate and a broadcast totals join — eval cost
    is scan-dominated, like the classifier itself."""
    d = load_table(spark, sf_dir, "documents")
    _, _, _, pred_col = _langid_hits_and_pred()
    pred = d.select("lang", pred_col.alias("predicted_lang"))
    conf = pred.groupBy("lang", "predicted_lang").agg(F.count("*").alias("n"))
    tot = conf.groupBy("lang").agg(F.sum("n").alias("lang_n"))
    return conf.join(F.broadcast(tot), "lang").select(
        "lang",
        "predicted_lang",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("lang_n"), 6).alias(
            "frac_of_lang"
        ),
        (F.col("lang") == F.col("predicted_lang")).alias("is_correct"),
    )


@query(
    "text_collocations_pmi",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
        ),
        uni AS (
            SELECT unnest(ws) AS w FROM toks
        ),
        uni_cnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        bg AS (
            SELECT ws[i] || ' ' || ws[i + 1] AS b,
                   ws[i] AS w1, ws[i + 1] AS w2
            FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i) g
        ),
        bg_cnt AS (
            SELECT b, w1, w2, COUNT(*) AS c_xy FROM bg GROUP BY b, w1, w2
        ),
        tot AS (
            SELECT (SELECT COUNT(*) FROM uni) AS n_uni,
                   (SELECT COUNT(*) FROM bg) AS n_bg
        )
        SELECT b AS bigram,
               CAST(c_xy AS BIGINT) AS c_xy,
               round(ln(CAST(c_xy AS DOUBLE) * n_uni * n_uni
                        / (CAST(n_bg AS DOUBLE) * x.c * y.c)), 6) AS pmi
        FROM bg_cnt
        JOIN uni_cnt x ON x.w = w1
        JOIN uni_cnt y ON y.w = w2
        CROSS JOIN tot
        WHERE c_xy >= 5
        ORDER BY pmi DESC, bigram ASC
        LIMIT 20
    """,
    tags=("llm", "text"),
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: which adjacent
    word pairs co-occur far above chance — the classic corpus-statistics
    signal for multiword expressions (and a cheap tokenizer-merge-rule
    candidate generator). PMI = ln(p(xy) / (p(x)·p(y))) computed from
    exact integer counts; pairs seen < 5 times are dropped (PMI is
    unstable on rare events), top-20 with a (pmi, bigram) total order.

    Scale shape: ONE corpus-sized explode each for unigrams and bigrams,
    both landing in partial-aggregated hash counts that are vocab- and
    bigram-vocab-bounded; the PMI join runs on those bounded tables
    (broadcastable at 10^6-word vocabularies); totals ride as a
    broadcast 1-row aggregate; top-20 is TakeOrderedAndProject. The log
    is one IEEE op on identical integer inputs, rounded to 6 — the
    text_tfidf transcendental discipline."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.lower("text"), " ").alias("ws"))
    n = F.size("ws")
    uni = toks.select(F.explode("ws").alias("w"))
    uni_cnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    bg = toks.filter(n >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, n - 1),
                F.slice("ws", 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select(F.concat_ws(" ", "p.w1", "p.w2").alias("b"), "p.w1", "p.w2")
    bg_cnt = bg.groupBy("b", "w1", "w2").agg(F.count("*").alias("c_xy"))
    tot = uni.agg(F.count("*").alias("n_uni")).crossJoin(
        bg.agg(F.count("*").alias("n_bg"))
    )
    x = uni_cnt.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    y = uni_cnt.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    pmi = F.round(
        F.log(
            F.col("c_xy").cast("double")
            * F.col("n_uni")
            * F.col("n_uni")
            / (F.col("n_bg").cast("double") * F.col("c_x") * F.col("c_y"))
        ),
        6,
    )
    return (
        bg_cnt.filter(F.col("c_xy") >= 5)
        .join(x, "w1")
        .join(y, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("b").alias("bigram"),
            F.col("c_xy").cast("bigint").alias("c_xy"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "text_char_entropy",
    oracle="""
        WITH chars AS (
            SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
            FROM documents
        ),
        counts AS (
            SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM chars WHERE ch <> '' GROUP BY 1, 2
        ),
        g AS (
            SELECT doc_id,
                   list(cnt ORDER BY ch) AS cs,
                   CAST(SUM(cnt) AS BIGINT) AS n_chars
            FROM counts GROUP BY doc_id
        )
        SELECT doc_id, n_chars,
               CAST(len(cs) AS BIGINT) AS n_distinct_chars,
               round(-list_reduce(
                   list_transform(cs, c ->
                       (CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE))
                       * log2(CAST(c AS DOUBLE) / CAST(n_chars AS DOUBLE))),
                   (a, b) -> a + b), 6) AS char_entropy_bits
        FROM g
    """,
    tags=("llm", "text", "quality"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    CCNet-family quality signal that separates natural prose (~4 bits)
    from boilerplate, repeated padding, and binary junk. The -Σ p·log2 p
    sum runs as an ordered fold over the char-sorted count list (the
    ts_cusum_drift discipline: same UTF-8 code-point order, same IEEE op
    order on both engines), then rounded to 6 decimals: log2 is NOT
    correctly rounded in either engine's libm, so the raw folds differ by
    1 ulp — the same reason text_tfidf/text_keyword_topk round their
    ln-based scores (the established repo pattern for transcendentals).

    Scale shape: the char explode is scan-side and collapses immediately
    to per-(doc, char) counts (≤ alphabet-size rows per doc after the
    map-side partial); the fold runs on that bounded list. One doc-keyed
    shuffle end-to-end; nothing driver-side.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("cnt"))
    )
    g = counts.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ch", "cnt"))),
            lambda r: r["cnt"],
        ).alias("cs")
    )
    tot = F.aggregate(
        "cs", F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    g = g.withColumn("n_chars", tot)
    p = lambda c: c.cast("double") / F.col("n_chars").cast("double")  # noqa: E731
    return g.select(
        "doc_id",
        "n_chars",
        F.size("cs").cast("bigint").alias("n_distinct_chars"),
        F.round(
            -F.aggregate(
                F.transform("cs", lambda c: p(c) * F.log2(p(c))),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("char_entropy_bits"),
    )
