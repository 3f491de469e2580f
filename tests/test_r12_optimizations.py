"""Focused tests for r12 optimization rewrites of operator INTERNALS.

Two r12 changes replaced an implementation wholesale rather than
re-arranging a plan, so the oracle hash alone is thin cover for their
edge cases:

- ``_shingle_codes_udf`` gained a vectorized numpy path for ASCII texts
  (sliding_window_view + shifts + np.unique) beside the scalar
  ``_pack_shingle_code`` fallback. Every consumer is order-free, so the
  contract is SET equality with the scalar path, plus distinctness.
- ``text_repetition_metrics`` became a single mapInPandas Counter pass
  (was explode → groupBy → groupBy → join). The contract is the old
  shape's exact semantics, including the split-on-space corner cases
  (empty string tokenizes to [''], NULL text drops the row).
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest


def test_shingle_vectorized_matches_scalar_path():
    from avro_topic_replication_spark.queries.llm_dedup import (
        _pack_shingle_code,
        _shingle_codes_udf,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",            # heavy shingle repetition
        "abcdef",                      # exactly one shingle
        "abcde",                       # shorter than a shingle
        "",                            # empty
        None,                          # null text
        "naïve café déjà vu encore",   # non-ASCII → scalar fallback
        "x" * 5 + "é" + "y" * 5,       # mixed: non-ASCII mid-string
        "0123456789" * 20,             # long ASCII
    ]
    fn = _shingle_codes_udf.func  # the raw pandas function behind the UDF
    out = fn(pd.Series(texts))

    for t, codes in zip(texts, out):
        codes = list(codes)
        if t is None:
            assert codes == []
            continue
        n = max(len(t) - 5, 1)
        expected = {
            _pack_shingle_code(s)
            for s in dict.fromkeys(t[i : i + 6] for i in range(n))
        }
        assert set(codes) == expected, f"code set diverged for {t!r}"
        assert len(codes) == len(expected), f"duplicates emitted for {t!r}"


def _expected_repetition(rows):
    """Brute-force positional replay of the DECLARED (r11 explode/groupBy)
    semantics — deliberately a different algorithm from the production
    Counter pass (ADVICE r12 item 4: expected values derived with the
    same Counter code could cancel out a shared misunderstanding of the
    contract). A token/bigram is 'duplicated' when any OTHER index holds
    the same value; the top-word fraction is the max positional
    occurrence count — O(n²) index scans, no Counter, no groupBy."""
    exp = {}
    for doc_id, text in rows:
        if text is None:
            continue
        ws = text.split(" ")
        n = len(ws)
        dup = sum(
            1
            for i in range(n)
            if any(ws[j] == ws[i] for j in range(n) if j != i)
        )
        top = max(
            sum(1 for w in ws if w == ws[i]) for i in range(n)
        ) / n
        bgs = [f"{ws[i]} {ws[i + 1]}" for i in range(n - 1)]
        ng = len(bgs)
        dg = sum(
            1
            for i in range(ng)
            if any(bgs[j] == bgs[i] for j in range(ng) if j != i)
        )
        exp[doc_id] = (n, top, dup / n, dg / max(ng, 1))
    return exp


def test_repetition_metrics_edge_cases(spark, tmp_path):
    rows = [
        (1, "a b c d e"),                # no repeats
        (2, "a a a a"),                  # one word repeated (dup bigrams too)
        (3, "word"),                     # single word: no bigrams
        (4, ""),                         # empty string: [''] → n=1
        (5, None),                       # NULL text: row must vanish
        (6, "x y x y x"),                # repeated bigrams, distinct words
        (7, "solo dup dup solo solo"),   # mixed multiplicities
    ]
    sf_dir = str(tmp_path / "sfX")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )

    from avro_topic_replication_spark.queries import all_queries

    got = {
        r["doc_id"]: (
            r["n_words"],
            r["top_word_frac"],
            r["dup_word_frac"],
            r["dup_bigram_frac"],
        )
        for r in all_queries()["text_repetition_metrics"]
        .fn(spark, sf_dir)
        .collect()
    }
    exp = _expected_repetition(rows)
    assert set(got) == set(exp)  # doc 5 (NULL) must be absent
    for doc_id, e in exp.items():
        g = got[doc_id]
        assert g[0] == e[0], (doc_id, g, e)
        for gi, ei in zip(g[1:], e[1:]):
            assert math.isclose(gi, ei, rel_tol=0, abs_tol=0.0), (doc_id, g, e)
