"""Property fuzzing for the r10 text_bpe_encode_verified oracle twin
(the defer-sample discipline: fuzz BEFORE the r11 driver window can
reach it). The twin's contract is that Spark's production greedy-merge
fold (`_merge_pair`) and DuckDB's double-delimiter replace replay the
SAME encode, so the fuzz drives the places those two spellings can
diverge: self-pair runs ("eeee" under the e+e merge — non-overlapping
scan vs rescan-after-merge), chained merges whose outputs feed later
merges (t+h -> th+e -> the, a+n -> an+d), merged symbols whose SUFFIX
equals a later merge's left side ("the" before "r" must NOT fire e+r —
the cross-boundary false-match hazard of any string encoding),
out-of-alphabet tokens (uppercase/digits/1-char) passing through as
count-1 opaque tokens, and empty/whitespace-only documents. Runs the
REAL registered query against its REAL oracle SQL on randomized
tmp-parquet document fixtures."""

from __future__ import annotations

import os

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from avro_topic_replication_spark.queries import all_queries
from tests.oracle import compare

QS = all_queries()

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# In-alphabet words drive every merge (and their interactions); the rest
# exercise pass-through. "eeee"/"eeeee" pin the self-pair scan, "aan"
# pins the fold's lookback-1 restart, "ther" pins the merged-suffix
# false-match hazard (the 'e' inside "the" must not pair with 'r').
_WORDS = [
    "the", "then", "there", "and", "ananan", "aan", "eeee", "eeeee",
    "ther", "inon", "onin", "rere", "thth", "er", "re", "on", "in",
    "Xq", "a", "b7", "HELLO", "x",
]


def _con(base):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(base, 'documents.parquet')}/*.parquet')"
    )
    return con


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_bpe_encode_verified_merge_semantics_fuzz(
    spark, tmp_path_factory, docs
):
    q = QS["text_bpe_encode_verified"]
    base = str(tmp_path_factory.mktemp("bpevfuzz"))
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(
        os.path.join(base, "documents.parquet")
    )
    problems = compare(q.fn(spark, base), _con(base), q.oracle)
    assert not problems, (rows, problems)


def test_bpe_encode_verified_fold_matches_replace_directed(spark):
    """Directed equivalence check of the two merge spellings on the
    adversarial words, independent of any fixture: for each word, the
    production `_merge_pair` fold (what the Spark side runs) must yield
    the same subword count as a pure-Python greedy non-overlapping
    left-to-right merge (what the DuckDB replace encoding implements)."""
    import pyspark.sql.functions as F

    from avro_topic_replication_spark.queries.llm_scoring import (
        _BPEV_MERGES,
        _merge_pair,
    )

    def py_encode(word: str) -> int:
        syms = list(word)
        for a, b in _BPEV_MERGES:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    words = [w for w in _WORDS if len(w) >= 2 and w.islower()]
    syms = F.split("word", "")
    for a, b in _BPEV_MERGES:
        syms = _merge_pair(syms, a, b)
    got = {
        r["word"]: r["n"]
        for r in spark.createDataFrame([(w,) for w in words], "word string")
        .select("word", F.size(syms).alias("n"))
        .collect()
    }
    expected = {w: py_encode(w) for w in words}
    assert got == expected
