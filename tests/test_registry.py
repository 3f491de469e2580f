"""Registry invariants: the driver harness samples a fixed-size prefix of
the registry's presentation order for its correctness gate, so the prefix
must always be spent on oracle-bearing queries that have never received a
driver CORRECTNESS row. Pure-Python — no SparkSession needed."""

from __future__ import annotations

from avro_topic_replication_spark.queries import (
    _DRIVER_SAMPLED,
    _LAST_SAMPLED_ROUND,
    _RESAMPLE_FIRST,
    all_queries,
)

WINDOW = 50  # the harness's per-round sample size


def test_sample_window_drains_the_backlog():
    """While never-driver-sampled oracle queries exist, every slot of the
    harness's 50-row window must hold one of them (no slot wasted on a
    query that already has a driver row, or on a rows-only query that
    cannot produce a hash row)."""
    reg = all_queries()
    names = list(reg)
    backlog = [
        n
        for n in names
        if reg[n].oracle is not None
        and n not in _DRIVER_SAMPLED
        and "defer-sample" not in reg[n].tags
    ]
    window = names[: min(WINDOW, len(backlog))]
    for n in window:
        assert reg[n].oracle is not None, f"rows-only query in window: {n}"
        assert n not in _DRIVER_SAMPLED, f"already-sampled query in window: {n}"


def test_rewritten_queries_lead_the_window():
    """Every _RESAMPLE_FIRST query (implementation rewritten since its
    last driver row) must sit inside the next 50-row sample window, ahead
    of mere staleness re-samples — and must actually exist and carry an
    oracle (a rows-only query can't produce the hash row the re-sample is
    for)."""
    reg = all_queries()
    names = list(reg)
    window = set(names[:WINDOW])
    for n in _RESAMPLE_FIRST:
        assert n in reg, f"_RESAMPLE_FIRST names unknown query: {n}"
        assert reg[n].oracle is not None, f"rows-only in _RESAMPLE_FIRST: {n}"
        assert n in window, f"rewritten query not in sample window: {n}"
    assert len(_RESAMPLE_FIRST) <= WINDOW


def test_resamples_rotate_stalest_first():
    """With the backlog drained (r11: 307/307 oracle-bearing queries
    driver-green), each round's 50-row window must re-verify the STALEST
    rows — the window's newest last-sampled round may not exceed the
    oldest last-sampled round outside it (defer-tagged additions excepted —
    they sort to the back until their tag drops — and _RESAMPLE_FIRST
    rewrites excepted: a rewritten implementation outranks staleness)."""
    reg = all_queries()
    oracle = [
        n for n, q in reg.items()
        if q.oracle is not None
        and "defer-sample" not in q.tags
        and n not in _RESAMPLE_FIRST
    ]
    in_window = oracle[: WINDOW - len(_RESAMPLE_FIRST)]
    rest = oracle[WINDOW - len(_RESAMPLE_FIRST):]
    if not rest:
        return
    newest_in = max(_LAST_SAMPLED_ROUND.get(n, 0) for n in in_window)
    oldest_out = min(_LAST_SAMPLED_ROUND.get(n, 0) for n in rest)
    assert newest_in <= oldest_out, (newest_in, oldest_out)


def test_driver_sampled_names_exist():
    """Every name folded into _DRIVER_SAMPLED must still be a registered
    query — a rename would silently re-enqueue its old driver row."""
    reg = all_queries()
    missing = sorted(_DRIVER_SAMPLED - set(reg))
    assert not missing, missing


def test_every_query_has_fn_and_unique_oracle_columns():
    """Oracle-bearing queries must keep the compare contract: non-empty
    SQL text and a callable."""
    for name, q in all_queries().items():
        assert callable(q.fn), name
        if q.oracle is not None:
            assert q.oracle.strip(), name
