"""Registry invariants: the driver harness samples a fixed-size prefix of
the registry's presentation order for its correctness gate, so the prefix
must always be spent on oracle-bearing queries that have never received a
driver CORRECTNESS row. Pure-Python — no SparkSession needed."""

from __future__ import annotations

from avro_topic_replication_spark.queries import (
    _DRIVER_SAMPLED,
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
