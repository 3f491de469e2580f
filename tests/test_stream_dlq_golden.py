"""Golden binding the STREAMING DLQ arm to the driver-verified batch arm.

``replication_dlq_routing`` (batch) is hash-verified by the round driver
against the nation oracle (CORRECTNESS_r07: rows+schema+hash green). The
streaming twin ``replication_stream_dlq`` runs the same corruption classes
through the real two-sink batch-atomic writer and is rows-only by design
(its sink layout is engine-defined). This golden closes that gap: on the
SAME sf fixture, the stream arm's per-disposition accounting must equal
the batch arm's — count, min offset, and the ok-rows' distinct decoded
ids — so a regression in the streaming path (marker protocol, DLQ sink
schema, tolerant transform wiring) can no longer hide behind rows-only.
"""

from __future__ import annotations

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_stream_dlq_accounting_equals_driver_green_batch_arm(spark):
    from avro_topic_replication_spark.queries import all_queries

    qs = all_queries()
    batch = {
        r["disposition"]: r
        for r in qs["replication_dlq_routing"].fn(spark, SF_DIR).collect()
    }
    stream = {
        r["disposition"]: r
        for r in qs["replication_stream_dlq"].fn(spark, SF_DIR).collect()
    }

    # Identical disposition taxonomy (decode_error / unknown_schema / ok).
    assert set(batch) == set(stream) == {"decode_error", "unknown_schema", "ok"}

    for disp in sorted(batch):
        b, s = batch[disp], stream[disp]
        assert s["n"] == b["n"], disp
        assert s["min_offset"] == b["min_offset"], disp

    # Source offsets are unique, so the stream arm's distinct-offset count
    # on each DLQ class must equal the batch arm's row count — a DLQ sink
    # that duplicated or dropped rows across micro-batches would diverge.
    for disp in ("decode_error", "unknown_schema"):
        assert stream[disp]["n_distinct"] == batch[disp]["n"], disp

    # The good rows decode end-to-end in both arms: the stream arm's
    # distinct decoded ids (read back from the COMMITTED main sink) must
    # match the batch arm's driver-hash-verified count.
    assert stream["ok"]["n_distinct"] == batch["ok"]["n_distinct_ids"]
