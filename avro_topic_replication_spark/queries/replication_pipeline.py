"""Replication pipeline as driver-checkable queries.

The batch-path query is ORACLE-CHECKED: Foo records are synthesized from
the nation table (id = nationkey, name = nation name), pushed through the
full encode → replicate (decode, re-key, re-encode) → consume path, and
the decoded output must equal a trivial SELECT over nation — so the whole
Avro/Confluent/registry machinery is hash-verified, not just smoke-run.
The streaming-path query runs the R1–R9 pipeline (checkpoint, foreachBatch
transactional sink, read-committed consumer) end to end, rows-only.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import replication as R
from ..sources.registry import MockSchemaRegistry
from ..streaming.replay import SCRATCH
from . import query


def _nation_records(spark: SparkSession, sf_dir: str) -> list[dict]:
    rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    # 25 dimension rows: a fixture-parameter fetch, not a data collect.
    return [{"id": str(r["n_nationkey"]), "name": r["n_name"]} for r in rows]


def _staged_source(spark: SparkSession, sf_dir: str, registry: MockSchemaRegistry) -> str:
    """Deterministic source-topic fixture, written once per sf and reused
    (content depends only on nation + FOO_SCHEMA; a fresh registry scope
    always assigns the same first schema id, so the frames are stable)."""
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    src_dir = os.path.join(SCRATCH, "replq", sf_tag, "source-topic-a")
    if os.path.exists(os.path.join(src_dir, "_SUCCESS")):
        registry.register("source-topic-a-value", R.FOO_SCHEMA)  # same id 1
    else:
        R.write_envelope_fixture(
            spark,
            _nation_records(spark, sf_dir),
            src_dir,
            "source-topic-a",
            registry,
            R.FOO_SCHEMA,
        )
    return src_dir


@query(
    "replication_batch_roundtrip",
    oracle="""
        SELECT CAST(n_nationkey AS VARCHAR) AS kafka_key,
               CAST(n_nationkey AS VARCHAR) AS id,
               n_name AS name
        FROM nation
    """,
    tags=("replication", "avro"),
)
def replication_batch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3–R6 in batch mode, oracle-verified: nation → Foo records →
    Confluent-framed Avro source envelope → replicate transform (decode,
    extract id, re-key, re-encode under the target registry) → consumer
    decode. Output key/fields must hash-match SELECT ... FROM nation."""
    scope = uuid.uuid4().hex[:8]
    src_reg = MockSchemaRegistry.get_scope(f"src-{scope}")
    tgt_reg = MockSchemaRegistry.get_scope(f"tgt-{scope}")
    try:
        src_dir = _staged_source(spark, sf_dir, src_reg)
        env = spark.read.schema(R.KAFKA_ENVELOPE).parquet(src_dir)
        out = R.plan_replication(env, src_reg, tgt_reg, "target-topic-b", R.FOO_SCHEMA)
        decoded = R.decode_envelope(out, tgt_reg.snapshot(), R.FOO_SCHEMA)
        return decoded.select("kafka_key", "id", "name")
    finally:
        MockSchemaRegistry.drop_scope(f"src-{scope}")
        MockSchemaRegistry.drop_scope(f"tgt-{scope}")


@query("replication_stream_live", oracle=None, tags=("replication", "avro", "live"))
def replication_stream_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full R1–R9 streaming pipeline: envelope-dir source (Kafka
    stand-in) → decode/re-key/encode → foreachBatch write-then-commit-
    marker sink with checkpointing → read-committed consumer decode.
    Rows-only (sink layout is engine-defined); the pytest golden test
    asserts the key==value.id contract on this exact path."""
    scope = uuid.uuid4().hex[:8]
    src_reg = MockSchemaRegistry.get_scope(f"src-{scope}")
    tgt_reg = MockSchemaRegistry.get_scope(f"tgt-{scope}")
    try:
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        base = os.path.join(SCRATCH, "replq-live", sf_tag, scope)
        src_dir = _staged_source(spark, sf_dir, src_reg)
        tgt_dir = os.path.join(base, "target-topic-b")
        ckpt = os.path.join(base, "ckpt")
        R.replicate_stream(
            spark, src_dir, tgt_dir, src_reg, tgt_reg,
            "target-topic-b", R.FOO_SCHEMA, ckpt,
        )
        out_env = R.read_committed(spark, tgt_dir)
        return R.decode_envelope(out_env, tgt_reg.snapshot(), R.FOO_SCHEMA).select(
            "kafka_key", "id", "name", "topic", "offset"
        )
    finally:
        MockSchemaRegistry.drop_scope(f"src-{scope}")
        MockSchemaRegistry.drop_scope(f"tgt-{scope}")


@query(
    "replication_stream_roundtrip",
    oracle="""
        SELECT CAST(n_nationkey AS VARCHAR) AS kafka_key,
               CAST(n_nationkey AS VARCHAR) AS id,
               n_name AS name
        FROM nation
    """,
    tags=("replication", "avro", "streaming"),
)
def replication_stream_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 capability statement, driver-hash-verified end to end on
    the STREAMING path: envelope-dir source (Kafka stand-in, R1) →
    read-committed filter (R2) → Confluent-Avro decode with registry
    dispatch (R3) → extract value.id (R4) → re-key key = str(id) (R5) →
    re-encode + auto-register on the target registry (R6) → foreachBatch
    transactional commit-marker sink with checkpointing (R7–R8, offsets
    acked post-commit R9) → read-committed consumer decode. The decoded
    target topic must hash-match ``SELECT ... FROM nation`` exactly —
    every record exactly once, key == value.id (mirrors
    reference ReplicationApplicationTest.java:118-124)."""
    scope = uuid.uuid4().hex[:8]
    src_reg = MockSchemaRegistry.get_scope(f"src-{scope}")
    tgt_reg = MockSchemaRegistry.get_scope(f"tgt-{scope}")
    try:
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        base = os.path.join(SCRATCH, "replq-rt", sf_tag, scope)
        src_dir = _staged_source(spark, sf_dir, src_reg)
        tgt_dir = os.path.join(base, "target-topic-b")
        ckpt = os.path.join(base, "ckpt")
        R.replicate_stream(
            spark, src_dir, tgt_dir, src_reg, tgt_reg,
            "target-topic-b", R.FOO_SCHEMA, ckpt,
        )
        out_env = R.read_committed(spark, tgt_dir)
        return R.decode_envelope(out_env, tgt_reg.snapshot(), R.FOO_SCHEMA).select(
            "kafka_key", "id", "name"
        )
    finally:
        MockSchemaRegistry.drop_scope(f"src-{scope}")
        MockSchemaRegistry.drop_scope(f"tgt-{scope}")


@query(
    "replication_evolved_consumer",
    oracle="""
        SELECT CAST(n_nationkey AS VARCHAR) AS id,
               n_name AS name,
               CASE WHEN n_nationkey % 2 = 0 THEN 'untagged'
                    ELSE 'r' || CAST(n_regionkey AS VARCHAR) END AS tag
        FROM nation
    """,
    tags=("replication", "avro", "evolution"),
)
def replication_evolved_consumer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-schema-version topic read by an EVOLVED consumer, end to end
    and hash-verified: even nation keys are produced under Foo v1, odd
    keys under v2 (adds `tag` with default 'untagged'); the consumer
    decodes every record with its per-record writer schema (Confluent
    frame id -> registry snapshot) and resolves onto the v2 reader, so
    v1 records surface the default — registry BACKWARD compatibility on
    the real envelope path, not just the codec unit test. Arrow-batched
    decode; registry resolution is plan-time (snapshot in the closure)."""
    import datetime as dt

    from collections.abc import Iterator

    import pandas as pd

    from ..functions import avro_codec

    scope = uuid.uuid4().hex[:8]
    reg = MockSchemaRegistry.get_scope(f"evo-{scope}")
    try:
        sid1 = reg.register("source-topic-a-value", R.FOO_SCHEMA)
        sid2 = reg.register("source-topic-a-value", R.FOO_SCHEMA_V2)
        rows = []
        for i, r in enumerate(
            load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
        ):  # 25 dimension rows: fixture production, not a data collect
            if r["n_nationkey"] % 2 == 0:
                payload = avro_codec.serialize_confluent(
                    {"id": str(r["n_nationkey"]), "name": r["n_name"]},
                    R.FOO_SCHEMA,
                    sid1,
                )
            else:
                payload = avro_codec.serialize_confluent(
                    {
                        "id": str(r["n_nationkey"]),
                        "name": r["n_name"],
                        "tag": f"r{r['n_regionkey']}",
                    },
                    R.FOO_SCHEMA_V2,
                    sid2,
                )
            rows.append(
                (None, payload, "source-topic-a", 0, i, dt.datetime(2024, 1, 1))
            )
        env = spark.createDataFrame(rows, R.KAFKA_ENVELOPE)
        snapshot = reg.snapshot()

        def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, names, tags = [], [], []
                for vraw in pdf["value"]:
                    _, rec = avro_codec.deserialize_confluent_evolved(
                        bytes(vraw), snapshot, R.FOO_SCHEMA_V2
                    )
                    ids.append(rec["id"])
                    names.append(rec["name"])
                    tags.append(rec["tag"])
                yield pd.DataFrame({"id": ids, "name": names, "tag": tags})

        return env.mapInPandas(dec, schema="id string, name string, tag string")
    finally:
        MockSchemaRegistry.drop_scope(f"evo-{scope}")
