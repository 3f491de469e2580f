"""The reference's own capability: exactly-once Avro topic replication
(R1–R9), Spark-first.

Reference dataflow (SURVEY.md §2.1; ReplicationApplication.java:62-101):
Kafka source → read-committed filter → Confluent-Avro deserialize →
extract value.id → re-key → Confluent-Avro serialize (auto-register) →
transactional sink → batch barrier → post-commit offset ack.

Spark mapping implemented here:

| R# | reference mechanism                | this module                      |
|----|------------------------------------|----------------------------------|
| R1 | @KafkaListener batches ≤500        | readStream (envelope dir replay; |
|    | (README.adoc:34)                   | kafka_source_options for a real  |
|    |                                    | cluster, maxOffsetsPerTrigger)   |
| R2 | isolation read-committed           | read_committed() — only          |
|    | (application.yml:10)               | marker-committed batches visible |
| R3 | KafkaAvroDeserializer              | Arrow-batched decode against a   |
|    | (application.yml:12)               | plan-time registry snapshot      |
| R4 | consumerRecord.get("id") (:71)     | record["id"] in the same pass    |
| R5 | re-key with id.toString() (:70-71) | key = Confluent-framed Avro      |
|    |                                    | string of id (serde parity)      |
| R6 | KafkaAvroSerializer + auto-register| encode + register() at plan time |
|    | (application.yml:15-16,README:27)  | against the target registry      |
| R7 | executeInTransaction (:66-78)      | foreachBatch: write data, then   |
| R8 | future.get barrier → abort (:80-94)| atomically create commit marker; |
|    |                                    | any task failure fails the batch |
|    |                                    | before the marker exists         |
| R9 | ack after commit (:99-100)         | checkpoint advances only after   |
|    |                                    | foreachBatch returns             |

Crash-window semantics (honest, mirroring README.adoc:22-25): a crash
after data-write but before marker leaves an uncommitted batch dir that
read_committed() ignores and a replay overwrites — effectively-exactly-
once for committed readers, exactly the reference's contract.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions import avro_codec
from ..sources.registry import MockSchemaRegistry

# A2 envelope (FIXTURES.md): the fixed schema of Spark's Kafka source.
KAFKA_ENVELOPE = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
    ]
)

# The reference's Avro fixture (com.foo.Foo.avsc:1-19).
FOO_SCHEMA = {
    "type": "record",
    "name": "Foo",
    "namespace": "com.foo",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "name", "type": ["null", "string"], "default": None},
    ],
}

# A BACKWARD-compatible evolution of Foo (new field with a default) — the
# registry's default compatibility mode admits exactly this kind of change.
FOO_SCHEMA_V2 = {
    "type": "record",
    "name": "Foo",
    "namespace": "com.foo",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "tag", "type": "string", "default": "untagged"},
    ],
}

STRING_SCHEMA = "string"  # output key schema (KafkaAvroSerializer on a String)


def kafka_source_options(bootstrap: str, topic: str) -> dict[str, str]:
    """R1/R2 options for a real cluster: spark.readStream.format("kafka")
    .options(**kafka_source_options(...)). Batch bound mirrors the
    reference's ≤500-record listener batches (README.adoc:34); read
    committed mirrors application.yml:10; failOnDataLoss mirrors
    setMissingTopicsFatal (ReplicationApplication.java:41)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "500",
        "kafka.isolation.level": "read_committed",
        "failOnDataLoss": "true",
    }


# ---------------------------------------------------------------------------
# R3–R6: decode → re-key → encode, one Arrow-batched pass
# ---------------------------------------------------------------------------
def replicate_transform(
    env: DataFrame,
    schemas_by_id: dict,
    target_topic: str,
    key_schema_id: int,
    id_mapping: dict,
) -> DataFrame:
    """The record transform of the pipeline: for each source envelope row,
    decode the Confluent-framed value, extract ``id``, emit the target
    envelope with key = Avro-string(id) framed for the target registry and
    value re-encoded under ITS OWN schema's target-registry id
    (``id_mapping``: source schema id → target schema id). Per-record
    schema dispatch mirrors the GenericRecord serde of the reference — a
    topic carrying several schema versions replicates each record under
    the matching propagated schema, exactly like KafkaAvroSerializer.

    One mapInPandas pass — the distributed analog of the reference's
    single listener loop (ReplicationApplication.java:63-78), preserving
    (partition, offset) passthrough for downstream dedup/audit. A record
    without ``id`` raises, failing the whole batch before any commit —
    the NPE→transaction-abort behavior of the reference (§3.1 step 6).
    """
    snapshot = dict(schemas_by_id)
    mapping = dict(id_mapping)

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, values = [], []
            for raw in pdf["value"]:
                src_id, record = avro_codec.deserialize_confluent(bytes(raw), snapshot)
                if not isinstance(record, dict) or "id" not in record or record["id"] is None:
                    raise ValueError(
                        "record has no 'id' field - aborting batch "
                        "(reference parity: ReplicationApplication.java:71 NPE "
                        "aborts the transaction)"
                    )
                rid = str(record["id"])
                keys.append(
                    avro_codec.serialize_confluent(rid, STRING_SCHEMA, key_schema_id)
                )
                values.append(
                    avro_codec.serialize_confluent(
                        record, snapshot[src_id], mapping[src_id]
                    )
                )
            out = pd.DataFrame(
                {
                    "key": keys,
                    "value": values,
                    "topic": target_topic,
                    "partition": pdf["partition"],
                    "offset": pdf["offset"],
                    "timestamp": pdf["timestamp"],
                }
            )
            yield out

    return env.mapInPandas(transform, schema=KAFKA_ENVELOPE)


def replicate_transform_tolerant(
    env: DataFrame,
    schemas_by_id: dict,
    target_topic: str,
    key_schema_id: int,
    id_mapping: dict,
) -> DataFrame:
    """Dead-letter variant of ``replicate_transform``: instead of the
    reference's abort-batch-on-bad-record semantics (the NPE →
    transaction-abort of ReplicationApplication.java:71, which
    ``replicate_transform`` mirrors), records that cannot be decoded or
    re-keyed are ROUTED — the envelope passes through with NULL
    key/value plus an ``error`` classification, and good records
    replicate normally. This is the tolerant production mode every DLQ
    deployment runs (bad records land on a dead-letter topic with
    diagnostics; the pipeline keeps its throughput).

    Error classes: ``unknown_schema`` (frame carries a schema id absent
    from the plan-time registry snapshot — KeyError), ``decode_error``
    (malformed frame/payload), ``missing_id`` (decoded record lacks the
    re-key field). Same one-Arrow-pass dataflow as the strict transform;
    the split into main/DLQ sinks is a downstream ``filter`` each
    (both partition-local, no extra shuffle).
    """
    snapshot = dict(schemas_by_id)
    mapping = dict(id_mapping)

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, values, errors = [], [], []
            for raw in pdf["value"]:
                try:
                    src_id, record = avro_codec.deserialize_confluent(
                        bytes(raw), snapshot
                    )
                    if (
                        not isinstance(record, dict)
                        or record.get("id") is None
                    ):
                        raise LookupError("missing_id")
                    rid = str(record["id"])
                    keys.append(
                        avro_codec.serialize_confluent(
                            rid, STRING_SCHEMA, key_schema_id
                        )
                    )
                    values.append(
                        avro_codec.serialize_confluent(
                            record, snapshot[src_id], mapping[src_id]
                        )
                    )
                    errors.append(None)
                except KeyError:
                    keys.append(None); values.append(None)
                    errors.append("unknown_schema")
                except LookupError:
                    keys.append(None); values.append(None)
                    errors.append("missing_id")
                except Exception:
                    keys.append(None); values.append(None)
                    errors.append("decode_error")
            yield pd.DataFrame(
                {
                    "key": keys,
                    "value": values,
                    "topic": target_topic,
                    "partition": pdf["partition"],
                    "offset": pdf["offset"],
                    "timestamp": pdf["timestamp"],
                    "error": errors,
                }
            )

    # StructType.add mutates in place — build a fresh schema instead of
    # appending to the shared module-level envelope.
    schema = StructType(
        KAFKA_ENVELOPE.fields + [StructField("error", StringType())]
    )
    return env.mapInPandas(transform, schema=schema)


def plan_replication(
    env: DataFrame,
    source_registry: MockSchemaRegistry,
    target_registry: MockSchemaRegistry,
    target_topic: str,
    value_schema=None,
) -> DataFrame:
    """Plan-time registry work (R6 auto-registration, README.adoc:27
    parity) + the transform: snapshot the source registry for decode,
    propagate EVERY known source schema into the target registry (the
    auto-registration the Confluent serde does lazily, done eagerly at
    plan time), and build the distributed transform with the id mapping.
    ``value_schema`` is accepted for API compatibility; registration is
    driven by the snapshot."""
    key_id = target_registry.register(f"{target_topic}-key", STRING_SCHEMA)
    snapshot = source_registry.snapshot()
    if value_schema is not None and not snapshot:
        # Source registry empty (direct batch use): seed from the given schema.
        sid = source_registry.register(f"{target_topic}-value", value_schema)
        snapshot = source_registry.snapshot()
    id_mapping = {
        src_id: target_registry.register(f"{target_topic}-value", schema)
        for src_id, schema in snapshot.items()
    }
    return replicate_transform(
        env,
        snapshot,
        target_topic,
        key_id,
        id_mapping,
    )


# ---------------------------------------------------------------------------
# R7–R9: transactional sink, batch barrier, post-commit ack
# ---------------------------------------------------------------------------
def committed_marker(target_dir: str, batch_id: int) -> str:
    return os.path.join(target_dir, "commits", str(batch_id))


def batch_writer(target_dir: str):
    """foreachBatch body: write-then-commit-marker, idempotent on replay.

    - data lands in data/<batch_id>/ (task failures abort the whole write
      — the R8 barrier);
    - the commit marker is created atomically AFTER a successful write
      (R7 transaction commit);
    - a replayed batch (crash between marker and checkpoint ack) sees its
      marker and skips — effectively-exactly-once downstream;
    - Structured Streaming acks the checkpoint only after this returns
      (R9 post-commit offset ack).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        marker = committed_marker(target_dir, batch_id)
        if os.path.exists(marker):
            return  # replay of a committed batch: idempotent skip
        data_dir = os.path.join(target_dir, "data", str(batch_id))
        batch_df.write.mode("overwrite").parquet(data_dir)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.rename(tmp, marker)  # atomic commit point

    return write


def dlq_batch_writer(main_dir: str, dlq_dir: str):
    """foreachBatch body for the DLQ split: good rows (error IS NULL,
    error column dropped) land under the main topic dir, routed rows
    (with their error class) under the dead-letter dir, and ONE commit
    marker — created only after BOTH writes — covers the pair, so the
    main/DLQ split is batch-atomic: a crash between the writes replays
    the whole batch into both sinks idempotently (the R7/R8 semantics of
    ``batch_writer`` extended to two destinations)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        marker = committed_marker(main_dir, batch_id)
        if os.path.exists(marker):
            return  # replay of a committed batch: idempotent skip
        batch_df = batch_df.localCheckpoint(eager=True)  # split reads it twice
        good = batch_df.filter(F.col("error").isNull()).drop("error")
        bad = batch_df.filter(F.col("error").isNotNull())
        good.write.mode("overwrite").parquet(
            os.path.join(main_dir, "data", str(batch_id))
        )
        bad.write.mode("overwrite").parquet(
            os.path.join(dlq_dir, "data", str(batch_id))
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.rename(tmp, marker)  # atomic commit point for BOTH sinks

    return write


def replicate_stream_dlq(
    spark: SparkSession,
    source_dir: str,
    main_dir: str,
    dlq_dir: str,
    source_registry: MockSchemaRegistry,
    target_registry: MockSchemaRegistry,
    target_topic: str,
    value_schema,
    checkpoint_dir: str,
    corrupt=None,
    timeout_sec: int = 120,
) -> None:
    """The R1–R9 streaming pipeline in tolerant mode: same source and
    checkpoint mechanics as ``replicate_stream``, but records flow
    through ``replicate_transform_tolerant`` and the two-sink
    ``dlq_batch_writer``. ``corrupt`` optionally maps the envelope
    DataFrame before the transform (test harnesses inject deterministic
    corruption there)."""
    env = spark.readStream.schema(KAFKA_ENVELOPE).parquet(source_dir)
    if corrupt is not None:
        env = corrupt(env)
    key_id = target_registry.register(f"{target_topic}-key", STRING_SCHEMA)
    snapshot = source_registry.snapshot()
    if value_schema is not None and not snapshot:
        source_registry.register(f"{target_topic}-value", value_schema)
        snapshot = source_registry.snapshot()
    id_mapping = {
        src_id: target_registry.register(f"{target_topic}-value", schema)
        for src_id, schema in snapshot.items()
    }
    out = replicate_transform_tolerant(
        env, snapshot, target_topic, key_id, id_mapping
    )
    q = (
        out.writeStream.foreachBatch(dlq_batch_writer(main_dir, dlq_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()


def read_committed(spark: SparkSession, target_dir: str) -> DataFrame:
    """R2 on the output side: expose only batches whose commit marker
    exists (the read_committed isolation the reference's downstream
    consumers rely on, application.yml:10)."""
    commits = os.path.join(target_dir, "commits")
    if not os.path.isdir(commits):
        return spark.createDataFrame([], KAFKA_ENVELOPE)
    dirs = [
        os.path.join(target_dir, "data", b)
        # digit-only filter: a crash between the tmp-marker write and its
        # rename can leave "<id>.tmp" behind; an uncommitted marker must
        # never crash (or admit rows into) the read-committed view
        for b in sorted((x for x in os.listdir(commits) if x.isdigit()), key=int)
        if os.path.isdir(os.path.join(target_dir, "data", b))
    ]
    if not dirs:
        return spark.createDataFrame([], KAFKA_ENVELOPE)
    return spark.read.schema(KAFKA_ENVELOPE).parquet(*dirs)


class ReplicationProgressListener(StreamingQueryListener):
    """Per-batch observability, the reference's logging as structured
    metrics (ReplicationApplication.java:64 "Received batch of {} records",
    :73-75 per-record send, :101 post-commit ack log). Spark's listener
    bus delivers one progress event per micro-batch; we keep batch id,
    input rows and throughput — what an operator dashboards at 100 TB."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "processedRowsPerSecond": p.processedRowsPerSecond,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def total_rows(self) -> int:
        return int(sum(b["numInputRows"] for b in self.batches))


def replicate_stream(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    source_registry: MockSchemaRegistry,
    target_registry: MockSchemaRegistry,
    target_topic: str,
    value_schema,
    checkpoint_dir: str,
    timeout_sec: int = 120,
    listener: ReplicationProgressListener | None = None,
) -> None:
    """The full R1–R9 streaming pipeline over a file-backed topic
    simulation (envelope parquet dir standing in for the Kafka source —
    swap the first line for format("kafka") + kafka_source_options on a
    real cluster; everything downstream is identical)."""
    if listener is not None:
        spark.streams.addListener(listener)
    env = spark.readStream.schema(KAFKA_ENVELOPE).parquet(source_dir)
    out = plan_replication(
        env, source_registry, target_registry, target_topic, value_schema
    )
    q = (
        out.writeStream.foreachBatch(batch_writer(target_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
        if listener is not None:
            # listener events ride an async bus; drain until the recorded
            # batch count is stable across a polling interval (not merely
            # non-empty — a multi-micro-batch run delivers events after the
            # first one arrives) before detaching
            deadline = time.monotonic() + 10
            seen = -1
            while time.monotonic() < deadline:
                n = len(listener.batches)
                if n == seen:
                    break
                seen = n
                time.sleep(0.4)
            spark.streams.removeListener(listener)


# ---------------------------------------------------------------------------
# fixture production (test harness analog of scripts/produce-records.sh)
# ---------------------------------------------------------------------------
def write_envelope_fixture(
    spark: SparkSession,
    records: list[dict],
    out_dir: str,
    topic: str,
    registry: MockSchemaRegistry,
    value_schema,
    key_bytes: bytes | None = None,
) -> int:
    """Encode records as Confluent-framed Avro and write a source-topic
    envelope parquet dir (keyless input, like the reference's test
    producer — ReplicationApplicationTest.java:96-100). Returns the
    registered value schema id."""
    import datetime as dt

    sid = registry.register(f"{topic}-value", value_schema)
    rows = [
        (
            key_bytes,
            avro_codec.serialize_confluent(r, value_schema, sid),
            topic,
            0,
            i,
            dt.datetime(2024, 1, 1, 0, 0, i % 60),
        )
        for i, r in enumerate(records)
    ]
    spark.createDataFrame(rows, KAFKA_ENVELOPE).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return sid


def decode_envelope(
    env: DataFrame, schemas_by_id: dict, value_schema
) -> DataFrame:
    """Consumer-side deserializer (KafkaAvroDeserializer analog used by
    the golden test to verify the target topic): key as Avro string,
    value decoded into typed columns of the Foo fixture shape."""
    snapshot = dict(schemas_by_id)

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_keys, ids, names = [], [], []
            for kraw, vraw in zip(pdf["key"], pdf["value"]):
                if kraw is None:
                    out_keys.append(None)
                else:
                    _, k = avro_codec.deserialize_confluent(bytes(kraw), snapshot)
                    out_keys.append(k)
                _, record = avro_codec.deserialize_confluent(bytes(vraw), snapshot)
                ids.append(record.get("id"))
                names.append(record.get("name"))
            yield pd.DataFrame(
                {
                    "kafka_key": out_keys,
                    "id": ids,
                    "name": names,
                    "topic": pdf["topic"],
                    "offset": pdf["offset"],
                }
            )

    return env.mapInPandas(
        dec, schema="kafka_key string, id string, name string, topic string, offset long"
    )
