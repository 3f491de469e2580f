"""Custom Python DataSource (Spark 4 API): Confluent-framed Avro files.

The modern extension point for sources Spark doesn't ship: subclass
``pyspark.sql.datasource.DataSource``, plan one ``InputPartition`` per
file on the driver, and decode rows executor-side in ``read()`` — the
same split-per-file parallelism a parquet scan gets, with the repo's
pure-Python Confluent codec (functions/avro_codec) doing the Avro work
against a plan-time registry snapshot pickled into the reader.

File format: a sequence of length-prefixed (4-byte big-endian) Confluent
wire-format records (magic 0x0 + 4-byte schema id + Avro binary), i.e.
exactly the bytes a Kafka value carries (SURVEY §1.2), framed for flat
files. ``write_envelope_files`` produces it; the reference's
produce-records.sh console producer is the moral equivalent.

At scale: partitions() returns one split per file (thousands of files →
thousands of parallel tasks); the registry snapshot is tiny metadata on
every executor, like a broadcast dim.

Reference parity: R1+R3 as a first-class pluggable source
(ReplicationApplication.java:62-63 consumes the same framed bytes from
Kafka); [EXT] — the reference has no pluggable-source concept.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..functions import avro_codec


def write_envelope_files(
    records: list, schema, schema_id: int, out_dir: str, n_files: int = 4
) -> None:
    """Write records as length-prefixed Confluent-framed files (round-robin
    across n_files so the source has real partitions to plan)."""
    os.makedirs(out_dir, exist_ok=True)
    buckets: list[list[bytes]] = [[] for _ in range(n_files)]
    for i, rec in enumerate(records):
        framed = avro_codec.serialize_confluent(rec, schema, schema_id)
        buckets[i % n_files].append(struct.pack(">I", len(framed)) + framed)
    for i, chunk in enumerate(buckets):
        with open(os.path.join(out_dir, f"part-{i:04d}.bin"), "wb") as f:
            f.write(b"".join(chunk))


class AvroEnvelopeReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        import json

        self.path = options["path"]
        # plan-time registry snapshot rides in as a JSON option (options are
        # the only channel that reliably reaches executor-side readers — a
        # class attribute dies when the worker re-imports the module)
        self.schemas_by_id = {
            int(sid): schema
            for sid, schema in json.loads(options["schemas"]).items()
        }

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".bin")
        )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        with open(partition.value, "rb") as f:
            data = f.read()
        off = 0
        while off < len(data):
            (n,) = struct.unpack_from(">I", data, off)
            off += 4
            schema_id, datum = avro_codec.deserialize_confluent(
                data[off : off + n], self.schemas_by_id
            )
            off += n
            yield (
                str(datum.get("id")),
                schema_id,
                datum.get("id"),
                datum.get("name"),
            )


class AvroEnvelopeDataSource(DataSource):
    """spark.read.format("avro_envelope").option("path", dir)
    .option("schemas", json.dumps({id: schema_json})) after
    spark.dataSource.register(...)."""

    @classmethod
    def name(cls) -> str:
        return "avro_envelope"

    def schema(self) -> str:
        return "kafka_key string, schema_id int, id string, name string"

    def reader(self, schema) -> AvroEnvelopeReader:
        return AvroEnvelopeReader(self.options)
