"""avro_topic_replication_spark — a PySpark-native analytics + replication engine.

A brand-new engine with the capabilities of the reference
`timtebeek/avro-topic-replication` (an exactly-once Avro Kafka topic
replicator, see /root/reference/src/main/java/com/github/timtebeek/
replication/ReplicationApplication.java:62-101), re-expressed Spark-first:

- ``streaming.replicate``: the reference's R1-R9 pipeline (SURVEY.md §2.1) as
  Structured Streaming (Kafka source -> Confluent-Avro decode -> re-key ->
  encode -> transactional-batch sink).
- ``queries``: the [EXT] relational / windowing / set-op / scalar-function
  surface (SURVEY.md §2.2), every operator DuckDB-oracle checkable.
- ``operators``: custom compositions Spark lacks as single primitives
  (as-of join, range join, dedup family, vector similarity, multimodal).
- ``functions``: deterministic helpers (decimal-exact aggregation, text
  analysis, vector math) designed so Spark and ANSI-SQL oracles agree
  bit-for-bit.

Everything is DataFrame-first: logical plans go through Catalyst, hot paths
stay inside whole-stage codegen, Python only appears in Arrow-batched
pandas UDFs where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import load_table, load_all, register_views  # noqa: F401
