"""Non-parquet sources + sinks (SURVEY.md §2.2 "Sources / sinks").

Each query proves WRITE + READ parity: a lineitem slice goes out through
the sink under test into the scratch dir, comes back through the matching
source with an explicit schema, and must hash-match the DuckDB oracle
reading the ORIGINAL parquet — so any serialization loss (float
formatting, date parsing, partition-column handling) fails the gate.
Doubles survive because both CSV/JSON writers emit shortest-round-trip
representations and both parsers are correctly rounded.

Scale notes: explicit schemas on read (schema inference is a full extra
scan at 100 TB); the parquet sink partitions by a low-cardinality column
and the read-back filter prunes to one partition directory — the
layout/pruning contract that matters on a real lake.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dec_sum, dec_sum_sql
from ..streaming.replay import SCRATCH, scratch_tag
from . import query

_SLICE_SQL = """
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice,
           l_returnflag, CAST(l_shipdate AS DATE) AS ship_day
    FROM lineitem WHERE l_orderkey < 100
"""

_SLICE_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_linenumber int, l_quantity double, "
    "l_extendedprice double, l_returnflag string, ship_day date"
)


def _slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


def _scratch(
    sf_dir: str, name: str, tables: "tuple[str, ...]" = ("lineitem",)
) -> str:
    """Per-sf scratch path, content-keyed on the source tables the artifact
    derives from (see ``scratch_tag`` — basename-only keys served stale
    fixtures when tmp-dir basenames repeated across pytest sessions). Most
    artifacts here rewrite with mode=overwrite anyway; the content key
    matters for the cached ones (bucketed layout's ``_SUCCESS`` check)."""
    return os.path.join(SCRATCH, "io", scratch_tag(sf_dir, tables), name)


@query("source_csv_roundtrip", oracle=_SLICE_SQL, tags=("source", "csv"))
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + CSV source with explicit schema and header; values must
    survive the text round trip bit-exactly."""
    path = _scratch(sf_dir, "csv")
    _slice(spark, sf_dir).write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(_SLICE_SCHEMA).option("header", "true").csv(path)


@query("source_json_roundtrip", oracle=_SLICE_SQL, tags=("source", "json"))
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source with explicit schema (inference would be
    a second full scan at scale — never on by default here)."""
    path = _scratch(sf_dir, "json")
    _slice(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema(_SLICE_SCHEMA).json(path)


@query(
    "source_xml_roundtrip",
    oracle=_SLICE_SQL,
    tags=("source", "xml"),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + XML source (native in Spark 4 — no spark-xml package):
    rows become <lineitem> elements under a document root, read back with
    an explicit schema (same rule as CSV/JSON: schema inference is a
    second full scan at 100 TB, never on by default). Values must survive
    the text round trip bit-exactly — Java's double formatting is
    parse-lossless, which is what makes the hash check possible."""
    path = _scratch(sf_dir, "xml")
    (
        _slice(spark, sf_dir)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "lineitems")
        .option("rowTag", "lineitem")
        .save(path)
    )
    return (
        spark.read.schema(_SLICE_SCHEMA)
        .format("xml")
        .option("rowTag", "lineitem")
        .load(path)
    )


@query(
    "sink_parquet_partitioned",
    oracle="""
        SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice,
               CAST(l_shipdate AS DATE) AS ship_day, l_returnflag
        FROM lineitem WHERE l_orderkey < 100 AND l_returnflag = 'R'
    """,
    tags=("sink", "parquet"),
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned read-back: the filter
    on the partition column must prune to the single l_returnflag=R
    directory (visible as PartitionFilters in the scan plan) — the
    write-side layout decision that pays for itself on every later read."""
    path = _scratch(sf_dir, "parquet_part")
    _slice(spark, sf_dir).write.mode("overwrite").partitionBy("l_returnflag").parquet(
        path
    )
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "ship_day",
        "l_returnflag",
    )


_BINFIX_DIR = os.path.join(SCRATCH, "io", "binfix")


def _binary_fixture() -> str:
    """Deterministic blob files (scale-independent, regenerated on demand):
    the binaryFile source needs real files on disk, and a fixed byte
    pattern lets one oracle path serve every sf."""
    os.makedirs(_BINFIX_DIR, exist_ok=True)
    for i in range(4):
        body = bytes((i * 37 + j * 11) % 256 for j in range(1024 + 257 * i))
        with open(os.path.join(_BINFIX_DIR, f"blob_{i}.bin"), "wb") as f:
            f.write(body)
    return _BINFIX_DIR


@query(
    "source_binaryfile",
    oracle=f"""
        SELECT regexp_extract(filename, '[^/]+$') AS file,
               size AS length,
               sha256(hex(content)) AS content_sha
        FROM read_blob('{_BINFIX_DIR}/*.bin')
    """,
    tags=("source", "binary", "multimodal"),
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingest (`binaryFile` source) — the entry point for
    multimodal blobs (images/audio) that arrive as files, not rows. Each
    file becomes one row of (path, length, content BinaryType); content is
    fingerprinted via sha2 over its hex encoding (DuckDB's sha256 only
    hashes VARCHAR, and both engines agree on uppercase hex, so the hex
    route makes the digest cross-engine comparable). Reads a deterministic
    blob fixture so the oracle's read_blob sees byte-identical files at
    any scale. At 100 TB: binaryFile splits per-file (one task per blob),
    so parallelism scales with file count; pair with maxPartitionBytes for
    many-small-file corpora."""
    path = _binary_fixture()
    df = spark.read.format("binaryFile").load(os.path.join(path, "*.bin"))
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("file"),
        "length",
        F.sha2(F.hex("content"), 256).alias("content_sha"),
    )


@query(
    "join_bucketed_colocated",
    oracle=f"""
        SELECT o_orderkey,
               {dec_sum_sql('l_extendedprice')} AS revenue,
               COUNT(*) AS n_items
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey
    """,
    tags=("join", "bucketing", "sink"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-to-fact join via bucketed table layout — THE
    100-TB join strategy: both sides are written `bucketBy(8, orderkey)`
    + sortBy, so the sort-merge join and the follow-on groupBy on the
    same key read pre-partitioned, pre-sorted buckets and the executed
    plan contains ZERO Exchange nodes (asserted in test_plans). At scale
    the one-time bucketed write amortizes over every subsequent join on
    the key; bucket count would be sized to cluster cores (e.g. 4096),
    not 8."""
    sf_tag = scratch_tag(sf_dir, ("orders", "lineitem"))
    specs = {
        "orders": ("o_orderkey", ["o_orderkey"], "o_orderkey BIGINT"),
        "lineitem": (
            "l_orderkey",
            ["l_orderkey", "l_extendedprice"],
            "l_orderkey BIGINT, l_extendedprice DOUBLE",
        ),
    }
    for tbl, (key, cols, ddl) in specs.items():
        name = f"b_{tbl}_{sf_tag}"
        # path keyed on BOTH sources, same as the table name — a split key
        # could reattach a stale layout for one side.
        path = _scratch(sf_dir, f"bucketed_{tbl}", ("orders", "lineitem"))
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            # layout already on disk: reattach it (a fresh session has an
            # empty in-memory catalog) — this is the amortization story:
            # bucket once, every later session/join reuses the files.
            spark.sql(
                f"""
                CREATE TABLE IF NOT EXISTS {name} ({ddl})
                USING PARQUET
                CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS
                LOCATION '{path}'
                """
            )
        else:
            (
                load_table(spark, sf_dir, tbl)
                .select(*cols)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", path)
                .mode("overwrite")
                .saveAsTable(name)
            )
    o = spark.table(f"b_orders_{sf_tag}")
    li = spark.table(f"b_lineitem_{sf_tag}")
    return (
        # merge hint: at tiny SFs the planner would broadcast orders, which
        # ignores bucketing — the point here is the shuffle-free SMJ path.
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        # group on the probe-side key so the bucketed partitioning carries
        # through join AND aggregate (grouping by the build-side alias would
        # reintroduce an exchange).
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(dec_sum("l_extendedprice").alias("revenue"), F.count("*").alias("n_items"))
    )


@query(
    "sink_upsert_merge",
    oracle="""
        WITH changes AS (
            SELECT c_custkey, upper(c_name) AS c_name,
                   CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,4)) + 100, 2) AS DOUBLE) AS c_acctbal
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey + 1000000, c_name, c_acctbal
            FROM customer WHERE c_custkey % 97 = 0
        )
        SELECT b.c_custkey, b.c_name, b.c_acctbal, 'kept' AS action
        FROM customer b
        WHERE b.c_custkey NOT IN (SELECT c_custkey FROM changes)
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal, 'upserted' AS action FROM changes
    """,
    tags=("sink", "merge"),
)
def sink_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert without a table format: apply a change batch to a
    base table — matched keys take the change row (update), unmatched
    change keys append (insert), untouched base rows pass through. The
    scalable shape is one left-anti join (base minus changed keys) + one
    union: both sides shuffle once on the key, no row-by-row driver
    logic, and the same plan is what a lakehouse MERGE compiles to when
    the change set is too large to broadcast. The change batch here is
    synthesized deterministically: every 10th customer gets an update,
    every 97th spawns an insert under a shifted key."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = base.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        F.round(F.col("c_acctbal").cast("decimal(18,4)") + 100, 2)
        .cast("double")
        .alias("c_acctbal"),
    )
    inserts = base.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"), "c_name", "c_acctbal"
    )
    changes = updates.union(inserts)
    kept = base.join(changes.select("c_custkey"), "c_custkey", "left_anti")
    return kept.withColumn("action", F.lit("kept")).union(
        changes.withColumn("action", F.lit("upserted"))
    )


_BADCSV_DIR = os.path.join(SCRATCH, "io", "badcsv")


def _corrupt_csv_fixture() -> str:
    """Deterministic CSV with type-malformed rows (scale-independent)."""
    os.makedirs(_BADCSV_DIR, exist_ok=True)
    rows = [
        "1,10.5,A", "2,20.0,B", "3,abc,C",  # 'abc' breaks the double column
        "4,40.25,D", "not_an_id,50.0,E",    # id not a bigint
        "6,60.75,F", "7,70.0,G",
    ]
    with open(os.path.join(_BADCSV_DIR, "part-000.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    return _BADCSV_DIR


@query("source_csv_corrupt_records", oracle=None, tags=("source", "csv", "robustness"))
def source_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input handling on the CSV source: PERMISSIVE mode parses
    what it can and captures the raw line of every row that violates the
    schema in `_corrupt_record` instead of failing the job — at 100 TB a
    handful of bad lines must quarantine, not kill, the pipeline (the
    alternatives: DROPMALFORMED silently drops, FAILFAST aborts — both
    exercised in tests/test_sinks.py). Rows-only: corrupt-capture
    semantics are engine-specific. Output: parse-status counts from a
    deterministic 7-row fixture with 2 type-broken lines."""
    path = _corrupt_csv_fixture()
    df = (
        spark.read.schema("id bigint, qty double, flag string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        # Spark disallows projecting ONLY the internal corrupt column off a
        # raw scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
        # the documented pattern is to cache the parsed frame first.
        .cache()
    )
    return (
        df.select(
            F.when(F.col("_corrupt_record").isNull(), "parsed")
            .otherwise("quarantined")
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("status")
    )


@query(
    "sink_parquet_clustered",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               CAST(l_shipdate AS DATE) AS ship_day
        FROM lineitem
        WHERE l_orderkey < 100
          AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    """,
    tags=("sink", "parquet", "clustering"),
)
def sink_parquet_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered parquet layout: repartitionByRange(ship_day) +
    sortWithinPartitions before the write puts each date range in few
    files with tight row-group min/max stats, so the read-back range
    filter skips most row groups at the scan (PushedFilters carries the
    date bounds; the stats make them selective). This is the sort-on-
    write discipline every columnar lake needs — without it, every file
    spans every date and stats prune nothing. Write path is per-sf
    scratch; the oracle reads the ORIGINAL table, so layout must not
    change content."""
    path = _scratch(sf_dir, "parquet_clustered")
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(*cols, F.col("l_shipdate").cast("date").alias("ship_day"))
    )
    (
        li.repartitionByRange(4, "ship_day")
        .sortWithinPartitions("ship_day")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        F.col("ship_day").between("1995-01-01", "1995-12-31")
    )
    return back.select(*cols, "ship_day")


@query("source_orc_roundtrip", oracle=_SLICE_SQL, tags=("source", "orc"))
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source: the second columnar format Spark ships natively
    (predicate pushdown + column pruning work identically to parquet).
    The oracle reads the parquet truth — a hash match proves the ORC
    round trip is value-exact across the format boundary."""
    path = _scratch(sf_dir, "orc")
    _slice(spark, sf_dir).write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "source_text_lines",
    oracle="""
        SELECT CAST(l_orderkey AS VARCHAR) || '|' || l_returnflag AS value
        FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("source", "text"),
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text sink + line source (`spark.read.text`): the lowest-common-
    denominator format — one string column per line. Written as
    delimiter-joined fields, read back raw; the oracle rebuilds the same
    lines from the parquet truth."""
    path = _scratch(sf_dir, "text")
    lines = _slice(spark, sf_dir).select(
        F.concat_ws("|", F.col("l_orderkey").cast("string"), "l_returnflag").alias(
            "value"
        )
    )
    lines.write.mode("overwrite").text(path)
    return spark.read.text(path)


@query(
    "sql_cte_text_entry",
    oracle="""
        WITH flagged AS (
            SELECT o_orderpriority, o_totalprice,
                   CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket
            FROM orders
        )
        SELECT o_orderpriority, bucket, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total
        FROM flagged
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("sql", "source"),
)
def sql_cte_text_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual SQL entry point: register a temp view, run a WITH-CTE
    query through spark.sql — proving the engine's surface is reachable
    as ANSI SQL text, not only the DataFrame DSL (same Catalyst plan
    either way)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH flagged AS (
            SELECT o_orderpriority, o_totalprice,
                   CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket
            FROM orders_v
        )
        SELECT o_orderpriority, bucket, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total
        FROM flagged
        GROUP BY 1, 2
        ORDER BY 1, 2
        """
    )


@query(
    "sink_scd2_dimension",
    oracle="""
        WITH dim0 AS (
            SELECT c_custkey, c_acctbal, c_mktsegment,
                   TIMESTAMP '2000-01-01' AS valid_from,
                   CAST(NULL AS TIMESTAMP) AS valid_to
            FROM customer WHERE c_custkey < 400
        ),
        changes AS (
            SELECT c_custkey,
                   c_acctbal + 100.0 AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey < 400 AND c_custkey % 3 = 0
        ),
        closed AS (
            SELECT d.c_custkey, d.c_acctbal, d.c_mktsegment, d.valid_from,
                   TIMESTAMP '2001-01-01' AS valid_to
            FROM dim0 d JOIN changes c ON d.c_custkey = c.c_custkey
        ),
        unchanged AS (
            SELECT d.* FROM dim0 d
            WHERE NOT EXISTS (SELECT 1 FROM changes c
                              WHERE c.c_custkey = d.c_custkey)
        ),
        fresh AS (
            SELECT c_custkey, c_acctbal, c_mktsegment,
                   TIMESTAMP '2001-01-01' AS valid_from,
                   CAST(NULL AS TIMESTAMP) AS valid_to
            FROM changes
        )
        SELECT * FROM closed
        UNION ALL SELECT * FROM unchanged
        UNION ALL SELECT * FROM fresh
    """,
    tags=("sink", "scd2", "join"),
)
def sink_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension versioning: apply a change batch to a
    versioned dimension — close the current version of every changed key
    (valid_to stamped), carry unchanged versions through, append the new
    versions open-ended. One semi join + one anti join + a union: the
    change batch is dim-sized (broadcastable), the dimension shuffles at
    most once, history rows are never rewritten in place — the
    merge-into-versioned-table pattern every warehouse load runs."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    t0 = F.lit("2000-01-01").cast("timestamp")
    t1 = F.lit("2001-01-01").cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")
    dim0 = c.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        t0.alias("valid_from"), null_ts.alias("valid_to"),
    )
    changes = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    keys = changes.select("c_custkey")
    closed = (
        dim0.join(F.broadcast(keys), "c_custkey", "left_semi")
        .withColumn("valid_to", t1)
    )
    unchanged = dim0.join(F.broadcast(keys), "c_custkey", "left_anti")
    fresh = changes.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        t1.alias("valid_from"), null_ts.alias("valid_to"),
    )
    return closed.unionByName(unchanged).unionByName(fresh)


@query(
    "sink_zorder_layout",
    oracle="""
        SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
        FROM lineitem
        WHERE l_partkey % 1024 < 64 AND l_suppkey % 1024 < 64
          AND l_orderkey < 2000
    """,
    tags=("sink", "parquet", "layout"),
)
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-interleaved) layout sink: sort the write by the
    bit-interleave of two filter columns so parquet row-group min/max
    stats stay tight on BOTH dimensions — multi-column data skipping
    where a plain sort only serves its leading column. The z-value is a
    pure bitwise column expression (no UDF); read-back filters on both
    dimensions and must hash-match the unclustered truth, proving layout
    is invisible to semantics."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    pa = F.col("l_partkey") % 1024
    su = F.col("l_suppkey") % 1024
    z = F.lit(0).cast("long")
    for bit in range(10):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(pa.cast("long"), bit) % 2, 2 * bit)
        ).bitwiseOR(F.shiftleft(F.shiftright(su.cast("long"), bit) % 2, 2 * bit + 1))
    path = _scratch(sf_dir, "zorder")
    (
        li.select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", z.alias("zv"))
        .repartitionByRange(4, "zv")
        .sortWithinPartitions("zv")
        .write.mode("overwrite")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .filter((F.col("l_partkey") % 1024 < 64) & (F.col("l_suppkey") % 1024 < 64))
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    )


@query(
    "source_python_datasource",
    oracle="""
        SELECT CAST(c_custkey AS VARCHAR) AS kafka_key,
               1 AS schema_id,
               CAST(c_custkey AS VARCHAR) AS id,
               c_name AS name
        FROM customer WHERE c_custkey < 50
    """,
    tags=("source", "datasource", "avro"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confluent-framed Avro files read through a CUSTOM Python DataSource
    (Spark 4 extension API, sources/envelope_source.py): the driver plans
    one InputPartition per file, executors decode the wire format with
    the in-repo codec against a pickled registry snapshot. The fixture is
    derived from the customer table (bounded 50 rows), so the decoded
    output hash-matches relational truth — codec + source + planner all
    verified in one query."""
    from ..operators.replication import FOO_SCHEMA
    from ..sources.envelope_source import (
        AvroEnvelopeDataSource,
        write_envelope_files,
    )

    path = _scratch(sf_dir, "pyds_envelope")
    marker = os.path.join(path, "_done")
    if not os.path.exists(marker):
        rows = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") < 50)
            .select("c_custkey", "c_name")
            .collect()
        )  # bounded 50-row fixture build, not a data collect
        records = [
            {"id": str(r["c_custkey"]), "name": r["c_name"]} for r in rows
        ]
        write_envelope_files(records, FOO_SCHEMA, 1, path, n_files=4)
        with open(marker, "w") as f:
            f.write("ok")
    try:
        spark.dataSource.register(AvroEnvelopeDataSource)
    except Exception:
        pass  # already registered in this session
    import json

    return (
        spark.read.format("avro_envelope")
        .option("path", path)
        .option("schemas", json.dumps({1: FOO_SCHEMA}))
        .load()
    )


@query(
    "source_parquet_merge_schema",
    oracle="""
        SELECT CAST(o_orderkey AS BIGINT) AS okey,
               o_orderpriority AS priority,
               CAST(NULL AS DOUBLE) AS total
        FROM orders WHERE o_orderkey % 100 < 10
        UNION ALL BY NAME
        SELECT CAST(o_orderkey AS BIGINT) AS okey,
               o_orderpriority AS priority,
               o_totalprice AS total
        FROM orders WHERE o_orderkey % 100 BETWEEN 10 AND 19
    """,
    tags=("source", "parquet", "schema-evolution"),
)
def source_parquet_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution ON READ: two parquet generations — v1 without the
    ``total`` column, v2 with it — read back together with
    ``mergeSchema=true``, which unions the footers and null-fills the
    missing column for v1 files. The everyday lake situation after a
    column is added mid-stream; the oracle recomputes both generations
    from the source table (UNION ALL BY NAME null-fills identically).

    Scale shape: schema merge happens on file FOOTERS at planning time
    (one footer read per file, not per row); the scan itself stays
    column-pruned and filter-pushed per file. The documented production
    caveat: with thousands of files, set the merged schema explicitly
    (``.schema(...)``) instead of footer-merging every plan — same
    result, no planning-time fan-out.
    """
    path = _scratch(sf_dir, "merge_schema")
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 100 < 10).select(
        F.col("o_orderkey").cast("bigint").alias("okey"),
        F.col("o_orderpriority").alias("priority"),
    )
    v2 = o.filter(
        (F.col("o_orderkey") % 100 >= 10) & (F.col("o_orderkey") % 100 <= 19)
    ).select(
        F.col("o_orderkey").cast("bigint").alias("okey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("total"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    return spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
