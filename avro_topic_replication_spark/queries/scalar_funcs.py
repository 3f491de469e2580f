"""Scalar function families (SURVEY.md §2.2 "Scalar function library").

All JVM-side built-ins inside whole-stage codegen — zero Python in these
paths. Oracle notes: functions whose cross-engine bit-exactness is not
guaranteed (libm trig/exp, locale-ish initcap, engine-specific hashes)
either stay out of the oracle-checked set or are rounded; structural
functions (string/date/array/json) are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "fn_string_basic",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               lower(p_brand) AS brand_lower,
               length(p_name) AS name_len,
               substring(p_type, 1, 5) AS type_prefix,
               concat(p_brand, ':', p_type) AS brand_type,
               trim(concat('  ', p_name, '  ')) AS trimmed,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               rpad(CAST(p_size AS VARCHAR), 4, '.') AS size_rpadded,
               reverse(p_brand) AS brand_rev,
               repeat('-', 3) AS dashes,
               left(p_name, 3) AS name_l3,
               right(p_name, 3) AS name_r3,
               replace(p_type, ' ', '_') AS type_snake
        FROM part WHERE p_partkey < 200
    """,
    tags=("scalar", "string"),
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad(F.col("p_size").cast("string"), 4, ".").alias("size_rpadded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("-"), 3).alias("dashes"),
        F.left("p_name", F.lit(3)).alias("name_l3"),
        F.right("p_name", F.lit(3)).alias("name_r3"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "fn_string_regex_split",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
               regexp_replace(p_type, '[aeiou]', '*', 'g') AS devoweled,
               split_part(p_type, ' ', 1) AS word1,
               len(string_split(p_type, ' ')) AS n_words,
               instr(p_name, 'a') AS first_a,
               levenshtein(p_brand, 'Brand#1') AS brand_dist,
               starts_with(p_type, 'PROMO') AS is_promo,
               ends_with(p_type, 'STEEL') AS is_steel,
               contains(p_name, 'green') AS has_green
        FROM part WHERE p_partkey < 200
    """,
    tags=("scalar", "string"),
)
def fn_string_regex_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract/replace, split, instr, levenshtein, affix tests."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", "[aeiou]", "*").alias("devoweled"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("word1"),
        F.size(F.split("p_type", " ")).alias("n_words"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("brand_dist"),
        F.startswith("p_type", F.lit("PROMO")).alias("is_promo"),
        F.endswith("p_type", F.lit("STEEL")).alias("is_steel"),
        F.contains("p_name", F.lit("green")).alias("has_green"),
    )


@query(
    "fn_datetime",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               dayofmonth(o_orderdate) AS dom,
               quarter(o_orderdate) AS qtr,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(o_orderdate AS DATE) AS order_day
        FROM orders WHERE o_orderkey < 300
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction, truncation, arithmetic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")).alias(
            "days_since_95"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    )


@query(
    "fn_math",
    oracle="""
        SELECT c_custkey,
               round(c_acctbal + 0.0, 1) AS bal_round1,
               CAST(floor(c_acctbal + 0.0) AS BIGINT) AS bal_floor,
               CAST(ceil(c_acctbal + 0.0) AS BIGINT) AS bal_ceil,
               abs(c_acctbal + 0.0) AS bal_abs,
               CAST(sign(c_acctbal + 0.0) AS DOUBLE) AS bal_sign,
               sqrt(abs(c_acctbal + 0.0)) AS bal_sqrt,
               (c_acctbal + 0.0) * (c_acctbal + 0.0) AS bal_sq,
               CAST(c_custkey % 7 AS BIGINT) AS key_mod7,
               round(exp((c_acctbal + 0.0) / 10000.0), 6) AS bal_exp,
               round(ln(abs(c_acctbal + 0.0) + 1.0), 6) AS bal_ln,
               round(log10(abs(c_acctbal + 0.0) + 1.0), 6) AS bal_log10
        FROM customer WHERE c_custkey < 300
    """,
    tags=("scalar", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions; transcendentals rounded to 6 (libm vs JVM last-ulp).

    Oracle dtype alignment (CORRECTNESS_r01): Spark floor/ceil emit BIGINT
    where DuckDB emits DOUBLE, and Spark signum emits DOUBLE where DuckDB
    sign emits TINYINT — the oracle SQL casts both to Spark's types.

    The input normalizes through ``+ 0.0`` in BOTH engines (IEEE identity
    for every value except -0.0, which it canonicalizes to +0.0): the
    engines genuinely disagree on negative zero — Spark round(-0.0) is
    0.0 where DuckDB keeps -0.0, and Spark signum(-0.0) is -0.0 where
    DuckDB sign gives 0 — found by r8 fuzzing (test_fuzz_r1_scalars);
    impossible in the money-valued fixture, latent for any caller.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    bal = F.col("c_acctbal") + F.lit(0.0)
    return c.select(
        "c_custkey",
        F.round(bal, 1).alias("bal_round1"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.abs(bal).alias("bal_abs"),
        F.signum(bal).alias("bal_sign"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (bal * bal).alias("bal_sq"),
        (F.col("c_custkey") % 7).cast("bigint").alias("key_mod7"),
        F.round(F.exp(bal / 10000.0), 6).alias("bal_exp"),
        F.round(F.log(F.abs(bal) + 1.0), 6).alias("bal_ln"),
        F.round(F.log10(F.abs(bal) + 1.0), 6).alias("bal_log10"),
    )


@query(
    "fn_array",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               embedding[1] AS first_val,
               embedding[64] AS last_val,
               embedding[4] AS head4_tail,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               len(list_filter(embedding, x -> x > 0)) > 0 AS has_positive,
               list_sort(list_transform(list_slice(embedding, 1, 3),
                                        x -> CAST(x AS DOUBLE)))[2] AS head3_med,
               CAST(list_aggregate(list_transform(list_slice(embedding, 1, 3),
                                   x -> CAST(x AS DOUBLE) * 2), 'min') AS DOUBLE) AS head3_dbl_min
        FROM embeddings WHERE vec_id < 50
    """,
    tags=("scalar", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops incl. higher-order transform/filter over the embedding
    column, reduced to scalar outputs (the driver's canonicalizer cannot
    sort naked array cells — CORRECTNESS_r01). The raw-array API surface is
    covered rows-only by fn_array_native."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    emb = F.col("embedding")
    pos = F.filter(emb, lambda x: x > 0)
    head3d = F.transform(F.slice(emb, 1, 3), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_val"),
        F.element_at(emb, 64).alias("last_val"),
        F.element_at(F.slice(emb, 1, 4), 4).alias("head4_tail"),
        F.size(pos).alias("n_positive"),
        (F.size(pos) > 0).alias("has_positive"),
        F.element_at(F.sort_array(head3d), 2).alias("head3_med"),
        F.array_min(F.transform(head3d, lambda x: x * 2)).alias("head3_dbl_min"),
    )


@query("fn_array_native", oracle=None, tags=("scalar", "array"))
def fn_array_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw array-returning API coverage (rows-only): slice, transform,
    sort_array, flatten, array_distinct, zip_with, higher-order aggregate."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    emb = F.col("embedding")
    head = F.slice(emb, 1, 4)
    return e.select(
        "vec_id",
        head.alias("head4"),
        F.transform(head, lambda x: x.cast("double") * 2).alias("head4_doubled"),
        F.sort_array(head).alias("head4_sorted"),
        F.flatten(F.array(head, F.slice(emb, 5, 4))).alias("head8_flat"),
        F.array_distinct(F.array(F.lit(1), F.lit(1), F.lit(2))).alias("distinct_123"),
        F.zip_with(head, F.slice(emb, 5, 4), lambda a, b: a + b).alias("pairsum"),
        F.aggregate(
            F.transform(head, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("head4_sum"),
    )


@query(
    "fn_explode_posexplode",
    oracle="""
        SELECT vec_id, gs.idx - 1 AS pos, embedding[CAST(gs.idx AS INT)] AS val
        FROM embeddings, generate_series(1, 8) AS gs(idx)
        WHERE vec_id < 10
    """,
    tags=("scalar", "array", "explode"),
)
def fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first 8 embedding components (lateral unnest)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val"))


@query(
    "fn_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract(props, '$.k') AS INT) AS k_int,
               CAST(json_extract(props, '$.k') AS INT) * 2 AS k_doubled
        FROM events WHERE event_id < 500
    """,
    tags=("scalar", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") * 2).alias("k_doubled"),
    )


@query(
    "fn_json_from_json",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k
        FROM events GROUP BY event_type
    """,
    tags=("scalar", "json", "agg"),
)
def fn_json_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then aggregate a field (exact: ints)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(F.sum("p.k").alias("total_k"))


@query(
    "fn_hash",
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256,
               length(text) AS text_len
        FROM documents WHERE doc_id < 100
    """,
    tags=("scalar", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes (hex-identical across engines)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
    )


@query("fn_hash_spark_native", oracle=None, tags=("scalar", "hash"))
def fn_hash_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes (xxhash64, crc32, murmur3) — no DuckDB equivalent,
    rows-only check. These are the cheap partition/bucket keys at scale."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.crc32("text").alias("text_crc32"),
        F.hash("text").alias("text_murmur3"),
    )


@query(
    "fn_map",
    oracle="""
        SELECT n_nationkey,
               (map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}['name'])[1] AS name_from_map,
               cardinality(map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}) AS map_size,
               array_to_string(list_sort(map_keys(map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)})), ',') AS keys_sorted,
               array_to_string(list_sort(map_values(map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)})), ',') AS values_sorted
        FROM nation
    """,
    tags=("scalar", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction, element_at, keys/values (serialized as sorted
    joined strings — naked arrays crash the driver canonicalizer)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("name_from_map"),
        F.size(m).alias("map_size"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.array_join(F.sort_array(F.map_values(m)), ",").alias("values_sorted"),
    )


@query(
    "fn_string_extra",
    oracle="""
        SELECT p_partkey,
               translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
               array_to_string(
                   list_transform(string_split(lower(p_name), ' '),
                                  w -> upper(substring(w, 1, 1)) || substring(w, 2)),
                   ' ') AS name_initcap,
               ascii(p_brand) AS brand_ascii,
               chr(65 + CAST(p_partkey % 26 AS INT)) AS key_chr,
               strpos(p_type, 'ED') AS ed_pos,
               repeat(p_brand, 2) AS brand2
        FROM part WHERE p_partkey < 200
    """,
    tags=("scalar", "string"),
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straggler string functions: translate, initcap (DuckDB lacks it —
    the oracle emulates Spark's capitalize-each-space-delimited-word
    semantics), ascii/chr, locate, repeat-on-column."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.initcap(F.lower("p_name")).alias("name_initcap"),
        F.ascii("p_brand").alias("brand_ascii"),
        F.expr("char(65 + CAST(p_partkey % 26 AS INT))").alias("key_chr"),
        F.locate("ED", F.col("p_type")).alias("ed_pos"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
    )


@query(
    "fn_datetime_extra",
    oracle="""
        SELECT o_orderkey,
               CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
               strftime(o_orderdate, '%Y-%m') AS ym,
               make_date(CAST(year(o_orderdate) AS INT),
                         CAST(month(o_orderdate) AS INT), 1) AS month_first,
               dayofweek(o_orderdate) + 1 AS dow,
               round((1998 - year(o_orderdate)) * 12 + (9 - month(o_orderdate))
                     + (1 - day(o_orderdate)) / 31.0, 8) AS months_to_sep98
        FROM orders WHERE o_orderkey < 300
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straggler datetime functions: unix_timestamp, date_format, make_date,
    dayofweek (DuckDB counts Sunday=0, Spark Sunday=1 — oracle adds 1),
    months_between (oracle reproduces Spark's months + (d1-d2)/31 rule,
    valid here because every timestamp is midnight and the anchor day 1 is
    never month-end)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "month_first"
        ),
        F.dayofweek("o_orderdate").alias("dow"),
        F.months_between(
            F.lit("1998-09-01").cast("timestamp_ntz"), F.col("o_orderdate")
        ).alias("months_to_sep98"),
    )


@query(
    "fn_to_json",
    oracle="""
        SELECT n_nationkey,
               to_json(struct_pack(name := n_name, region := n_regionkey)) AS j,
               json_extract_string(to_json(struct_pack(name := n_name, region := n_regionkey)),
                                   '$.name') AS roundtrip_name
        FROM nation
    """,
    tags=("scalar", "json"),
)
def fn_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct → JSON serialization (and a parse round-trip); both engines
    emit compact {"k":v} with no whitespace, so the strings hash-match."""
    n = load_table(spark, sf_dir, "nation")
    j = F.to_json(
        F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    )
    return n.select(
        "n_nationkey",
        j.alias("j"),
        F.get_json_object(j, "$.name").alias("roundtrip_name"),
    )


@query(
    "fn_json_tuple",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k,
               json_extract_string(props, '$.missing') AS missing
        FROM events WHERE event_id < 200
    """,
    tags=("scalar", "json"),
)
def fn_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple: multi-field extraction in one generator (missing keys
    yield NULL in both engines)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id", F.json_tuple("props", "k", "missing").alias("k", "missing")
    )


@query("fn_ids_native", oracle=None, tags=("scalar", "misc"))
def fn_ids_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native id/partition functions (rows-only: values depend on
    physical partitioning by design): monotonically_increasing_id,
    spark_partition_id, seeded rand/randn — plus soundex, which DuckDB
    lacks an equivalent for."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.monotonically_increasing_id().alias("mono_id"),
        F.spark_partition_id().alias("pid"),
        F.rand(42).alias("r"),
        F.randn(42).alias("rn"),
        F.soundex(F.col("source")).alias("source_soundex"),
    )


@query(
    "fn_map_explode",
    oracle="""
        SELECT n_nationkey,
               unnest(map_entries(map {'name': n_name,
                                       'region': CAST(n_regionkey AS VARCHAR)}),
                      recursive := true)
        FROM nation
    """,
    tags=("scalar", "map", "explode"),
)
def fn_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(map): one (key, value) row per map entry."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return n.select("n_nationkey", F.explode(m).alias("key", "value"))


@query("fn_schema_of_json", oracle=None, tags=("scalar", "json"))
def fn_schema_of_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema_of_json: infer a DDL schema string from a sample document
    (rows-only: the DDL rendering is engine-specific)."""
    ev = load_table(spark, sf_dir, "events").limit(10)
    return ev.select(
        "event_id",
        F.schema_of_json(F.lit('{"k": 1}')).alias("props_schema"),
    )


@query(
    "fn_bitwise",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS band,
               o_orderkey | 4096 AS bor,
               xor(o_orderkey, o_custkey) AS bxor,
               (o_orderkey & 15) << 2 AS shl,
               o_orderkey >> 3 AS shr,
               CAST(bit_count(o_orderkey) AS INTEGER) AS popcount,
               ~o_orderkey AS bnot
        FROM orders WHERE o_orderkey < 200
    """,
    tags=("scalar", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount/not — the building
    blocks of bucket masks, bloom probes and bit-packed flags; pure
    codegen projections."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(c).alias("bxor"),
        F.shiftleft(k.bitwiseAND(F.lit(15)), 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("bnot"),
    )


@query(
    "fn_encode_decode",
    oracle="""
        SELECT n_nationkey,
               to_base64(CAST(n_name AS BLOB)) AS name_b64,
               CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR)
                 AS name_roundtrip,
               hex(n_name) AS name_hex,
               CAST(unhex(hex(n_name)) AS VARCHAR) AS name_unhex
        FROM nation
    """,
    tags=("scalar", "encoding"),
)
def fn_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary text codecs — base64 and hex encode/decode round trips, the
    serde helpers every byte-bearing column (Avro payloads, multimodal
    blobs) passes through; pure codegen, both round trips must return the
    original string bit-exactly in both engines."""
    n = load_table(spark, sf_dir, "nation")
    name_bin = F.col("n_name").cast("binary")
    return n.select(
        "n_nationkey",
        F.base64(name_bin).alias("name_b64"),
        F.unbase64(F.base64(name_bin)).cast("string").alias("name_roundtrip"),
        F.hex(name_bin).alias("name_hex"),
        F.unhex(F.hex(name_bin)).cast("string").alias("name_unhex"),
    )


@query(
    "fn_null_semantics",
    oracle="""
        WITH t AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS x,
                   CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS y,
                   o_orderstatus
            FROM orders WHERE o_orderkey < 500
        )
        SELECT o_orderkey,
               (x IS NOT DISTINCT FROM y) AS same_nullsafe,
               (x = y) AS same_plain,
               COALESCE(x, y, 0.0) AS first_present,
               NULLIF(o_orderstatus, 'O') AS status_or_null,
               (x IS NULL) AS x_missing,
               CAST(row_number() OVER (ORDER BY x ASC NULLS FIRST, o_orderkey)
                    AS BIGINT) AS rank_nulls_first
        FROM t
    """,
    tags=("scalar", "null"),
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics as first-class operators: null-safe equality
    (Spark's <=> / eqNullSafe vs ANSI IS NOT DISTINCT FROM), three-valued
    plain equality (NULL where either side is missing), COALESCE chains,
    NULLIF, IS NULL predicates, and explicit NULLS FIRST ordering — the
    defaults differ between engines (Spark sorts nulls first ascending,
    DuckDB last), so every ORDER BY here spells the placement out, which
    is exactly the discipline SURVEY §7 hard-part 1 demands."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    x = F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_totalprice"))
    y = F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_totalprice"))
    t = o.select("o_orderkey", x.alias("x"), y.alias("y"), "o_orderstatus")
    w = Window.orderBy(F.col("x").asc_nulls_first(), F.col("o_orderkey"))
    return t.select(
        "o_orderkey",
        F.col("x").eqNullSafe(F.col("y")).alias("same_nullsafe"),
        (F.col("x") == F.col("y")).alias("same_plain"),
        F.coalesce("x", "y", F.lit(0.0)).alias("first_present"),
        F.nullif("o_orderstatus", F.lit("O")).alias("status_or_null"),
        F.isnull("x").alias("x_missing"),
        F.row_number().over(w).cast("bigint").alias("rank_nulls_first"),
    )


@query(
    "fn_array_setops",
    oracle="""
        WITH t AS (
            SELECT p_partkey,
                   [p_size % 5, p_size % 3, 7] AS a,
                   [p_size % 3, 2] AS b
            FROM part WHERE p_partkey < 300
        )
        SELECT p_partkey,
               len(list_distinct(list_concat(a, b))) AS n_union,
               len(list_distinct(list_filter(a, x -> NOT list_contains(b, x))))
                 AS n_except,
               len(list_distinct(list_filter(a, x -> list_contains(b, x))))
                 AS n_intersect,
               COALESCE(list_position(a, 7), 0) AS pos_seven,
               len(list_filter(a, x -> x != 2)) AS n_after_remove
        FROM t
    """,
    tags=("scalar", "array"),
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: union/except/intersect (distinct semantics),
    element position, and remove — emitted as sizes/positions (scalars)
    because the oracle hash gate compares cells, not nested arrays. The
    DuckDB twin spells the same semantics with list_filter/list_contains,
    so a hash match pins the exact distinct-and-order rules Spark's
    array_* family implements."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    a = F.array(F.col("p_size") % 5, F.col("p_size") % 3, F.lit(7))
    b = F.array(F.col("p_size") % 3, F.lit(2))
    return p.select(
        "p_partkey",
        F.size(F.array_union(a, b)).alias("n_union"),
        F.size(F.array_except(a, b)).alias("n_except"),
        F.size(F.array_intersect(a, b)).alias("n_intersect"),
        F.array_position(a, 7).alias("pos_seven"),
        F.size(F.array_remove(a, 2)).alias("n_after_remove"),
    )


@query(
    "fn_map_higher_order",
    oracle="""
        WITH t AS (
            SELECT p_partkey,
                   MAP {'size': p_size, 'retail': CAST(floor(p_retailprice) AS INT)} AS m,
                   MAP {'bonus': 1000} AS boost
            FROM part WHERE p_partkey < 300
        )
        SELECT p_partkey,
               m['size'][1] + COALESCE(boost['bonus'][1], 0) AS boosted_size,
               cardinality(map_concat(m, boost)) AS n_concat,
               len(map_entries(m)) AS n_entries,
               CAST(list_aggregate(map_values(m), 'sum') AS INT) AS value_sum,
               CAST(list_aggregate(
                   list_transform(map_entries(m), e -> e.value * 2), 'sum'
               ) AS INT) AS doubled_sum
        FROM t
    """,
    tags=("scalar", "map"),
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: lookup + merge (map_concat), entry
    counting, and fold/transform over the
    value set (Spark's transform_values family; the DuckDB twin states
    identical semantics through entries). Keys are disjoint because
    Spark's default mapKeyDedupPolicy=EXCEPTION rejects duplicate keys on
    concat — the strictness a pipeline wants at 100 TB.
    Scalars out, map stays engine-side."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    m = F.create_map(
        F.lit("size"), F.col("p_size"),
        F.lit("retail"), F.floor("p_retailprice").cast("int"),
    )
    boost = F.create_map(F.lit("bonus"), F.lit(1000))
    t = p.select("p_partkey", m.alias("m"), boost.alias("boost"))
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    return t.select(
        "p_partkey",
        (
            F.element_at(F.col("m"), "size")
            + F.coalesce(F.element_at(F.col("boost"), "bonus"), F.lit(0))
        ).alias("boosted_size"),
        F.size(F.map_concat("m", "boost")).alias("n_concat"),
        F.size(F.map_entries("m")).alias("n_entries"),
        F.aggregate(F.map_values("m"), F.lit(0), lambda a, x: a + x).alias("value_sum"),
        F.aggregate(F.map_values(doubled), F.lit(0), lambda a, x: a + x).alias(
            "doubled_sum"
        ),
    )


@query(
    "fn_struct_ops",
    oracle="""
        WITH t AS (
            SELECT o_orderkey,
                   {'priority': o_orderpriority,
                    'price': o_totalprice,
                    'yr': CAST(year(o_orderdate) AS INT)} AS order_info
            FROM orders WHERE o_orderkey < 300
        )
        SELECT o_orderkey,
               order_info.priority AS priority,
               order_info.price AS price,
               order_info.yr AS yr,
               (order_info.price > 200000 AND order_info.yr >= 1997)
                 AS is_big_recent
        FROM t
    """,
    tags=("scalar", "struct"),
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction and field access: pack columns into a nested
    record, read fields back with dot paths, and predicate over them —
    the nested-schema idiom parquet pipelines live on (Catalyst prunes
    into struct fields the same way it prunes columns). Emitted as flat
    scalars for the oracle gate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    info = F.struct(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        F.year("o_orderdate").alias("yr"),
    )
    t = o.select("o_orderkey", info.alias("order_info"))
    return t.select(
        "o_orderkey",
        F.col("order_info.priority").alias("priority"),
        F.col("order_info.price").alias("price"),
        F.col("order_info.yr").alias("yr"),
        (
            (F.col("order_info.price") > 200000) & (F.col("order_info.yr") >= 1997)
        ).alias("is_big_recent"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
        SELECT c_custkey,
               TRY_CAST(c_name AS INTEGER) AS bad_parse,
               TRY_CAST(string_split(c_name, '#')[2] AS BIGINT) AS parsed_id,
               CAST(c_acctbal AS DOUBLE)
                 / NULLIF(CAST(c_custkey % 3 AS DOUBLE), 0) AS ratio_or_null,
               (string_split(c_name, '#'))[3] AS elem_oob,
               (string_split(c_name, '#'))[1] AS elem_ok
        FROM customer
    """,
    tags=("scalar", "ansi"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-handling expressions: try_cast (malformed parse →
    NULL), try_divide (x/0 → NULL), try_element_at (out-of-bounds →
    NULL) — the corrupt-tolerant scalar layer an ingest pipeline uses so
    one bad record can't fail a 100-TB stage. The DuckDB twin wraps the
    divisor in NULLIF(·, 0) so the divide-by-zero → NULL contract is
    version-proof (DuckDB ≥ 1.1 defaults ieee_floating_point_ops=true,
    where x/0.0 is inf, not NULL); list out-of-bounds is NULL natively.
    All Spark-side expressions stay in codegen."""
    c = load_table(spark, sf_dir, "customer")
    parts = F.split("c_name", "#")
    return c.select(
        "c_custkey",
        F.expr("try_cast(c_name AS int)").alias("bad_parse"),
        # try_element_at, not element_at: ANSI mode makes a bare
        # element_at THROW on out-of-bounds (a name with no '#'), which
        # defeats this query's corrupt-tolerance contract (found by
        # tests/test_fuzz_window7.py)
        F.expr(
            "try_cast(try_element_at(split(c_name, '#'), 2) AS bigint)"
        ).alias("parsed_id"),
        F.try_divide(
            F.col("c_acctbal").cast("double"),
            (F.col("c_custkey") % 3).cast("double"),
        ).alias("ratio_or_null"),
        F.try_element_at(parts, F.lit(3)).alias("elem_oob"),
        F.try_element_at(parts, F.lit(1)).alias("elem_ok"),
    )


@query(
    "fn_url_parse",
    oracle="""
        WITH u AS (
            SELECT c_custkey,
                   'https://shop' || CAST(c_custkey % 5 AS VARCHAR)
                     || '.example.com/seg/' || lower(replace(c_mktsegment, ' ', '-'))
                     || '?cust=' || CAST(c_custkey AS VARCHAR)
                     || '&page=' || CAST(c_custkey % 7 AS VARCHAR) AS url
            FROM customer WHERE c_custkey < 500
        )
        SELECT c_custkey, url,
               regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
               regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '[?&]cust=([^&#]*)', 1) AS cust_param,
               regexp_extract(url, 'https?://[^/?#]+[^?#]*\\?([^#]*)', 1)
                   AS query_string
        FROM u
    """,
    tags=("scalar", "url"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction — the canonicalization primitive of any
    web-corpus pipeline — through Spark's native parse_url (HOST / PATH
    / QUERY, per-key query lookup), all codegen expressions. The URLs
    are synthesized deterministically from customer columns so every
    component has a closed form; DuckDB has no URL functions, so the
    oracle mirrors with the equivalent anchored regexes — the two
    implementations must agree character-for-character, which is
    exactly the property a migration between engines needs pinned."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    url = F.concat(
        F.lit("https://shop"),
        (F.col("c_custkey") % 5).cast("string"),
        F.lit(".example.com/seg/"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit("-"))),
        F.lit("?cust="),
        F.col("c_custkey").cast("string"),
        F.lit("&page="),
        (F.col("c_custkey") % 7).cast("string"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("cust")).alias("cust_param"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
        SELECT c_custkey,
               c_name AS decrypted,
               CAST(((octet_length(encode(c_name)) // 16) + 1) * 16 AS BIGINT)
                   AS cipher_bytes
        FROM customer WHERE c_custkey < 300
    """,
    tags=("scalar", "crypto"),
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption with Spark's native aes_encrypt/aes_decrypt
    (AES-128-ECB — the deterministic mode, so ciphertext length is the
    analytic PKCS#7 formula and the roundtrip is plan-stable; GCM would
    salt a random IV per row). The oracle can't run AES, but it doesn't
    need to: decrypt(encrypt(x)) must be the identity and the ciphertext
    length is closed-form — both hash-checked. The pattern a pipeline
    uses to keep PII columns encrypted at rest while remaining joinable
    (deterministic ECB preserves equality — that's also its leakage
    trade-off, which is why only pseudonymous keys should use it).
    All codegen expressions; no Python."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    key = F.lit("0123456789abcdef")  # 16-byte demo key
    cipher = F.aes_encrypt(F.col("c_name").cast("binary"), key, F.lit("ECB"))
    return c.select(
        "c_custkey",
        F.aes_decrypt(cipher, key, F.lit("ECB")).cast("string").alias("decrypted"),
        F.octet_length(cipher).cast("bigint").alias("cipher_bytes"),
    )


@query(
    "fn_datetime_make",
    oracle="""
        SELECT o_orderkey,
               make_date(CAST(year(o_orderdate) AS INTEGER),
                         CAST(month(o_orderdate) AS INTEGER),
                         1) AS month_floor,
               make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                              CAST(month(o_orderdate) AS BIGINT),
                              CAST(dayofmonth(o_orderdate) AS BIGINT),
                              12, 30, 0.0) AS noonish,
               CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH
                   + INTERVAL 10 DAY AS shifted,
               CAST(date_part('doy', o_orderdate) AS INTEGER) AS doy,
               CAST(date_part('week', o_orderdate) AS INTEGER) AS iso_week,
               CAST(date_part('isodow', o_orderdate) AS INTEGER) AS iso_dow
        FROM orders WHERE o_orderkey < 300
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime_make(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp/date CONSTRUCTION and calendar parts: make_date /
    make_timestamp from numeric fields (the inverse of extraction — how
    pipelines rebuild event times from sharded year/month/day columns),
    interval arithmetic, and the ISO calendar parts (day-of-year, ISO
    week, ISO weekday) whose cross-engine agreement is notoriously
    finicky — pinned here value-for-value. All codegen; make_timestamp
    emits TIMESTAMP_NTZ matching the corpus timestamps."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_floor"),
        F.expr(
            "make_timestamp_ntz(year(o_orderdate), month(o_orderdate), "
            "day(o_orderdate), 12, 30, 0)"
        ).alias("noonish"),
        (d.cast("date") + F.expr("INTERVAL 2 MONTH") + F.expr("INTERVAL 10 DAY"))
        .alias("shifted"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
        F.expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("int").alias("iso_dow"),
    )
