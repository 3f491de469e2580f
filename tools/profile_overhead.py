#!/usr/bin/env python
"""Micro-profile the per-query fixed overheads the bench pays 349 times.

Quantifies, on the live container (run from /root/repo):
  1. DataFrameReader.parquet() with schema inference vs explicit schema
  2. ensure_runtime_conf() py4j round-trips
  3. a minimal scan->agg->noop query: first execution vs steady state
     (isolates codegen/plan-cache effects from data work)

Evidence feeds OPTIMIZATION_r12.md; not part of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_topic_replication_spark.session import ensure_runtime_conf, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(fn, n=1):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main() -> int:
    spark = get_spark(app_name="profile-overhead")
    path = os.path.join(SF_DIR, "lineitem.parquet")
    spark.read.parquet(path).count()  # warm: JVM, footers, listing

    # 1. read with inference vs explicit schema
    infer = t(lambda: spark.read.parquet(path), 30)
    schema = spark.read.parquet(path).schema
    explicit = t(lambda: spark.read.schema(schema).parquet(path), 30)
    print(f"read.parquet (infer):    {infer*1000:8.1f} ms/call")
    print(f"read.parquet (schema):   {explicit*1000:8.1f} ms/call")

    # same for every table (file sizes differ)
    from avro_topic_replication_spark.catalog import TABLES

    per_table = {}
    for name in TABLES:
        p = os.path.join(SF_DIR, f"{name}.parquet")
        per_table[name] = t(lambda p=p: spark.read.parquet(p), 10) * 1000
    print("infer ms/table:", {k: round(v, 1) for k, v in per_table.items()})

    # 2. ensure_runtime_conf
    conf = t(lambda: ensure_runtime_conf(spark), 50)
    print(f"ensure_runtime_conf:     {conf*1000:8.1f} ms/call")

    # 3. trivial query: build + noop, repeated
    from pyspark.sql import functions as F

    def run():
        df = (
            spark.read.schema(schema)
            .parquet(path)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
        )
        df.write.format("noop").mode("overwrite").save()

    first = t(run)
    steady = t(run, 5)
    print(f"trivial agg first run:   {first*1000:8.1f} ms")
    print(f"trivial agg steady:      {steady*1000:8.1f} ms/run")

    # 3b. same but with schema inference in the loop (the current
    # load_table shape)
    def run_infer():
        df = (
            spark.read.parquet(path)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
        )
        df.write.format("noop").mode("overwrite").save()

    steady_inf = t(run_infer, 5)
    print(f"trivial agg steady+infer:{steady_inf*1000:8.1f} ms/run")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
