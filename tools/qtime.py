#!/usr/bin/env python
"""Warm-session A/B timer for individual registry queries.

Usage:
    python tools/qtime.py NAME [NAME ...] [--runs 3] [--plan DIR/suffix]
                          [--oracle /root/testdata/sf0.01 ...]

For each query: build the DataFrame via its registered fn and materialize
through the noop sink (the bench's timed action), ``--runs`` times; print
every timing and the min. With ``--plan plans/r12:after`` also write
``plans/r12/<name>_after.txt`` with explain("formatted"). With ``--oracle``
compare the DataFrame against the query's DuckDB oracle at each given sf
dir (bit-exact, tests/oracle.compare) — the guard that an optimization did
not change what the query computes.

Warm-session numbers sit below the fresh-JVM isolated protocol by a
constant (codegen/JIT warmth) but are comparable to each other, which is
what an A/B needs; cross-round comparisons still use bench.py --isolated.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    plan_spec = None
    oracle_dirs: list[str] = []
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--plan":
            plan_spec = args[i + 1]; i += 2
        elif a == "--oracle":
            i += 1
            while i < len(args) and not args[i].startswith("--"):
                oracle_dirs.append(args[i]); i += 1
        else:
            names.append(a); i += 1

    from avro_topic_replication_spark.queries import all_queries
    from avro_topic_replication_spark.session import get_spark

    qs = all_queries()
    spark = get_spark(app_name="qtime")
    # same warmup as bench.py
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    from pyspark.sql.functions import col, pandas_udf

    w = pandas_udf(lambda s: s * 1.0, "double")
    spark.range(100_000).select(w(col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()

    rc = 0
    for name in names:
        q = qs[name]
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{r}")
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: min={min(times)} runs={times}")
        if plan_spec:
            out_dir, suffix = plan_spec.split(":")
            df = q.fn(spark, SF_DIR)
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            print(f"  plan -> {path}")
        for od in oracle_dirs:
            if q.oracle is None:
                print(f"  oracle {od}: rows-only, skipped")
                continue
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), "tests"))
            from oracle import compare, duckdb_connection

            con = duckdb_connection(od)
            probs = compare(q.fn(spark, od), con, q.oracle)
            status = "OK" if not probs else f"FAIL {probs[:3]}"
            print(f"  oracle {od}: {status}")
            if probs:
                rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
