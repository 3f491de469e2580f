"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + columns +
order-insensitive values) so breakage is caught before a round ends.
"""

from __future__ import annotations

import pytest

from avro_topic_replication_spark.queries import all_queries
from tests.oracle import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df is not None
    if q.oracle is None:
        # rows-only check: must execute and have a stable schema
        n = df.count()
        assert n >= 0
        return
    problems = compare(df, oracle_con, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
