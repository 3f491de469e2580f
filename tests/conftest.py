from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_sessionstart(session):
    # Sweep tmp_-tagged fixture caches left by prior sessions' fuzz runs
    # (their pytest tmp source dirs are gone; the caches are dead weight).
    from avro_topic_replication_spark.streaming.replay import gc_scratch

    gc_scratch()


@pytest.fixture(scope="session")
def spark():
    from avro_topic_replication_spark.session import get_spark

    spark = get_spark(app_name="engine-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    from tests.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    yield con
    con.close()
