from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pulsar_spark import get_spark

    s = get_spark("pulsar-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def messages(spark):
    from pulsar_spark import events_to_messages
    from pulsar_spark.sources import load_table

    return events_to_messages(load_table(spark, SF_DIR, "events")).cache()


@pytest.fixture(scope="session")
def documents(spark):
    from pulsar_spark.sources import load_table

    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    from pulsar_spark.sources import load_table

    return load_table(spark, SF_DIR, "embeddings").cache()
