from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small for test latency

from vector_spark.session import get_spark  # noqa: E402

SF_UNIT = 1_000
TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vector_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def seq(spark):
    from vector_spark import tables

    return tables.sequences(spark, SF_UNIT).cache()


@pytest.fixture(scope="session")
def dim(spark):
    from vector_spark import tables

    return tables.enrich_sources(spark)
