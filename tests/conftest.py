from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from streamtasks_spark.session import get_spark

    s = get_spark("streamtasks_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from streamtasks_spark.session import load_tables

    return load_tables(spark, SF_SMOKE)
