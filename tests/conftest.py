from __future__ import annotations

import pytest

from data_warehouse_implementation_spark.session import get_spark, load_tables

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="dwis-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_SMOKE)
