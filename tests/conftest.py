from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from spark_iqmulus_spark.session import get_spark
    from spark_iqmulus_spark.sources import register_sources

    spark = get_spark("tests", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_sources(spark)
    yield spark
    spark.stop()
