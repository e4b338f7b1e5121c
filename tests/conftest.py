from __future__ import annotations

import pytest

from cdc_lite_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdc_lite_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from cdc_lite_spark.sources.tables import load_tables

    return load_tables(spark, sf_dir)
