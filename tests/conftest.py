from __future__ import annotations

import os

import pytest

from cdc_lite_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Test data is tiny (sf0.001): a 6g heap is ample and keeps the JVM's
    # RSS far from any container memory limit over a ~900-test session —
    # the r13 round driver's pytest run died with a JVM-channel EOFError
    # 30 minutes in (VERIFY_r13), the signature of the JVM being killed
    # under memory pressure, so the test session bounds itself.  The
    # shortened periodic-GC interval makes the context cleaner actually
    # reclaim broadcast/shuffle state across a long suite instead of once
    # per (default) 30 minutes.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
    s = get_spark(
        "cdc_lite_spark_tests",
        cpus=8,
        extra_conf={"spark.cleaner.periodicGC.interval": "5min"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from cdc_lite_spark.sources.tables import load_tables

    return load_tables(spark, sf_dir)
