"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC query (smoke check at sf0.001).
``queries()`` / ``oracle_sql()`` — the registered operator surface; the
driver runs each Spark query against its DuckDB oracle at sf0.01
(row-count + schema + order-insensitive value-hash).

The real registry lives in cdc_lite_spark/queries.py — one entry per
operator from SURVEY.md §2, each documented with its reference file:line.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's CWD
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core operator — the order-insensitive
    whole-table fingerprint (duckdb_cdc.go:169-183) computed for every
    monitored table in one declarative plan (SURVEY.md §2 C1-C3)."""
    from cdc_lite_spark.queries import REGISTRY

    return REGISTRY["cdc_table_checksums"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cdc_lite_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from cdc_lite_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
