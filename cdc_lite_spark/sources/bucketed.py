"""Bucketed-table helpers: co-located joins without a shuffle.

SCALING.md claims "bucketed base tables make the prev side shuffle-free" —
these helpers are that path.  ``write_bucketed`` persists a DataFrame
hash-bucketed by the join keys (``bucketBy`` requires ``saveAsTable``);
two tables bucketed the same way join with ZERO exchanges, which at 100 TB
is the difference between a per-tick diff that reshuffles the world and
one that streams bucket-to-bucket.

tests/test_bucketed.py asserts the no-Exchange plan, not just the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed (and sorted within buckets) by ``keys``."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
