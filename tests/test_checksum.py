"""Checksum / fingerprint operator tests (SURVEY.md §2 C1-C3).

Mirrors the reference's change-detection contract: same multiset of rows →
same digest, regardless of order; any row change → different digest
(/root/reference/pkg/duckdb/duckdb_cdc.go:169-199).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cdc_lite_spark.operators.checksum import (
    partition_checksums,
    table_checksum,
    table_checksum_sql,
    table_checksum_value,
)


def test_checksum_deterministic(tables):
    nation = tables["nation"]
    a = table_checksum_value(nation)
    b = table_checksum_value(nation)
    assert a == b
    assert len(a) == 32  # md5 hex


def test_checksum_order_insensitive(tables):
    nation = tables["nation"]
    shuffled = nation.orderBy(F.rand(seed=1)).repartition(7)
    assert table_checksum_value(nation) == table_checksum_value(shuffled)


def test_checksum_detects_change(tables):
    nation = tables["nation"]
    mutated = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 0, F.lit("MUTATED")).otherwise(F.col("n_name")),
    )
    assert table_checksum_value(nation) != table_checksum_value(mutated)
    # row removal also detected
    assert table_checksum_value(nation) != table_checksum_value(
        nation.filter("n_nationkey != 3")
    )


def test_checksum_matches_duckdb_oracle(spark, tables, sf_dir):
    """The portable (md5-based) digest must be bit-identical in DuckDB —
    this is the §7.4 cross-engine parity requirement."""
    nation = tables["nation"]
    spark_sum = table_checksum(nation, fast=False).collect()[0]["checksum"]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf_dir}/nation.parquet')"
    )
    sql = table_checksum_sql("nation", nation.dtypes)
    duck = con.execute(sql).fetchone()[0]
    assert spark_sum == duck


def test_partition_checksums(tables):
    events = tables["events"]
    by_type = partition_checksums(events, "event_type", fast=True)
    rows = {r["part"]: r for r in by_type.collect()}
    assert sum(r["n_rows"] for r in rows.values()) == events.count()
    # mutating one partition changes only that partition's digest
    mutated = events.withColumn(
        "value",
        F.when(F.col("event_type") == "click", F.col("value") + 1).otherwise(F.col("value")),
    )
    rows2 = {r["part"]: r for r in partition_checksums(mutated, "event_type", fast=True).collect()}
    changed = [p for p in rows if rows[p]["checksum"] != rows2[p]["checksum"]]
    assert changed == ["click"]
