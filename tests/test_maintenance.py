"""Small-file compaction (operators/maintenance.py): fewer files, identical
data, crash-safe swap, no-op guards."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_lite_spark.operators.maintenance import compact_parquet, dir_stats


def _fragmented(spark, tmp_path, n_files=24):
    path = str(tmp_path / "frag")
    df = spark.range(0, 12_000).withColumn("v", F.col("id") * 2)
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path, df


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    path, df = _fragmented(spark, tmp_path)
    n0, _ = dir_stats(spark, path)
    assert n0 >= 24
    report = compact_parquet(spark, path, target_file_mb=128)
    assert report["skipped"] is False
    assert report["files_after"] < n0
    back = spark.read.parquet(path)
    assert back.count() == 12_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # no leftover staging dirs
    assert not os.path.exists(path + ".compact.tmp")
    assert not os.path.exists(path + ".old")


def test_compaction_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(10).coalesce(1).write.parquet(path)
    report = compact_parquet(spark, path)
    assert report["skipped"] is True
    assert report["files_after"] == report["files_before"]


def test_compaction_idempotent(spark, tmp_path):
    path, _ = _fragmented(spark, tmp_path)
    r1 = compact_parquet(spark, path, target_file_mb=128)
    r2 = compact_parquet(spark, path, target_file_mb=128)
    assert r1["skipped"] is False and r2["skipped"] is True
    assert spark.read.parquet(path).count() == 12_000
