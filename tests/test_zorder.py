"""Z-order layout key (operators/zorder.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark.operators.zorder import (
    zorder_key,
    zorder_repartition,
)


def _morton2(x: int, y: int, bits: int) -> int:
    """Driver-side reference interleave (dim 0 at even bits)."""
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_key_matches_python_reference(spark):
    df = spark.range(0, 200).select(
        (F.col("id") * 7 % 61).alias("x"), (F.col("id") * 13 % 53).alias("y")
    )
    got = df.withColumn(
        "z", zorder_key([F.col("x"), F.col("y")], bits=8)
    ).collect()
    for row in got:
        assert row["z"] == _morton2(row["x"], row["y"], 8), row


def test_key_rejects_overflow():
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2)], bits=32)  # 64 bits > signed long


def test_repartition_gives_tight_rectangles(spark):
    """The whole point: after Z-order layout, every partition covers a
    small rectangle of BOTH dimensions (so min/max file stats prune on
    either one)."""
    grid = 32
    pts = (
        spark.range(0, grid * grid)
        .select(
            (F.col("id") % grid).alias("x"),
            (F.col("id") / grid).cast("long").alias("y"),
        )
    )
    laid = zorder_repartition(pts, [F.col("x"), F.col("y")], 16, bits=5)
    spans = (
        laid.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(spans) > 4  # actually spread across partitions
    for row in spans:
        # a random layout would give spans ~31 on both axes; the Z curve
        # keeps every partition inside a fraction of the grid
        assert row["dx"] <= grid // 2 and row["dy"] <= grid // 2, row
