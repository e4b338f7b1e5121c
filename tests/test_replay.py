"""Change-log replay / state reconstruction (operators/replay.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.diff import snapshot_diff
from cdc_lite_spark.operators.replay import apply_changes


def test_replay_reconstructs_cur(spark, tables):
    orders = tables["orders"]
    prev = orders.filter(F.col("o_orderkey") % 4 != 0)
    cur = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("RUSH")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    diff = snapshot_diff(prev, cur, ["o_orderkey"])
    recon = apply_changes(prev, diff, ["o_orderkey"])
    assert recon.count() == cur.count()
    assert recon.exceptAll(cur).count() == 0
    assert cur.exceptAll(recon).count() == 0


def test_replay_last_writer_wins(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    changes = spark.createDataFrame(
        [
            (1, "x", "UPDATE", 1),
            (1, "y", "UPDATE", 2),   # later write wins
            (2, None, "DELETE", 1),
            (3, "new", "INSERT", 1),
        ],
        "id long, v string, operation string, seq long",
    )
    out = {r["id"]: r["v"] for r in apply_changes(base, changes, ["id"], ["seq"]).collect()}
    assert out == {1: "y", 3: "new"}
