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


def test_replay_across_column_add(spark):
    """A log spanning ALTER ADD: records written before the ADD carry null
    in the new column; the reconstructed state has the new column, null for
    base rows no change ever touched (database ALTER back-fill semantics)."""
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    # seq 1 predates the ADD (w is null there); seq 2 is post-ADD
    changes = spark.createDataFrame(
        [
            (1, "a2", None, "UPDATE", 1),
            (1, "a3", 7.5, "UPDATE", 2),  # post-ADD write wins, sets w
            (4, "new", None, "INSERT", 1),  # pre-ADD insert: w stays null
        ],
        "id long, v string, w double, operation string, seq long",
    )
    out = {r["id"]: r for r in apply_changes(base, changes, ["id"], ["seq"]).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert sorted(out[1].asDict()) == ["id", "v", "w"]
    assert (out[1]["v"], out[1]["w"]) == ("a3", 7.5)
    assert out[4]["w"] is None  # pre-ADD record
    assert out[2]["w"] is None and out[2]["v"] == "b"  # untouched base row


def test_replay_across_column_drop(spark):
    """A log whose current schema DROPped a base column: the reconstructed
    state follows the log's (current) schema — the column is gone, for
    replayed and passed-through rows alike."""
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, v string, gone int"
    )
    changes = spark.createDataFrame(
        [(1, "a2", "UPDATE", 1), (3, "c", "INSERT", 1)],
        "id long, v string, operation string, seq long",
    )
    recon = apply_changes(base, changes, ["id"], ["seq"])
    assert sorted(recon.columns) == ["id", "v"]
    out = {r["id"]: r["v"] for r in recon.collect()}
    assert out == {1: "a2", 2: "b", 3: "c"}


def test_replay_add_then_drop_roundtrip_vs_diff(spark, tables):
    """End-to-end drift replay: diff two snapshots whose schemas differ
    (cur ADDs one column and DROPs another) and fold the diff into prev —
    the reconstruction must equal cur exactly, including the drifted
    columns."""
    orders = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    prev = orders
    cur = (
        orders.filter(F.col("o_orderkey") % 2 != 0)
        .withColumn("flagged", F.col("o_orderkey") % 3 == 0)
        .drop("o_totalprice")
    )
    diff = snapshot_diff(prev.select("o_orderkey", "o_custkey"), cur, ["o_orderkey"])
    recon = apply_changes(prev, diff, ["o_orderkey"])
    assert sorted(recon.columns) == sorted(cur.columns)
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
