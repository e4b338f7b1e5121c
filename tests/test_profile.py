"""ANALYZE-style one-pass table profiling (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.profile import column_stats


def test_column_stats_metrics_and_types(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, None), (2, "b", -2.0, "x"), (2, None, 4.25, "x")],
        "k long, s string, v double, t string",
    )
    rows = {r["col_name"]: r for r in column_stats(df).collect()}
    assert set(rows) == {"k", "s", "v", "t"}
    assert rows["k"]["n_rows"] == 3 and rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 2 and rows["k"]["ndv_ok"] == 1
    assert (rows["k"]["min_num"], rows["k"]["max_num"]) == (1.0, 2.0)
    assert rows["k"]["min_str"] is None  # numeric column: string pair null
    assert rows["s"]["n_nulls"] == 1
    assert (rows["s"]["min_str"], rows["s"]["max_str"]) == ("a", "b")
    assert rows["s"]["min_num"] is None
    assert (rows["v"]["min_num"], rows["v"]["max_num"]) == (-2.0, 4.25)
    assert rows["t"]["n_distinct"] == 1


def test_column_stats_is_two_passes_not_per_column(spark):
    """Exactly TWO scans (the exact/distinct pass and the sketch pass —
    mixing them in one Aggregate trips a combinatorial Expand, see the
    operator docstring), never one scan per column; the sketch side joins
    back as a broadcast of its single row."""
    from cdc_lite_spark.plans.inspect import explain_str
    from cdc_lite_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    plan = explain_str(column_stats(orders))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2
    assert "Generate" in plan  # the explode-unpivot, not a per-column union
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
