"""Derived-column maintained views: ``derive={"name": "sql expr"}`` lets
group keys, the value column, and the where predicate be EXPRESSIONS of
the row — the maintained form of TPC-H-Q1-style rollups (sum of
l_extendedprice*(1-l_discount) by flag) — while folds stay O(delta):
operators/diff.py derive_diff evaluates each expression against both row
images of the change records."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.operators.diff import derive_diff, snapshot_diff

REV = "l_extendedprice * (1 - l_discount)"


def _engine(spark, tmp_path) -> CdcEngine:
    return CdcEngine(
        spark, output_dir=str(tmp_path / "changes"), state_dir=str(tmp_path / "state")
    )


def _lineitem(spark, tables):
    """The synthetic lineitem has DUPLICATE (l_orderkey, l_linenumber)
    pairs (unlike real TPC-H), so deterministically keep one row per key —
    a diff key must be unique for the snapshot diff to classify rows."""
    from pyspark.sql import Window

    li = tables["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("l_extendedprice"),
        F.col("l_discount").cast("decimal(18,2)").alias("l_discount"),
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_extendedprice", "l_discount", "l_returnflag"
    )
    return (
        li.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn")
    )


def _recompute(df):
    return {
        r["l_returnflag"]: (r["s"], r["c"])
        for r in df.withColumn("revenue", F.expr(REV))
        .groupBy("l_returnflag")
        .agg(F.sum("revenue").alias("s"), F.count("revenue").alias("c"))
        .collect()
    }


# ------------------------------------------------------------- derive_diff


def test_derive_diff_evaluates_both_images(spark):
    prev = spark.createDataFrame(
        [(1, 10, 2), (2, 20, 3), (3, 30, 4)], "k int, a int, b int"
    )
    # 1: update a 10->11; 2: delete; 4: insert
    cur = spark.createDataFrame(
        [(1, 11, 2), (3, 30, 4), (4, 40, 5)], "k int, a int, b int"
    )
    d = snapshot_diff(prev, cur, ["k"], fast_hash=True, include_prev=True)
    out = {
        r["k"]: r.asDict()
        for r in derive_diff(d, {"prod": "a * b", "tot": "coalesce(a, 0) + k"}).collect()
    }
    assert out[1]["prod"] == 22 and out[1]["prev_prod"] == 20
    # DELETE rows: cur-side derived NULL even for null-tolerant exprs
    assert out[2]["prod"] is None and out[2]["tot"] is None
    assert out[2]["prev_prod"] == 60 and out[2]["prev_tot"] == 22
    # INSERT rows: prev-side derived NULL
    assert out[4]["prod"] == 200 and out[4]["prev_prod"] is None
    assert out[4]["prev_tot"] is None


def test_derive_diff_rejects_collisions(spark):
    prev = spark.createDataFrame([(1, 10)], "k int, a int")
    cur = spark.createDataFrame([(1, 11)], "k int, a int")
    d = snapshot_diff(prev, cur, ["k"], fast_hash=True, include_prev=True)
    with pytest.raises(ValueError, match="collides"):
        derive_diff(d, {"a": "a + 1"})
    with pytest.raises(ValueError, match="collides"):
        derive_diff(d, {"prev_a": "a + 1"})


# ----------------------------------------------------------------- engine


def test_derived_revenue_view_maintained_across_ticks(spark, tables, tmp_path):
    """The maintained Q1 shape: sum/count of l_extendedprice*(1-l_discount)
    by returnflag over lineitem's COMPOSITE key, folded across a tick with
    price updates, deletes, and inserts — equals the recompute exactly
    (decimal arithmetic)."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "q1", "lineitem", ["l_returnflag"], "revenue", derive={"revenue": REV}
    )
    li = _lineitem(spark, tables)
    keys = {"lineitem": ["l_orderkey", "l_linenumber"]}

    base = li.filter(F.col("l_orderkey") % 3 != 0)
    eng.poll_once({"lineitem": base}, mode="diff", keys=keys)
    assert {
        r["l_returnflag"]: (r["agg_sum"], r["agg_count"])
        for r in eng.view("q1").collect()
    } == _recompute(base)

    k = F.col("l_orderkey")
    mutated = li.filter(k % 5 != 1).withColumn(
        "l_discount",
        F.when(k % 7 == 0, F.lit(0.05).cast("decimal(18,2)")).otherwise(
            F.col("l_discount")
        ),
    )
    eng.poll_once({"lineitem": mutated}, mode="diff", keys=keys)
    assert {
        r["l_returnflag"]: (r["agg_sum"], r["agg_count"])
        for r in eng.view("q1").collect()
    } == _recompute(mutated)


def test_derived_group_key_and_where_composition(spark, tables, tmp_path):
    """A derived column can be the GROUP KEY, and where may reference a
    derived name (ordering contract: derive, then filter)."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "bucketed",
        "orders",
        ["price_band"],
        "price",
        derive={"price_band": "CAST(price / 100000 AS INT)"},
        where="price_band >= 1",
    )
    orders = tables["orders"].select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)

    mutated = orders.filter(F.col("o_orderkey") % 4 != 2).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 9 == 0, F.col("price") * 2
        ).otherwise(F.col("price")),
    )
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)

    want = {
        r["price_band"]: (r["s"], r["n"])
        for r in mutated.withColumn(
            "price_band", F.expr("CAST(price / 100000 AS INT)")
        )
        .filter("price_band >= 1")
        .groupBy("price_band")
        .agg(F.sum("price").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    got = {
        r["price_band"]: (r["agg_sum"], r["agg_rows"])
        for r in eng.view("bucketed").collect()
    }
    assert got == want


def test_derive_spec_pinned_and_validated(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    with pytest.raises(ValueError, match="non-empty"):
        eng.register_agg_view("x", "t", ["g"], "v", derive={})
    with pytest.raises(ValueError, match="empty name or expression"):
        eng.register_agg_view("x", "t", ["g"], "v", derive={"a": "  "})

    eng.register_agg_view(
        "q1", "orders", ["o_orderstatus"], "rev", derive={"rev": "price * 2"}
    )
    orders = tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    eng.poll_once({"orders": orders}, mode="diff", keys={"orders": ["o_orderkey"]})

    eng2 = _engine(spark, tmp_path)
    eng2.register_agg_view(
        "q1", "orders", ["o_orderstatus"], "rev", derive={"rev": "price * 3"}
    )
    with pytest.raises(ValueError, match="re-register under a new name"):
        eng2.view("q1")


def test_derived_join_agg_view(spark, tables, tmp_path):
    """derive over a JOIN view's columns: maintained revenue by segment
    over orders ⋈ customer aggregating an expression of the fact side."""
    eng = _engine(spark, tmp_path)
    orders = tables["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    cust = tables["customer"].select("c_custkey", "c_mktsegment")
    eng.register_join_view(
        "oc", fact_table="orders", dim_table="customer",
        fact_key="o_orderkey", fact_dim_col="o_custkey", dim_key="c_custkey",
    )
    eng.register_join_agg_view(
        "seg_net", "oc", ["c_mktsegment"], "net",
        derive={"net": "price * CAST(0.9 AS DECIMAL(3,2))"},
    )
    keys = {"orders": ["o_orderkey"], "customer": ["c_custkey"]}
    eng.poll_once({"orders": orders, "customer": cust}, mode="diff", keys=keys)

    mutated = orders.filter(F.col("o_orderkey") % 6 != 0)
    eng.poll_once({"orders": mutated, "customer": cust}, mode="diff", keys=keys)

    j = mutated.join(cust, mutated["o_custkey"] == cust["c_custkey"])
    want = {
        r["c_mktsegment"]: r["s"]
        for r in j.withColumn("net", F.expr("price * CAST(0.9 AS DECIMAL(3,2))"))
        .groupBy("c_mktsegment")
        .agg(F.sum("net").alias("s"))
        .collect()
    }
    got = {
        r["c_mktsegment"]: r["agg_sum"] for r in eng.view("seg_net").collect()
    }
    assert got == want
