"""Filtered maintained views: a ``where`` predicate restricts any view
family to σ_pred(table) while the per-tick fold stays O(delta) —
operators/diff.py ``filter_diff`` re-classifies each change record against
both row images (an UPDATE crossing the predicate boundary becomes an
INSERT into / DELETE from the view's world), builds and rebuilds filter
the snapshot scan (engine.py register_*_view(where=...))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.operators.diff import filter_diff, snapshot_diff

PRED = "price > 150000"


def _engine(spark, tmp_path) -> CdcEngine:
    return CdcEngine(
        spark, output_dir=str(tmp_path / "changes"), state_dir=str(tmp_path / "state")
    )


def _orders(spark, tables):
    return tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )


def _recompute(df, pred=PRED):
    return {
        r["o_orderstatus"]: (r["s"], r["c"], r["n"])
        for r in df.filter(pred)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("price").alias("s"),
            F.count("price").alias("c"),
            F.count("*").alias("n"),
        )
        .collect()
    }


def _view_dict(vdf):
    return {
        r["o_orderstatus"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in vdf.collect()
    }


# ---------------------------------------------------------------- filter_diff


def test_filter_diff_all_transitions(spark):
    """Every row of the re-classification table: INSERT/DELETE keep or
    drop; an UPDATE keeps, enters (→INSERT, prev_ nulled), leaves
    (→DELETE, cur payload nulled), or drops."""
    prev = spark.createDataFrame(
        [
            (1, "a", 10),  # update 10→150: enters
            (2, "a", 200),  # update 200→20: leaves
            (3, "b", 30),  # delete while out: dropped
            (4, "b", 400),  # delete while in: DELETE
            (5, "c", 50),  # update 50→60 (stays out): dropped
            (8, "c", 300),  # update 300→500 (stays in): UPDATE
        ],
        "k int, g string, v int",
    )
    cur = spark.createDataFrame(
        [(1, "a", 150), (2, "a", 20), (5, "c", 60), (8, "c", 500),
         (6, "b", 600), (7, "c", 7)],  # 6: insert in; 7: insert out
        "k int, g string, v int",
    )
    d = snapshot_diff(prev, cur, ["k"], fast_hash=True, include_prev=True)
    out = {
        r["k"]: r.asDict()
        for r in filter_diff(d, "v > 100").collect()
    }
    assert set(out) == {1, 2, 4, 6, 8}
    assert out[1]["operation"] == "INSERT" and out[1]["v"] == 150
    assert out[1]["prev_v"] is None and out[1]["prev_g"] is None
    assert out[2]["operation"] == "DELETE" and out[2]["prev_v"] == 200
    assert out[2]["v"] is None and out[2]["g"] is None
    assert out[4]["operation"] == "DELETE" and out[4]["prev_v"] == 400
    assert out[6]["operation"] == "INSERT" and out[6]["v"] == 600
    assert out[8]["operation"] == "UPDATE" and out[8]["v"] == 500
    assert out[8]["prev_v"] == 300


def test_filter_diff_null_predicate_is_false(spark):
    """NULL predicate results count as false (SQL WHERE semantics): a row
    whose value goes NULL leaves the view; a NULL row entering stays out."""
    prev = spark.createDataFrame([(1, 100), (2, None)], "k int, v int")
    cur = spark.createDataFrame([(1, None), (2, 300)], "k int, v int")
    d = snapshot_diff(prev, cur, ["k"], fast_hash=True, include_prev=True)
    out = {r["k"]: r.asDict() for r in filter_diff(d, "v > 50").collect()}
    assert out[1]["operation"] == "DELETE" and out[1]["prev_v"] == 100
    assert out[2]["operation"] == "INSERT" and out[2]["v"] == 300


def test_filter_diff_group_key_predicate(spark):
    """The predicate may reference any column, including one used as a
    view group key — a group-moving update re-classifies on both images."""
    prev = spark.createDataFrame([(1, "keep", 10), (2, "drop", 20)],
                                 "k int, g string, v int")
    cur = spark.createDataFrame([(1, "drop", 10), (2, "keep", 20)],
                                "k int, g string, v int")
    d = snapshot_diff(prev, cur, ["k"], fast_hash=True, include_prev=True)
    out = {r["k"]: r.asDict() for r in filter_diff(d, "g = 'keep'").collect()}
    assert out[1]["operation"] == "DELETE" and out[1]["prev_g"] == "keep"
    assert out[2]["operation"] == "INSERT" and out[2]["g"] == "keep"


# ------------------------------------------------------------- engine e2e


def test_filtered_view_maintained_across_ticks(spark, tables, tmp_path):
    """Two real ticks with boundary-crossing updates, deletes, and inserts:
    the maintained filtered view matches a from-scratch filtered recompute
    after every tick."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "rev_hi", "orders", ["o_orderstatus"], "price", where=PRED
    )
    base = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}

    eng.poll_once({"orders": base}, mode="diff", keys=keys)
    assert _view_dict(eng.view("rev_hi")) == _recompute(base)

    k = F.col("o_orderkey")
    # %3: price doubles (some cross INTO the predicate); %5: price floors
    # to 1 (crosses OUT); %7: row deleted (some in, some out of the subset)
    mutated = base.filter(k % 7 != 0).withColumn(
        "price",
        F.when(k % 3 == 0, F.col("price") * 2)
        .when(k % 5 == 0, F.lit(1).cast("decimal(18,2)"))
        .otherwise(F.col("price")),
    )
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)
    assert _view_dict(eng.view("rev_hi")) == _recompute(mutated)


def test_filtered_view_spec_is_pinned(spark, tables, tmp_path):
    """Re-registering the same name with a DIFFERENT predicate against
    existing state is refused — the predicate defines which rows the state
    aggregates, same pinning rule as bucket edges."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("v", "orders", ["o_orderstatus"], "price", where=PRED)
    base = _orders(spark, tables)
    eng.poll_once({"orders": base}, mode="diff", keys={"orders": ["o_orderkey"]})

    eng2 = _engine(spark, tmp_path)
    eng2.register_agg_view(
        "v", "orders", ["o_orderstatus"], "price", where="price > 1"
    )
    with pytest.raises(ValueError, match="re-register under a new name"):
        eng2.view("v")


def test_filtered_minmax_update_leaving_predicate_rebuilds(spark, tables, tmp_path):
    """min_max folds insert-only deltas; an update that moves the group
    MAXIMUM out of the predicate is a retraction of the filtered world and
    must rebuild — the maintained extrema still match a filtered recompute."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "mm", "orders", ["o_orderstatus"], "price", kind="min_max", where=PRED
    )
    base = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": base}, mode="diff", keys=keys)

    # knock the current in-predicate maximum out of the subset
    top = (
        base.filter(PRED).orderBy(F.col("price").desc()).limit(1).collect()[0]
    )
    mutated = base.withColumn(
        "price",
        F.when(
            F.col("o_orderkey") == top["o_orderkey"],
            F.lit(1).cast("decimal(18,2)"),
        ).otherwise(F.col("price")),
    )
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)
    want = {
        r["o_orderstatus"]: (r["mn"], r["mx"])
        for r in mutated.filter(PRED)
        .groupBy("o_orderstatus")
        .agg(F.min("price").alias("mn"), F.max("price").alias("mx"))
        .collect()
    }
    got = {
        r["o_orderstatus"]: (r["agg_min"], r["agg_max"])
        for r in eng.view("mm").collect()
    }
    assert got == want


def test_filtered_partition_view_matches_recompute(spark, tables, tmp_path):
    """Partition-granular filtered view: drift is detected on unfiltered
    fingerprints, the re-aggregation filters — merged reads match a
    filtered recompute."""
    eng = _engine(spark, tmp_path)
    eng.register_partition_agg_view(
        "pv", "orders", "o_orderstatus", [], "price", where=PRED
    )
    base = _orders(spark, tables)
    eng.poll_partitions("orders", base, "o_orderstatus")

    mutated = base.filter(F.col("o_orderkey") % 4 != 1)
    eng.poll_partitions("orders", mutated, "o_orderstatus")
    want = mutated.filter(PRED).agg(
        F.sum("price").alias("s"), F.count("price").alias("c")
    ).collect()[0]
    got = eng.view_merged("pv").collect()[0]
    assert (got["agg_sum"], got["agg_count"]) == (want["s"], want["c"])


def test_filtered_join_agg_view_matches_recompute(spark, tables, tmp_path):
    """Aggregate over a join view restricted by a predicate over EITHER
    side's columns: folded across a tick mutating the fact, matches the
    filtered join recompute."""
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
    jpred = "price > 150000 AND c_mktsegment <> 'BUILDING'"
    eng.register_join_agg_view(
        "oc_rev", "oc", ["c_mktsegment"], "price", where=jpred
    )
    keys = {"orders": ["o_orderkey"], "customer": ["c_custkey"]}

    def _want(fact):
        j = fact.join(cust, fact["o_custkey"] == cust["c_custkey"])
        return {
            r["c_mktsegment"]: (r["s"], r["c"])
            for r in j.filter(jpred)
            .groupBy("c_mktsegment")
            .agg(F.sum("price").alias("s"), F.count("price").alias("c"))
            .collect()
        }

    eng.poll_once({"orders": orders, "customer": cust}, mode="diff", keys=keys)
    got = {
        r["c_mktsegment"]: (r["agg_sum"], r["agg_count"])
        for r in eng.view("oc_rev").collect()
    }
    assert got == _want(orders)

    k = F.col("o_orderkey")
    mutated = orders.filter(k % 6 != 0).withColumn(
        "price",
        F.when(k % 5 == 0, F.col("price") * 2).otherwise(F.col("price")),
    )
    eng.poll_once({"orders": mutated, "customer": cust}, mode="diff", keys=keys)
    got = {
        r["c_mktsegment"]: (r["agg_sum"], r["agg_count"])
        for r in eng.view("oc_rev").collect()
    }
    assert got == _want(mutated)


def test_where_registration_validation(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    with pytest.raises(ValueError, match="non-empty"):
        eng.register_agg_view("x", "t", ["g"], "v", where="  ")
    with pytest.raises(ValueError, match="non-empty"):
        eng.register_partition_agg_view("x", "t", "p", ["g"], "v", where="")


# -------------------------------------------------- view_topk reader parity


def test_view_topk_serves_join_agg_and_partition_views(spark, tables, tmp_path):
    """r9 reader parity: view_topk ranks join-aggregate state and partition
    views' MERGED per-group totals — the same state-only discipline."""
    eng = _engine(spark, tmp_path)
    orders = tables["orders"].select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    cust = tables["customer"].select("c_custkey", "c_mktsegment")
    eng.register_join_view(
        "oc", fact_table="orders", dim_table="customer",
        fact_key="o_orderkey", fact_dim_col="o_custkey", dim_key="c_custkey",
    )
    eng.register_join_agg_view("seg_rev", "oc", ["c_mktsegment"], "price")
    keys = {"orders": ["o_orderkey"], "customer": ["c_custkey"]}
    eng.poll_once({"orders": orders, "customer": cust}, mode="diff", keys=keys)

    top3 = eng.view_topk("seg_rev", 3, [])
    got = [r["c_mktsegment"] for r in top3.orderBy("rank").collect()]
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    want = [
        r["c_mktsegment"]
        for r in j.groupBy("c_mktsegment")
        .agg(F.sum("price").alias("s"))
        .orderBy(F.col("s").desc(), "c_mktsegment")
        .limit(3)
        .collect()
    ]
    assert got == want

    # partition view: per-(partition, group) fragments merge before ranking
    eng2 = _engine(spark, tmp_path / "p")
    eng2.register_partition_agg_view(
        "pprio", "orders", "o_orderpriority", ["o_custkey"], "price"
    )
    eng2.poll_partitions("orders", orders, "o_orderpriority")
    top5 = eng2.view_topk("pprio", 5, [])
    got = [r["o_custkey"] for r in top5.orderBy("rank").collect()]
    want = [
        r["o_custkey"]
        for r in orders.groupBy("o_custkey")
        .agg(F.sum("price").alias("s"))
        .orderBy(F.col("s").desc(), "o_custkey")
        .limit(5)
        .collect()
    ]
    assert got == want

    # non-rankable kinds still refuse with the ValueError discipline
    eng2.register_partition_agg_view(
        "phist", "orders", "o_orderpriority", [], "price",
        kind="histogram", lo=0.0, hi=600000.0,
    )
    with pytest.raises(ValueError, match="top-k ranks"):
        eng2.view_topk("phist", 2, [])
