"""Snapshot-diff operator tests (SURVEY.md §2 F1-F3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.diff import inserted_keys, persisted_keys, snapshot_diff


def _split(orders):
    prev = orders.filter(F.col("o_orderkey") % 7 != 0)
    cur = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    return prev, cur


def test_snapshot_diff_classification(tables):
    prev, cur = _split(tables["orders"])
    diff = snapshot_diff(prev, cur, ["o_orderkey"])
    ops = {r["o_orderkey"]: r["operation"] for r in diff.collect()}

    prev_keys = {r[0] for r in prev.select("o_orderkey").collect()}
    cur_keys = {r[0] for r in cur.select("o_orderkey").collect()}
    expected_inserts = cur_keys - prev_keys
    expected_deletes = prev_keys - cur_keys
    expected_updates = {k for k in (cur_keys & prev_keys) if k % 3 == 0}

    assert {k for k, op in ops.items() if op == "INSERT"} == expected_inserts
    assert {k for k, op in ops.items() if op == "DELETE"} == expected_deletes
    assert {k for k, op in ops.items() if op == "UPDATE"} == expected_updates
    # unchanged keys are absent
    assert set(ops) == expected_inserts | expected_deletes | expected_updates


def test_diff_payload_null_for_delete(tables):
    prev, cur = _split(tables["orders"])
    diff = snapshot_diff(prev, cur, ["o_orderkey"])
    deletes = diff.filter("operation = 'DELETE'")
    assert deletes.filter(F.col("o_totalprice").isNotNull()).count() == 0
    inserts = diff.filter("operation = 'INSERT'")
    assert inserts.filter(F.col("o_totalprice").isNull()).count() == 0


def test_anti_semi_joins(tables):
    prev, cur = _split(tables["orders"])
    ins = inserted_keys(prev, cur, ["o_orderkey"])
    both = persisted_keys(prev, cur, ["o_orderkey"])
    assert ins.count() + both.count() == cur.count()
    # anti ∩ semi = ∅
    assert ins.join(both, "o_orderkey", "inner").count() == 0


def test_diff_no_change_is_empty(tables):
    orders = tables["orders"]
    assert snapshot_diff(orders, orders, ["o_orderkey"]).count() == 0


def test_diff_null_keys_match_null_safely(spark):
    """A stable null-key row must NOT appear as INSERT+DELETE churn."""
    prev = spark.createDataFrame([(None, "a"), (1, "b")], "id int, v string")
    cur = spark.createDataFrame([(None, "a"), (1, "c")], "id int, v string")
    diff = snapshot_diff(prev, cur, ["id"]).collect()
    assert len(diff) == 1
    assert diff[0]["id"] == 1 and diff[0]["operation"] == "UPDATE"
    # and a mutated null-key row shows as one UPDATE, not churn
    cur2 = spark.createDataFrame([(None, "z"), (1, "b")], "id int, v string")
    diff2 = snapshot_diff(prev, cur2, ["id"]).collect()
    assert len(diff2) == 1
    assert diff2[0]["id"] is None and diff2[0]["operation"] == "UPDATE"


def test_diff_both_empty(spark):
    empty = spark.createDataFrame([], "id int, v string")
    assert snapshot_diff(empty, empty, ["id"]).count() == 0


def test_diff_sees_empty_vs_null_update(spark):
    """VERDICT r05 repro: ''→NULL in a compared column is an UPDATE, not a
    no-op (row_hash canonicalization is injective since r06)."""
    prev = spark.createDataFrame([(0, "", 0)], "id int, payload string, value int")
    cur = spark.createDataFrame([(0, None, 0)], "id int, payload string, value int")
    rows = snapshot_diff(prev, cur, ["id"]).collect()
    assert [(r["id"], r["operation"]) for r in rows] == [(0, "UPDATE")]
    # and the reverse direction
    rows = snapshot_diff(cur, prev, ["id"]).collect()
    assert [(r["id"], r["operation"]) for r in rows] == [(0, "UPDATE")]


def test_diff_sees_comma_shift_update(spark):
    """VERDICT r05 repro: ('a,b','c') → ('a','b,c') is an UPDATE."""
    prev = spark.createDataFrame([(0, "a,b", "c")], "id int, p string, q string")
    cur = spark.createDataFrame([(0, "a", "b,c")], "id int, p string, q string")
    rows = snapshot_diff(prev, cur, ["id"]).collect()
    assert [(r["id"], r["operation"]) for r in rows] == [(0, "UPDATE")]
    # fast_hash (xxhash64) path must agree
    rows = snapshot_diff(prev, cur, ["id"], fast_hash=True).collect()
    assert [(r["id"], r["operation"]) for r in rows] == [(0, "UPDATE")]
