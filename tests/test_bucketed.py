"""Bucketed co-located joins: assert the SHUFFLE-FREE plan, not just results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark.operators.diff import snapshot_diff
from cdc_lite_spark.plans.inspect import explain_str
from cdc_lite_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_orders(spark, tables):
    # force the sort-merge path: at real scale neither CDC snapshot is
    # broadcastable, which is exactly when bucketing pays
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(tables["orders"], "orders_prev_b", ["o_orderkey"], n_buckets=4)
    write_bucketed(
        tables["orders"].withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1).otherwise(
                F.col("o_totalprice")
            ),
        ),
        "orders_cur_b",
        ["o_orderkey"],
        n_buckets=4,
    )
    yield "orders_prev_b", "orders_cur_b"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
    spark.sql("DROP TABLE IF EXISTS orders_prev_b")
    spark.sql("DROP TABLE IF EXISTS orders_cur_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_orders):
    prev_t, cur_t = bucketed_orders
    prev, cur = read_bucketed(spark, prev_t), read_bucketed(spark, cur_t)
    joined = prev.join(cur, "o_orderkey")
    plan = explain_str(joined)
    assert "Exchange" not in plan  # bucket layout satisfies the distribution
    assert joined.count() == prev.count()


def test_bucketed_snapshot_diff_shuffle_free(spark, tables, bucketed_orders):
    """The CDC diff over co-bucketed snapshots: no shuffle for either side."""
    prev_t, cur_t = bucketed_orders
    prev, cur = read_bucketed(spark, prev_t), read_bucketed(spark, cur_t)
    diff = snapshot_diff(prev, cur, ["o_orderkey"], null_safe=False)
    plan = explain_str(diff)
    assert "Exchange" not in plan
    ops = {r["operation"] for r in diff.collect()}
    assert ops == {"UPDATE"}
    assert diff.count() == tables["orders"].filter("o_orderkey % 3 = 0").count()


def test_suggest_layout_sizing():
    """The SCALING.md break-even knowledge as a callable (r11 verdict
    ask #6): flat below break-even, task-sized bucket counts above, the
    dual-index join family gated at its own (higher) break-even."""
    from cdc_lite_spark.streaming.bucketed import (
        BREAK_EVEN_JOIN_FACTS,
        BREAK_EVEN_REPLICA_ROWS,
        MAX_BUCKETS,
        suggest_layout,
    )

    # small table: everything flat
    s = suggest_layout(1_000_000, fan_out=100)
    assert s["replica"]["buckets"] is None
    assert s["join"]["fact_buckets"] is None

    # replica break-even crossed, join's not yet
    s = suggest_layout(BREAK_EVEN_REPLICA_ROWS, fan_out=100)
    assert s["replica"]["buckets"] is not None
    assert s["join"]["fact_buckets"] is None

    # 1B facts x 256B: replica+join bucketed, dim stays flat at 1M rows
    s = suggest_layout(1_000_000_000, fan_out=1_000, dim_rows=1_000_000)
    n = s["replica"]["buckets"]
    assert 8 <= n <= MAX_BUCKETS
    # ~256 GB / 256 MB = 1024 buckets
    assert 512 <= n <= 2048
    assert s["join"]["fact_buckets"] == n
    assert s["join"]["fk_buckets"] >= 8  # 1M postings x 32B: floor
    assert s["join"]["dim_buckets"] is None

    # big dim gets its own buckets; cap respected at extreme sizes
    s = suggest_layout(BREAK_EVEN_JOIN_FACTS, fan_out=2,
                       dim_rows=BREAK_EVEN_REPLICA_ROWS)
    assert s["join"]["dim_buckets"] is not None
    assert suggest_layout(10**13)["replica"]["buckets"] == MAX_BUCKETS

    import pytest as _pytest

    with _pytest.raises(ValueError, match="row_count"):
        suggest_layout(-1)
    with _pytest.raises(ValueError, match="fan_out"):
        suggest_layout(10**9, fan_out=0)
    with _pytest.raises(ValueError, match="row_bytes"):
        suggest_layout(10**9, row_bytes=0)
