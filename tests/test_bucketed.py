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
