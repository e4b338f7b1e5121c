"""Incremental aggregate maintenance: applying deltas must equal full
recomputation (operators/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.diff import snapshot_diff
from cdc_lite_spark.operators.incremental import apply_delta, sum_count_state


def test_incremental_equals_recompute(spark, tables):
    orders = tables["orders"]
    prev = orders.filter(F.col("o_orderkey") % 4 != 0)
    cur = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    keys = ["o_custkey"]

    state = sum_count_state(prev, keys, "o_totalprice")
    changes = snapshot_diff(prev, cur, ["o_orderkey"], include_prev=True)
    maintained = apply_delta(state, changes, keys, "o_totalprice")
    recomputed = sum_count_state(cur, keys, "o_totalprice")

    m = {r["o_custkey"]: (r["agg_count"], round(r["agg_sum"], 4)) for r in maintained.collect()}
    r = {r["o_custkey"]: (r["agg_count"], round(r["agg_sum"], 4)) for r in recomputed.collect()}
    assert set(m) == set(r)
    for k in r:
        assert m[k][0] == r[k][0]          # counts exact
        assert abs(m[k][1] - r[k][1]) < 1e-4  # sums to float tolerance


def test_delta_only_touches_changed_groups(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "id long, g string, v double"
    )
    cur = spark.createDataFrame(
        [(1, "a", 15.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 5.0)],
        "id long, g string, v double",
    )
    state = sum_count_state(base, ["g"], "v")
    changes = snapshot_diff(base, cur, ["id"], include_prev=True)
    # only groups a (update) and c (insert) appear in the delta
    delta_groups = {r["g"] for r in changes.select("g").distinct().collect()}
    assert delta_groups == {"a", "c"}
    out = {r["g"]: (r["agg_sum"], r["agg_count"]) for r in apply_delta(state, changes, ["g"], "v").collect()}
    assert out == {"a": (35.0, 2), "b": (30.0, 1), "c": (5.0, 1)}


def test_update_moving_row_across_groups(spark):
    """An UPDATE that changes the GROUP key retracts from the old group and
    adds to the new one."""
    base = spark.createDataFrame([(1, "a", 10.0), (2, "b", 5.0)], "id long, g string, v double")
    cur = spark.createDataFrame([(1, "b", 10.0), (2, "b", 5.0)], "id long, g string, v double")
    state = sum_count_state(base, ["g"], "v")
    changes = snapshot_diff(base, cur, ["id"], include_prev=True)
    out = {
        r["g"]: (r["agg_sum"], r["agg_count"])
        for r in apply_delta(state, changes, ["g"], "v").collect()
    }
    assert out == {"b": (15.0, 2)}  # group a vanished, its mass moved to b


def test_null_values_maintained_correctly(spark):
    """ADVICE r01: null-valued change records must not drift agg_count
    (COUNT(col) skips nulls) nor kill keys whose values are all null."""
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, "b", None)], "id long, g string, v double"
    )
    # update 2: null->5.0; delete 3 (null value); insert 4 with null value
    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (4, "c", None)], "id long, g string, v double"
    )
    state = sum_count_state(base, ["g"], "v")
    changes = snapshot_diff(base, cur, ["id"], include_prev=True)
    maintained = apply_delta(state, changes, ["g"], "v")
    recomputed = sum_count_state(cur, ["g"], "v")
    m = {r["g"]: (r["agg_sum"], r["agg_count"], r["agg_rows"]) for r in maintained.collect()}
    r = {r["g"]: (r["agg_sum"], r["agg_count"], r["agg_rows"]) for r in recomputed.collect()}
    assert m == r
    assert m["c"] == (None, 0, 1)  # all-null key survives with count 0


def test_dfreq_maintained_equals_recomputed(spark):
    """Apply INSERT/UPDATE/DELETE document changes to the df/N state: the
    maintained statistics must equal dfreq_state over the final corpus —
    term-for-term, including the corpus doc count and zero-df eviction."""
    from cdc_lite_spark.operators.incremental import apply_text_delta, dfreq_state

    docs0 = spark.createDataFrame(
        [
            (1, "spark joins tables"),
            (2, "spark windows"),
            (3, "unique disappearing words"),
        ],
        "doc_id long, text string",
    )
    state = dfreq_state(docs0)

    changes = spark.createDataFrame(
        [
            ("INSERT", 4, "spark streams", None),
            ("UPDATE", 2, "spark aggregates", "spark windows"),
            ("DELETE", 3, None, "unique disappearing words"),
        ],
        "operation string, doc_id long, text string, prev_text string",
    )
    maintained = apply_text_delta(state, changes)

    docs1 = spark.createDataFrame(
        [
            (1, "spark joins tables"),
            (2, "spark aggregates"),
            (4, "spark streams"),
        ],
        "doc_id long, text string",
    )
    expect = dfreq_state(docs1)
    m = {(r["term"]): (r["df_count"], r["n_docs"]) for r in maintained.collect()}
    e = {(r["term"]): (r["df_count"], r["n_docs"]) for r in expect.collect()}
    assert m == e
    assert "windows" not in m and "unique" not in m  # zero-df evicted
    assert m["spark"] == (3, 3)


def test_dfreq_update_without_membership_change_is_noop(spark):
    """An UPDATE whose term set is unchanged must leave every df intact
    (the +1/-1 cancel in one delta aggregation)."""
    from cdc_lite_spark.operators.incremental import apply_text_delta, dfreq_state

    docs = spark.createDataFrame(
        [(1, "spark spark tables")], "doc_id long, text string"
    )
    state = dfreq_state(docs)
    changes = spark.createDataFrame(
        [("UPDATE", 1, "tables spark", "spark spark tables")],
        "operation string, doc_id long, text string, prev_text string",
    )
    out = {r["term"]: r["df_count"] for r in apply_text_delta(state, changes).collect()}
    assert out == {"spark": 1, "tables": 1}
