"""Histogram-bucket quantile state: exact maintenance, exact mergeability,
interpolated estimates (operators/histogram.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.diff import snapshot_diff
from cdc_lite_spark.operators.histogram import (
    apply_histogram_delta,
    histogram_state,
    merge_histogram_states,
    quantiles_from_histogram,
)

LO, HI, BINS = 0.0, 100.0, 10


def _state_dict(df):
    return {
        (r["g"], r["bucket"]): r["bkt_count"]
        for r in df.collect()
    }


def test_maintained_state_equals_rebuild(spark, tables):
    """I/U/D records (including updates that move rows across keys AND
    across buckets) fold to the exact rebuilt state — bucket counts are
    integers, so maintenance is bit-exact, not approximate."""
    orders = tables["orders"].select(
        "o_orderkey", F.col("o_orderstatus").alias("g"),
        F.col("o_totalprice").alias("v"),
    )
    k = F.col("o_orderkey")
    prev = orders.filter(k % 4 != 0)
    cur = orders.filter(k % 3 != 0).withColumn(
        "v", F.when(k % 5 == 0, F.col("v") * 2).otherwise(F.col("v"))
    ).withColumn(
        "g", F.when(k % 17 == 0, F.lit("X")).otherwise(F.col("g"))
    )
    lo, hi, bins = 0.0, 600000.0, 32
    state = histogram_state(prev, ["g"], "v", lo, hi, bins)
    changes = snapshot_diff(prev, cur, ["o_orderkey"], include_prev=True)
    maintained = apply_histogram_delta(state, changes, ["g"], "v", lo, hi, bins)
    rebuilt = histogram_state(cur, ["g"], "v", lo, hi, bins)
    assert _state_dict(maintained) == _state_dict(rebuilt)


def test_merge_equals_union(spark):
    rows = [("a", float(i % 97)) for i in range(300)] + [
        ("b", float((i * 7) % 97)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    # deterministic disjoint split (limit() without ordering can pick
    # different rows across the two downstream plans)
    left = df.filter(F.col("v") % 2 == 0)
    right = df.filter(F.col("v") % 2 != 0)
    a = histogram_state(left, ["g"], "v", LO, HI, BINS)
    b = histogram_state(right, ["g"], "v", LO, HI, BINS)
    merged = merge_histogram_states(a, b, ["g"])
    full = histogram_state(df, ["g"], "v", LO, HI, BINS)
    assert _state_dict(merged) == _state_dict(full)


def test_quantiles_exact_for_point_masses_and_monotone(spark):
    """A key whose mass sits at single in-bucket points: the interpolated
    median lands inside the right bucket; estimates are monotone in q;
    out-of-range values clamp into the end buckets instead of erroring."""
    rows = (
        [("p", 25.0)] * 10
        + [("p", 75.0)] * 10
        + [("c", -50.0)] * 5          # clamps to bucket 0
        + [("c", 1e9)] * 5            # clamps to bucket BINS-1
    )
    df = spark.createDataFrame(rows, "g string, v double")
    st = histogram_state(df, ["g"], "v", LO, HI, BINS)
    qs = [0.25, 0.5, 0.75, 1.0]
    got = {
        (r["g"], r["q"]): r["quantile_est"]
        for r in quantiles_from_histogram(st, ["g"], qs, LO, HI, BINS).collect()
    }
    # p: 10 rows in bucket 2 ([20,30)), 10 in bucket 7 ([70,80))
    assert 20.0 <= got[("p", 0.25)] <= 30.0
    assert 70.0 <= got[("p", 0.75)] <= 80.0
    assert got[("p", 1.0)] == 80.0  # right edge of the last occupied bucket
    # clamped key: all mass in the two end buckets
    assert 0.0 <= got[("c", 0.25)] <= 10.0
    assert 90.0 <= got[("c", 1.0)] <= 100.0
    for g in ("p", "c"):
        ests = [got[(g, q)] for q in qs]
        assert ests == sorted(ests), ests


def test_state_build_is_one_partial_agg_shuffle(spark, tables):
    st = histogram_state(
        tables["orders"], ["o_orderstatus"], "o_totalprice", 0.0, 600000.0, 32
    )
    plan = st._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    # map-side combine present: partial then final hash aggregate
    assert plan.count("HashAggregate") >= 2


def test_extreme_outliers_clamp_to_end_buckets(spark):
    """int32-overflowing bucket indices must still clamp to the END buckets
    (review finding: a cast-before-clamp wrapped 1e30 into bucket 0)."""
    rows = [("x", 1e30), ("x", 3e10), ("x", -1e30), ("x", float("inf"))]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["bucket"]: r["bkt_count"]
        for r in histogram_state(df, ["g"], "v", LO, HI, BINS).collect()
    }
    assert got == {BINS - 1: 3, 0: 1}


def test_degenerate_edges_rejected(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="bins"):
        histogram_state(df, ["g"], "v", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        histogram_state(df, ["g"], "v", 5.0, 5.0, 4)


def test_value_col_may_be_a_diff_key(spark):
    """Counting/summing the PK per group (the natural CLI shape): the diff
    has no prev_ twin for key columns — the fold must use the coalesced
    key itself as the previous value."""
    from cdc_lite_spark.operators.diff import snapshot_diff

    prev = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (3.0, "b")], "id double, g string"
    )
    cur = spark.createDataFrame(
        [(1.0, "a"), (3.0, "c"), (4.0, "b")], "id double, g string"
    )
    changes = snapshot_diff(prev, cur, ["id"], include_prev=True)
    state = histogram_state(prev, ["g"], "id", 0.0, 8.0, 4)
    maintained = apply_histogram_delta(state, changes, ["g"], "id", 0.0, 8.0, 4)
    rebuilt = histogram_state(cur, ["g"], "id", 0.0, 8.0, 4)
    assert _state_dict(maintained) == _state_dict(rebuilt)


def test_nan_values_excluded_and_maintained(spark):
    """NaN contributes nothing (floor(NaN) would cast to bucket 0 and drag
    low quantiles down), and NaN<->number transitions keep the maintained
    state equal to a rebuild."""
    from cdc_lite_spark.operators.diff import snapshot_diff

    nan = float("nan")
    prev = spark.createDataFrame(
        [(1, "a", nan), (2, "a", 50.0), (3, "a", 60.0)], "id long, g string, v double"
    )
    cur = spark.createDataFrame(
        [(1, "a", 55.0), (2, "a", nan), (3, "a", 60.0)], "id long, g string, v double"
    )
    assert sum(
        r["bkt_count"]
        for r in histogram_state(prev, ["g"], "v", LO, HI, BINS).collect()
    ) == 2  # the NaN row never lands in any bucket
    changes = snapshot_diff(prev, cur, ["id"], include_prev=True)
    maintained = apply_histogram_delta(
        histogram_state(prev, ["g"], "v", LO, HI, BINS),
        changes, ["g"], "v", LO, HI, BINS,
    )
    rebuilt = histogram_state(cur, ["g"], "v", LO, HI, BINS)
    assert _state_dict(maintained) == _state_dict(rebuilt)
