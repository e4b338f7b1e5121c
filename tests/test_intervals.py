"""Interval-concurrency sweep (operators/intervals.py).

Pins: the distributed two-level prefix sum equals a brute-force global
sweep, inclusive-inclusive boundary semantics, point intervals count,
bucket-boundary crossings carry the offset correctly, and the only
unpartitioned window in the plan runs over bucket totals (the boundary
stream itself is never globally sorted).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_lite_spark.operators.intervals import interval_concurrency
from cdc_lite_spark.plans.inspect import explain_str

US_H = 3_600_000_000


def _sweep_rows(spark, ivals, bucket_us=US_H):
    df = spark.createDataFrame(ivals, "s_us long, e_us long")
    out = interval_concurrency(df, "s_us", "e_us", bucket_us=bucket_us)
    return {r["t"]: (r["starts"], r["ends"], r["concurrency"]) for r in out.collect()}


def _brute(ivals):
    """Reference: concurrency(t) = #{[s,e] : s <= t <= e} at each boundary."""
    ts = sorted({t for iv in ivals for t in iv})
    return {t: sum(1 for s, e in ivals if s <= t <= e) for t in ts}


def test_matches_bruteforce_across_buckets(spark):
    # intervals deliberately straddling hour-bucket boundaries, with ties
    ivals = [
        (100, 200),
        (150, US_H + 50),          # crosses bucket 0 -> 1
        (200, 200),                # point interval, tied with an end
        (US_H, US_H),              # point interval exactly on the boundary
        (US_H + 10, 3 * US_H + 5), # spans an EMPTY middle bucket
        (100, 100),
        (2 * US_H + 1, 2 * US_H + 2),
    ]
    got = _sweep_rows(spark, ivals)
    want = _brute(ivals)
    assert {t: c for t, (_, _, c) in got.items()} == want


def test_inclusive_end_semantics(spark):
    # [0, 10] and [10, 20]: both cover t=10
    got = _sweep_rows(spark, [(0, 10), (10, 20)])
    assert got[10][2] == 2
    assert got[0][2] == 1 and got[20][2] == 1


def test_counts_per_boundary(spark):
    got = _sweep_rows(spark, [(5, 5), (5, 7), (3, 5)])
    starts, ends, conc = got[5]
    assert (starts, ends) == (2, 2)  # two intervals start at 5, two end at 5
    assert conc == 3  # all three cover instant 5


def test_only_bucket_totals_window_is_global(spark):
    df = spark.createDataFrame([(100, 200)], "s_us long, e_us long")
    out = interval_concurrency(df, "s_us", "e_us")
    # offsets come back as a broadcast, never a shuffle of the boundaries
    assert "BroadcastExchange" in explain_str(out)
    # exactly two Window operators: the bucket-partitioned running sum and
    # the O(buckets) offsets prefix — nothing else windows over the stream
    simple = explain_str(out, "simple")
    assert simple.count("+- Window ") == 2, simple


def test_agrees_with_plain_global_window(spark):
    """The decomposition vs the textbook single-window sweep on a larger
    pseudo-random interval set (deterministic generator)."""
    df = (
        spark.range(500)
        .select(
            (F.xxhash64("id") % (4 * US_H)).alias("a"),
            (F.xxhash64("id", F.lit(1)) % US_H).alias("b"),
        )
        .select(
            F.abs("a").alias("s_us"), (F.abs("a") + F.abs("b")).alias("e_us")
        )
    )
    fast = interval_concurrency(df, "s_us", "e_us")
    bounds = (
        df.select(F.col("s_us").alias("t"), F.lit(1).alias("d"))
        .unionAll(df.select("e_us", F.lit(-1)))
        .groupBy("t")
        .agg(
            F.sum("d").alias("net"),
            F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).alias("ends"),
        )
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slow = bounds.select(
        "t", (F.sum("net").over(w) + F.col("ends")).alias("concurrency")
    )
    a = {r["t"]: r["concurrency"] for r in fast.collect()}
    b = {r["t"]: r["concurrency"] for r in slow.collect()}
    assert a == b


def test_checkpoint_computes_expensive_source_once(spark):
    """checkpoint=True materializes the input ONCE up front: an expensive
    interval source (counted via an accumulator inside mapInPandas) is
    derived a single time, where the default plan re-derives it per
    branch; results are identical either way."""
    acc = spark.sparkContext.accumulator(0)

    def counted(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    base = spark.range(100).coalesce(1).select(
        (F.col("id") * (US_H // 10)).alias("s_us"),
        (F.col("id") * (US_H // 10) + US_H).alias("e_us"),
    )
    expensive = base.mapInPandas(counted, "s_us long, e_us long")

    want = {
        r["t"]: r["concurrency"]
        for r in interval_concurrency(base, "s_us", "e_us").collect()
    }
    got = {
        r["t"]: r["concurrency"]
        for r in interval_concurrency(
            expensive, "s_us", "e_us", checkpoint=True
        ).collect()
    }
    assert got == want
    assert acc.value == 100  # one derivation of the 100-row source

    acc2 = spark.sparkContext.accumulator(0)

    def counted2(batches):
        for pdf in batches:
            acc2.add(len(pdf))
            yield pdf

    expensive2 = base.mapInPandas(counted2, "s_us long, e_us long")
    interval_concurrency(expensive2, "s_us", "e_us").collect()
    assert acc2.value >= 200  # default plan re-derives the source per branch
