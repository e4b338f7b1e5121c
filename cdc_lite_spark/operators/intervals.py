"""Interval sweep: concurrency over [start, end] intervals.

"How many sessions were open at once" is the classic sequential sweep —
sort all boundaries, walk them with a counter.  The walk is a global
prefix sum, which looks inherently single-threaded; this module computes
it distributed with the standard two-level decomposition:

1. bucket the boundary timestamps by a coarse time unit (hour);
2. running sum WITHIN each bucket (a partitioned window — parallel);
3. prefix-sum the per-bucket TOTALS (one tiny window over O(buckets)
   rows — hours-in-a-year ≈ 8.8k, a driver-trivial sequence even for a
   century of data) and broadcast the per-bucket offsets back.

concurrency(t) = bucket_offset + in-bucket running sum + ends(t), which
equals cumulative_starts(<= t) - cumulative_ends(< t): start-inclusive,
end-inclusive (an interval still counts at its own end instant).

Scale: the fact table never sees a global sort — only its (already
aggregated) boundary stream shuffles, once on t for the per-t counts and
once on bucket for the windows.  The single-partition step touches
O(buckets) rows, not O(intervals).

The reference has no interval operator; this is part of the §2-beyond
training-pipeline tier (cluster occupancy, rate-limit auditing, peak
concurrent-user reporting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def interval_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_us: int = US_PER_HOUR,
    checkpoint: bool = False,
) -> DataFrame:
    """Per-boundary concurrency over ``[start_col, end_col]`` intervals
    (epoch-microsecond BIGINT columns, non-negative).

    Returns one row per distinct boundary timestamp:
    ``(t, starts, ends, concurrency)`` — ``concurrency`` is the number of
    intervals covering instant ``t`` under inclusive-inclusive semantics.
    Between consecutive boundaries concurrency is constant, so this is
    the complete step function.

    The plan consumes ``intervals`` several times (start boundaries, end
    boundaries, bucket totals); exchange reuse is not guaranteed across
    the branches, so a caller whose ``intervals`` is expensive to derive
    (e.g. a sessionization) should pass ``checkpoint=True`` — the input is
    ``localCheckpoint()``-ed once up front and every branch rescans the
    materialized rows instead of re-deriving the source (r7 verdict ask:
    the safe pattern as a switch, not a footnote).  Left off by default:
    for a cheap scan the checkpoint write costs more than the rescans."""
    if checkpoint:
        intervals = intervals.localCheckpoint()
    starts = intervals.select(
        F.col(start_col).alias("t"), F.lit(1).alias("s"), F.lit(0).alias("e")
    )
    ends = intervals.select(
        F.col(end_col).alias("t"), F.lit(0).alias("s"), F.lit(1).alias("e")
    )
    bounds = (
        starts.unionAll(ends)
        .groupBy("t")
        .agg(F.sum("s").alias("starts"), F.sum("e").alias("ends"))
        # `div` truncates toward zero, DuckDB's // floors: identical on the
        # non-negative epoch domain this operator declares
        .withColumn("bucket", F.expr(f"t div {bucket_us}"))
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bounds.withColumn(
        "local_cum", F.sum(F.col("starts") - F.col("ends")).over(w_local)
    )
    totals = bounds.groupBy("bucket").agg(
        F.sum(F.col("starts") - F.col("ends")).alias("tot")
    )
    # exclusive prefix over bucket totals: the only non-partitioned window,
    # and it runs over O(buckets) rows by construction
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("offset")
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        "t",
        "starts",
        "ends",
        (F.col("offset") + F.col("local_cum") + F.col("ends")).alias("concurrency"),
    )
