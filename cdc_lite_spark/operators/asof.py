"""As-of and range joins — time-series operators Spark lacks natively.

As-of join ("for each left row, the latest right row at or before its
timestamp, per key") is implemented with the **union + last_value window**
formulation rather than a per-row lookup join:

1. tag both sides, union them on (key, ts);
2. per key ordered by ts, ``last_value(right_cols, ignoreNulls)`` carries
   the most recent right-side values forward;
3. keep left rows.

Scale shape: ONE shuffle on the key (the window partition), total work
O((|L|+|R|) log per-key-run) — versus a naive theta-join's O(|L|·|R|)
per key.  This is the standard large-scale formulation (same idea as
merge_asof, expressed relationally so Catalyst/Tungsten run it).

Range join (value-in-interval) bucketizes the range key so the join is an
equi-join on the bucket plus a residual filter — again avoiding the
theta-join blowup, at the cost of duplicating interval rows per overlapped
bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row: the latest right row with ``right.ts <= left.ts``
    matching on ``keys``.  Right columns arrive suffixed; rows with no
    earlier right match get nulls (left join semantics, matching DuckDB's
    ``ASOF LEFT JOIN``)."""
    right_cols = right_cols or [c for c in right.columns if c not in keys and c != ts_col]

    l_tagged = left.withColumn("__side", F.lit(1))
    r_tagged = right.select(
        *keys, ts_col, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("__side", F.lit(0))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (__side 0 < 1)
    # so an exactly-simultaneous right row IS visible to the left row —
    # DuckDB ASOF (<=) semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join rows to intervals containing their value ([lo, hi) semantics).

    Intervals explode into every bucket they overlap; the join is then an
    equi-join on the bucket with a residual range filter.  Choose
    ``bucket_width`` near the median interval width so duplication stays
    O(1) per interval.
    """
    lb = F.floor(F.col(value_col) / bucket_width)
    l_b = left.withColumn("__bucket", lb.cast("long"))

    span = F.sequence(
        F.floor(F.col(lo_col) / bucket_width).cast("long"),
        F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
    )
    i_b = intervals.withColumn("__bucket", F.explode(span))

    return (
        l_b.join(i_b, "__bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
