"""Latest-per-key and change-flag windows (SURVEY.md §2 D1, G1-G3).

The reference's "latest checksum for a table" is
``ORDER BY timestamp DESC LIMIT 1`` per table
(/root/reference/pkg/duckdb/duckdb_cdc.go:190-195); its change predicate is a
Go-side comparison against that remembered value (:197).  Relationally these
are a row_number window and a lag window.

Scale shape: both are one shuffle on the partition keys.  For
latest-per-key over massive logs, prefer ``max_by``-style aggregation
(``latest_per_key(..., via_agg=True)``) — a hash aggregate with map-side
partials beats a full window sort when only the top-1 row is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: list[str | Column], descending: bool) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if descending else cols


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    descending: bool = True,
    via_agg: bool = False,
) -> DataFrame:
    """Top-1 row per key (generalized D1 → G1).

    ``via_agg=True`` uses max_by over a struct of the ordering columns —
    partial-aggregable, no per-key sort, the scale path when keys are many
    and rows-per-key are large.
    """
    if via_agg:
        payload = F.struct(*[F.col(c) for c in df.columns if c not in keys])
        agg_fn = F.max_by if descending else F.min_by
        ordkey = F.struct(*[F.col(c) for c in order_by])
        out = df.groupBy(*keys).agg(agg_fn(payload, ordkey).alias("__top"))
        return out.select(*keys, *[F.col(f"__top.{c}") for c in df.columns if c not in keys])
    w = Window.partitionBy(*keys).orderBy(*_order_cols(list(order_by), descending))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def with_change_flag(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    value_col: str,
    flag_col: str = "changed",
) -> DataFrame:
    """Op G2 — the reference's ``last != current`` predicate
    (duckdb_cdc.go:197) as a lag window: flag rows whose value differs from
    the previous observation of the same key (first sight counts as change,
    matching the reference's ErrNoRows branch)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    prev = F.lag(value_col).over(w)
    return df.withColumn(
        flag_col,
        F.when(prev.isNull(), F.lit(True)).otherwise(F.col(value_col) != prev),
    )


def running_agg(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    value_col: str,
    out_prefix: str = "running",
) -> DataFrame:
    """Op G3 — frame-spec running count/sum per key over time."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(f"{out_prefix}_count", F.count("*").over(w)).withColumn(
        f"{out_prefix}_sum", F.sum(value_col).over(w)
    )
