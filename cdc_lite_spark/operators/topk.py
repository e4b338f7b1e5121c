"""Top-K per group (SURVEY.md §2 G1 generalization)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    k: int,
    descending: bool = True,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number ≤ k per key.

    Scale note: Spark's window TopK is sort-based per key after one shuffle;
    AQE handles skewed keys.  For tiny k over huge groups a two-phase
    partial TopK (per-partition limit, then global) can cut the shuffle —
    Catalyst already applies that rewrite for `rank <= k` filters
    (WindowGroupLimit in the physical plan), so the declarative form below
    IS the optimized form.
    """
    cols = [F.col(c).desc() if descending else F.col(c) for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
