"""Skew-handling utilities.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains necessary when (a) the skewed side feeds
an aggregation, not a join, or (b) a single key exceeds what one task can
hold even after AQE splits (AQE splits partitions, not keys).

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R sub-keys: each (key, salt) partition holds 1/R of
the hot key's rows.  ``two_phase_agg`` does partial aggregation on salted
keys then re-aggregates — the classic combiner pattern made explicit for
aggregates Catalyst can't partial-ize (e.g. exact collect-based ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic row-scatter salt (hash of all columns, not rand() —
    reproducible runs, no RNG in the plan)."""
    h = F.abs(F.xxhash64(*[F.col(c) for c in df.columns]))
    return df.withColumn(salt_col, (h % n_salts).cast("int"))


def replicate(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Cross the (small) side with salt values 0..n-1 so every salted
    partition of the big side finds its match."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    return df.withColumn(salt_col, salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    n_salts times.  Shuffle keys become (keys…, salt): a key holding p% of
    all rows spreads over n_salts tasks instead of one straggler."""
    b = with_salt(big, n_salts)
    s = replicate(small, n_salts)
    return b.join(s, [*keys, "__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    agg_exprs: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
) -> DataFrame:
    """Explicit partial/final aggregation over salted keys.

    ``agg_exprs``: name → (partial_expr, final_expr-over-partial-column).
    e.g. ``{"n": (F.count("*"), F.sum("n")), "total": (F.sum("x"), F.sum("total"))}``
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in agg_exprs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in agg_exprs.items()]
    )
