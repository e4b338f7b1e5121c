"""Rolling z-score anomaly detection over keyed hourly series — the batch
operator behind the ``rolling_anomaly_flags`` query and the maintained
state the streaming twin (streaming/anomaly_stream.py) folds into.

The two-layer split is the point: ``hourly_stats`` is the only pass that
touches fact volume (a partial-aggregable hash-agg, DECIMAL-exact so any
partitioning/arrival order produces identical sums), and ``anomaly_flags``
runs over the |keys|×|hours| aggregate — tiny at any corpus size — with a
trailing-24h frame whose moments are DECIMAL window sums.  The sqrt-free
3-sigma test ``(x-μ)² > 9σ²`` avoids the one libm call that could diverge
between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: trailing window length (hours) and the minimum history to judge against
WINDOW_HOURS = 24
MIN_PREV = 8
#: z-threshold, squared form (3 sigma)
Z2 = 9.0


def hourly_stats(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, hour, x): per-key hourly value sums as DECIMAL(18,6) — exact,
    commutative, mergeable (the streaming state folds batches with a plain
    sum over this same shape)."""
    return events.groupBy(
        F.col(key_col).alias("event_type"),
        F.date_trunc("hour", ts_col).alias("hour"),
    ).agg(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("x"))


def anomaly_flags(hourly: DataFrame) -> DataFrame:
    """Trailing-24h rolling z-score flags over a ``hourly_stats``-shaped
    frame.  Deterministic: frame sums are DECIMAL, the variance/deviation
    comparison runs on identical double operands in any engine."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-WINDOW_HOURS, -1)
    )
    framed = hourly.select(
        "event_type",
        "hour",
        "x",
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.count("*").over(w).alias("n_prev"),
    )
    xd = F.col("x").cast("double")
    mean = F.col("sx").cast("double") / F.col("n_prev")
    var = F.col("sxx").cast("double") / F.col("n_prev") - mean * mean
    dev2 = (xd - mean) * (xd - mean)
    return framed.select(
        "event_type",
        "hour",
        xd.alias("x"),
        F.col("n_prev").cast("long").alias("n_prev"),
        F.when((F.col("n_prev") >= MIN_PREV) & (dev2 > F.lit(Z2) * var), 1)
        .otherwise(0)
        .alias("anomaly"),
    )


__all__ = ["MIN_PREV", "WINDOW_HOURS", "Z2", "anomaly_flags", "hourly_stats"]
