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
    frame.

    The 3-sigma test is evaluated in EXACT decimal arithmetic by clearing
    denominators: with ``n`` previous points,

        (x - sx/n)² > 9·(sxx/n - (sx/n)²)
        ⟺  (n·x - sx)²  >  9·(n·sxx - sx²)

    so a constant history gives literally 0 > 0 — never flagged — and a
    genuine deviation on a constant history gives lhs > 0 = rhs — always
    flagged.  (A first float formulation subtracted a 6dp-rounded sxx/n
    from a full-precision mean², driving computed variance slightly
    NEGATIVE on constant series and flagging every hour; exact decimals
    remove the failure class, and both engines produce identical bits by
    construction.)

    The explicit casts below keep every decimal product within precision
    38 so NO step can round (Spark silently reduces scale past 38).
    Width budget, valid while |hourly sum| < 1e8 (generous for a per-hour
    value sum; widen every cast together if a deployment exceeds it):
    x (18,6); sx ≤ 24·x → (18,6); x² ≤ 1e16 and sxx ≤ 24·x² ≤ 2.4e17 →
    (30,12); dev = n·x − sx ≤ 2.5e9 → (18,6); n·sxx ≤ 6e18 and sx² ≤
    5.8e18 → var_num (31,12); dev² → (37,12); 9·var_num → (33,12).
    Overflow outside the bound surfaces as NULL/ANSI error, never a wrong
    flag.  The DuckDB twin in queries.py mirrors the same widths (plus
    width-19 casts before squares to force its int128 multiply path)."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-WINDOW_HOURS, -1)
    )
    x = F.col("x").cast("decimal(18,6)")
    based = hourly.select("event_type", "hour", x.alias("x"))
    framed = based.select(
        "event_type",
        "hour",
        "x",
        F.sum("x").over(w).cast("decimal(18,6)").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("decimal(30,12)").alias("sxx"),
        F.count("*").over(w).cast("decimal(2,0)").alias("n_prev"),
    )
    n = F.col("n_prev")
    dev = (n * F.col("x") - F.col("sx")).cast("decimal(18,6)")
    var_num = (
        (n * F.col("sxx")).cast("decimal(33,12)") - F.col("sx") * F.col("sx")
    ).cast("decimal(31,12)")
    return framed.select(
        "event_type",
        "hour",
        F.col("x").cast("double").alias("x"),
        n.cast("long").alias("n_prev"),
        F.when(
            (n >= MIN_PREV)
            & (dev * dev > F.lit(int(Z2)).cast("decimal(1,0)") * var_num),
            1,
        )
        .otherwise(0)
        .alias("anomaly"),
    )


__all__ = ["MIN_PREV", "WINDOW_HOURS", "Z2", "anomaly_flags", "hourly_stats"]
