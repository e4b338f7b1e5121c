"""Mergeable, incrementally-maintainable quantile state (histogram buckets).

Completes the maintained-state family: sums/counts fold exactly
(``operators/incremental.py``), distinct counts fold via HLL sketches
(``operators/sketches.py``) — this module does the same for QUANTILES.
The reference recomputes everything per poll (duckdb_cdc.go:175-183); a
percentile over 100 TB cannot be recomputed per tick, and Spark's
``percentile_approx`` state is neither persistable nor retractable.

The state is a per-(key, bucket) row count over FIXED bucket edges:

    bucket(v) = clamp(floor((v - lo) / w), 0, bins-1),  w = (hi - lo)/bins

Fixed edges are the design point, not a shortcut: a maintained histogram
must keep its buckets stable across ticks (data-derived edges would shift
when new data lands, invalidating every previously persisted count), and
out-of-range values clamp into the end buckets rather than failing.
Because bucket counts are exact integers, the state is

- **exactly mergeable**: state(A) + state(B) = state(A ∪ B), by addition;
- **exactly retractable**: change records fold as +1 on the current
  value's bucket and −1 on the previous value's bucket, so the maintained
  state is bit-equal to a from-scratch rebuild — the estimation error
  lives ONLY in the final interpolation, never accumulates per tick.

Quantile estimates interpolate the cumulative counts: for target rank
``q·n``, the first bucket whose running count reaches it contributes

    est = lo + w · (bucket + (q·n − cum_before) / bucket_count)

All arithmetic is binary64 over literals and exact integers, so DuckDB
reproduces estimates bit-for-bit (driver-checked by
``incremental_quantile_maintenance``).

100 TB shape: the state build is one scan + one partial-aggregable
shuffle keyed on (key, bucket) — map-side combine collapses each task to
≤ |keys|·bins partial rows regardless of input size.  A tick's fold
touches |changes| rows; quantile evaluation runs entirely on the state
table (≤ |keys|·bins rows), never the facts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BINS = 64


def _check_edges(lo: float, hi: float, bins: int) -> None:
    if not bins > 0:
        raise ValueError(f"bins must be positive, got {bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got lo={lo}, hi={hi}")


def _countable(value: Column) -> Column:
    """Values that enter the histogram: non-NULL, non-NaN (the double cast
    makes isnan total over any numeric dtype)."""
    return value.isNotNull() & ~F.isnan(value.cast("double"))


def _bucket(value: Column, lo: float, hi: float, bins: int) -> Column:
    # clamp the LONG floor result BEFORE the int cast: extreme out-of-range
    # values overflow int32, and a wrapped/saturated cast would land a huge
    # HIGH outlier in the LOWEST bucket instead of clamping to the top one
    w = (hi - lo) / bins
    raw = F.floor((value.cast("double") - F.lit(float(lo))) / F.lit(w))
    return (
        F.least(F.lit(bins - 1).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), raw))
        .cast("int")
    )


def histogram_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = DEFAULT_BINS,
) -> DataFrame:
    """Per-(key, bucket) row counts — the persistable quantile state.
    NULL and NaN values contribute nothing (NULL matches COUNT(col)
    semantics; NaN has no place on the value axis — floor(NaN) casts to
    long 0, which would silently count it in the LOWEST bucket)."""
    _check_edges(lo, hi, bins)
    return (
        df.filter(_countable(F.col(value_col)))
        .groupBy(*keys, _bucket(F.col(value_col), lo, hi, bins).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("bkt_count"))
    )


def merge_histogram_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """state(A) + state(B) = state(A ∪ B): bucket counts add.  O(|state|)."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "bucket")
        .agg(F.sum("bkt_count").alias("bkt_count"))
    )


def apply_histogram_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = DEFAULT_BINS,
) -> DataFrame:
    """Fold diff records (``include_prev=True`` shape) into the state:
    INSERT adds the current value's bucket, DELETE retracts the previous
    value's bucket, UPDATE does both (under the PREV-side key for the
    retraction, so rows moving across groups or buckets stay exact).
    Buckets whose count reaches zero drop out.  Touches |changes| rows.

    ``value_col`` may be one of the diff's KEY columns (e.g. counting the
    PK per group): the diff emits no ``prev_`` twin for keys because a
    key cannot change — the current column doubles as the previous value
    (DELETE rows carry coalesced keys)."""
    _check_edges(lo, hi, bins)

    def _prev(c: str) -> Column:
        return F.col(f"prev_{c}") if f"prev_{c}" in changes.columns else F.col(c)

    adds = (
        changes.filter(
            F.col("operation").isin("INSERT", "UPDATE")
            & _countable(F.col(value_col))
        )
        .select(
            *[F.col(k).alias(k) for k in keys],
            _bucket(F.col(value_col), lo, hi, bins).alias("bucket"),
            F.lit(1).alias("__d"),
        )
    )
    retracts = (
        changes.filter(
            F.col("operation").isin("DELETE", "UPDATE")
            & _countable(_prev(value_col))
        )
        .select(
            *[_prev(k).alias(k) for k in keys],
            _bucket(_prev(value_col), lo, hi, bins).alias("bucket"),
            F.lit(-1).alias("__d"),
        )
    )
    delta = (
        adds.unionByName(retracts)
        .groupBy(*keys, "bucket")
        .agg(F.sum("__d").alias("d"))
    )
    # null-safe merge: a NULL group key must stay ONE group (a plain
    # column-list join never matches NULL==NULL — r8 review)
    from cdc_lite_spark.operators.incremental import nullsafe_merge

    joined, key_cols = nullsafe_merge(state, delta, [*keys, "bucket"])
    return (
        joined.select(
            *key_cols,
            (
                F.coalesce("bkt_count", F.lit(0)) + F.coalesce("d", F.lit(0))
            ).alias("bkt_count"),
        )
        .filter(F.col("bkt_count") > 0)
    )


def quantiles_from_histogram(
    state: DataFrame,
    keys: list[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    bins: int = DEFAULT_BINS,
) -> DataFrame:
    """Per-key quantile estimates from the state alone (facts untouched).

    For each q: target rank ``q·n``; the first bucket whose cumulative
    count reaches the target interpolates linearly inside its width.
    Exact-arithmetic inputs (integer counts, literal edges) make the
    binary64 result engine-portable.  Cost: two windows over ≤ bins rows
    per key + a bins×|qs| explode of the state — never a fact scan."""
    _check_edges(lo, hi, bins)
    w = (hi - lo) / bins
    wk = Window.partitionBy(*keys)
    wcum = wk.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    st = (
        state.withColumn("total", F.sum("bkt_count").over(wk))
        .withColumn("cum", F.sum("bkt_count").over(wcum))
        .withColumn("cum_before", (F.col("cum") - F.col("bkt_count")))
    )
    cand = st.select(
        *keys,
        "bucket",
        "bkt_count",
        "cum",
        "cum_before",
        "total",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).filter(F.col("cum") >= F.col("q") * F.col("total"))
    first = cand.groupBy(*keys, "q").agg(
        F.min_by(
            F.struct("bucket", "cum_before", "bkt_count", "total"), F.col("bucket")
        ).alias("b")
    )
    est = F.lit(float(lo)) + F.lit(w) * (
        F.col("b.bucket")
        + (F.col("q") * F.col("b.total") - F.col("b.cum_before"))
        / F.col("b.bkt_count")
    )
    return first.select(*keys, "q", F.round(est, 6).alias("quantile_est"))
