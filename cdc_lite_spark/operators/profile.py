"""ANALYZE-style table profiling: per-column statistics in one pass
(SURVEY.md §2c family, generalized — the stats a catalog, a cost-based
optimizer, or a data-quality monitor reads).

One aggregation computes every column's row/null/distinct/min/max metrics
simultaneously (a single wide agg row), then a zero-shuffle unpivot turns
it into the long (column, metric…) form.  Scale shape: ONE scan + ONE
constant-size exchange regardless of column count or table size — the
classic anti-pattern this replaces is one pass per column.

Distinct counts come twice: the exact count (oracle surface — at 100 TB
you would drop it and keep only the sketch) and the HLL estimate whose
agreement the ``ndv_ok`` flag asserts, same discipline as
``sketch_distinct_rollup``/``approx_quantiles_checked``: engines cannot
compare sketch internals, so the registered query compares exact values
plus a deterministic within-tolerance flag that trips the driver's hash
check if the sketch ever drifts.

Numeric (and epoch-encoded temporal) min/max surface as DOUBLE columns,
string min/max as STRING — one row per column with the inapplicable pair
null, so the long format stays strongly typed in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_lite_spark.functions.timeutils import epoch_us

#: relative tolerance for the HLL-vs-exact distinct agreement flag; the
#: sketch runs at rsd=0.02 (rsd=0.01 crosses Spark's HLL++ into a
#: pathologically slow high-precision mode — measured 10s/column vs 0.6s),
#: so 0.08 is a ~4-sigma bound: deterministic for a given dataset, loose
#: enough to hold across scale factors
NDV_TOLERANCE = 0.08
NDV_RSD = 0.02


def _numeric(col: str, dt: T.DataType) -> Column | None:
    """Numeric view of a column for min/max, or None for strings."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return epoch_us(col).cast("double")
    if isinstance(dt, T.NumericType) or isinstance(dt, T.BooleanType):
        return F.col(col).cast("double")
    return None


def column_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct, ndv_ok,
    min_num, max_num, min_str, max_str).

    Two aggregation passes, deliberately: Spark plans a MIX of DISTINCT
    aggregates with any imperative/non-distinct ones in one Aggregate via
    an Expand whose cost explodes combinatorially (measured: 6 columns'
    mixed profile 106 s at sf0.1 vs ~3 s split — each pass alone is
    cheap; the mix is not).  Pass 1 holds every NON-distinct aggregate
    (counts, min/max, HLL sketches — no Expand); pass 2 holds only the
    exact countDistincts (its x(cols+1) Expand is inherent to exact
    multi-column NDV).  Each produces one row, joined back with a
    broadcast cross join.  At 100 TB you drop the exact-distinct pass
    entirely (it exists as the sketch's verification twin) and the
    profile is pass 1 alone — one scan."""
    names = cols or [f.name for f in df.schema.fields]
    types = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        num = _numeric(c, types[c])
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.approx_count_distinct(F.col(c), NDV_RSD).alias(f"{c}__ad"),
            (F.min(num) if num is not None else F.lit(None).cast("double")).alias(
                f"{c}__mn"
            ),
            (F.max(num) if num is not None else F.lit(None).cast("double")).alias(
                f"{c}__mx"
            ),
            (
                F.min(F.col(c).cast("string"))
                if num is None
                else F.lit(None).cast("string")
            ).alias(f"{c}__ms"),
            (
                F.max(F.col(c).cast("string"))
                if num is None
                else F.lit(None).cast("string")
            ).alias(f"{c}__xs"),
        ]
    exact_nd_aggs = [F.countDistinct(F.col(c)).alias(f"{c}__nd") for c in names]
    wide = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*exact_nd_aggs)))
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (
                F.abs(
                    F.col(f"{c}__ad").cast("double") - F.col(f"{c}__nd").cast("double")
                )
                <= F.greatest(
                    F.lit(1.0), F.lit(NDV_TOLERANCE) * F.col(f"{c}__nd").cast("double")
                )
            )
            .cast("int")
            .alias("ndv_ok"),
            F.col(f"{c}__mn").alias("min_num"),
            F.col(f"{c}__mx").alias("max_num"),
            F.col(f"{c}__ms").alias("min_str"),
            F.col(f"{c}__xs").alias("max_str"),
        )
        for c in names
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
