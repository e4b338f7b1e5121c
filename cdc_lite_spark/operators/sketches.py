"""Mergeable distinct-count sketches as reusable state (SURVEY.md §2c C5
scale path).

The reference recomputes COUNT(*) / checksums per poll over the whole table
(duckdb_cdc.go:175-183); its distinct-style questions rescan everything.
At 100 TB the scale-correct form of "how many distinct users this month /
quarter / ever" is a *mergeable sketch kept as state*: build one tiny
HyperLogLog sketch per partition-grain (e.g. per day), persist it, and
answer any rollup by merging sketches — never by rescanning the facts.

Spark 4 ships Apache DataSketches HLL natively (`hll_sketch_agg`,
`hll_union_agg`, `hll_sketch_estimate`), so the whole path is JVM-side
built-ins: no UDF, no driver collect.  Key properties this module leans on
(and tests pin):

- **Mergeability is lossless**: the sketch is a register-max structure, so
  union(sketch(A), sketch(B)) is THE SAME sketch as sketch(A ∪ B) — the
  rollup estimate equals the from-scratch estimate exactly, and merge order
  never matters.  That is what makes per-day state + incremental folds
  correct, not just approximately correct.
- **Bounded size**: a sketch is ≤ ~2^lgk registers regardless of input
  cardinality — per-grain state stays KB-sized at any data scale, and the
  rollup exchange carries |grains| sketches, not |rows| values.

100 TB shape: `distinct_sketch_state` is one partial-aggregable groupBy
(map-side sketches merge before the exchange, so the shuffle carries one
sketch per grain per task); `rollup_estimates` runs entirely on the tiny
state table.  A new day of data touches ONE grain — append its sketch and
every containing rollup updates by re-merging state, cost O(|grains|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2 of the register count — 12 gives ~1.6 KB sketches with ~1.6% RSE,
#: the DataSketches default tradeoff for state that is stored per grain.
DEFAULT_LGK = 12


def _sketchable(df: DataFrame, value_col: str):
    """``hll_sketch_agg`` accepts only INT/BIGINT/STRING/BINARY — widen
    narrow ints and render every other atomic type to its string form.
    The cast is injective within a column's type (DECIMAL keeps its scale,
    DATE/TIMESTAMP render canonically), so distinctness is preserved;
    NULLs stay NULL and are skipped by the sketch either way."""
    t = dict(df.dtypes).get(value_col)
    if t in ("int", "bigint", "string", "binary"):
        return F.col(value_col)
    if t in ("tinyint", "smallint"):
        return F.col(value_col).cast("int")
    return F.col(value_col).cast("string")


def distinct_sketch_state(
    df: DataFrame,
    grain_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch (binary) + exact row count per grain.

    This is the state table a CDC/analytics engine persists: columns are
    the grain keys, `sketch` (binary, bounded size), and `n_rows` (exact,
    for observability).  Build cost is one scan + one partial-aggregable
    shuffle keyed on the grain.  Any atomic value type is accepted (see
    :func:`_sketchable`); estimates are only comparable between states
    built over the same column type, which versioned state guarantees.
    """
    return df.groupBy(*grain_cols).agg(
        F.hll_sketch_agg(_sketchable(df, value_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_estimates(
    state: DataFrame,
    rollup_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimates at a coarser grain, by merging sketches.

    `rollup_cols` must be a subset of the state's grain columns; pass
    ``None`` (or ``[]``) for the global rollup.  Runs entirely on the state
    table — the base facts are never touched.
    """
    cols = list(rollup_cols or [])
    grouped = state.groupBy(*cols) if cols else state.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "distinct_estimate"
        ),
        F.sum("n_rows").alias("n_rows"),
    )


def merge_states(a: DataFrame, b: DataFrame, grain_cols: list[str]) -> DataFrame:
    """Fold a new batch's sketch state into existing state (incremental
    maintenance): grains present in both merge their sketches; grains in
    only one side pass through.  Cost is O(|state|), independent of how
    many base rows either side summarizes."""
    return (
        a.unionByName(b)
        .groupBy(*grain_cols)
        .agg(
            F.hll_union_agg(F.col("sketch")).alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
