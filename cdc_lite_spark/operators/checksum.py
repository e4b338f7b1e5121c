"""Whole-table fingerprinting (SURVEY.md §2 ops C1-C3).

Reference semantics (/root/reference/pkg/duckdb/duckdb_cdc.go:169-183):
``md5( CAST(count(*) AS VARCHAR) || ',' || CAST(sum(hash(row_repr)) AS VARCHAR) )``
where ``row_repr`` is every column ``COALESCE(CAST(c AS VARCHAR),'')`` joined
by ','.  The digest is *order-insensitive* (sum of per-row hashes commutes),
so two table states compare equal iff their multisets of canonical rows match
— exactly what change detection needs.

Scale shape: the whole fingerprint is one partial-aggregable expression.
Spark computes per-partition (count, sum) pairs map-side and shuffles only
32 tiny partial rows to one reducer — O(rows) scan, O(partitions) shuffle,
no wide state.  At 100 TB this is a full-scan-bounded operation by
definition (the reference pays the same); the incremental refinement is
:func:`partition_checksums`, which fingerprints at partition granularity so
an unchanged partition is never re-emitted.

Sum overflow: per-row hashes are 60-bit; Spark's sum over LongType wraps on
overflow while DuckDB promotes to HUGEINT, so we sum as DECIMAL(38,0) in
both engines — exact and identical up to ~10^18 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.functions.hashes import (
    canonical_row_sql,
    canonical_row_string,
    portable_hash64,
    portable_hash64_sql,
)


def _cols_with_types(df: DataFrame, cols: list[str] | None) -> list[tuple[str, str]]:
    wanted = cols or df.columns
    types = dict(df.dtypes)
    return [(c, types[c]) for c in wanted]


def row_hash(df: DataFrame, cols: list[str] | None = None, fast: bool = False) -> Column:
    """Per-row 60-bit hash over the canonical row string (op C2)."""
    return portable_hash64(canonical_row_string(_cols_with_types(df, cols)), fast=fast)


def table_checksum(df: DataFrame, cols: list[str] | None = None, fast: bool = False) -> DataFrame:
    """One-row DataFrame ``[checksum: string]`` — the C3 fingerprint.

    Mirrors duckdb_cdc.go:175-179 with the engine-portable hash.
    """
    return (
        df.select(row_hash(df, cols, fast=fast).alias("h"))
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.count("*").cast("string"),
                    F.coalesce(
                        F.sum(F.col("h").cast("decimal(38,0)")).cast("string"), F.lit("")
                    ),
                )
            ).alias("checksum")
        )
    )


def multi_table_checksum(dfs: dict[str, DataFrame], fast: bool = False) -> DataFrame:
    """Fingerprints for several tables in ONE job — ``[table_name, checksum]``.

    Unioning six single-row aggregates (one per table) schedules 2 stages per
    table (partial + final agg); at local scale the per-stage overhead, not
    the hash arithmetic, dominates the tick (bench r03: 6-table union 3.4 s
    cold vs 2.0 s fused).  Instead: tag each table's *row-level* hashes with
    the table name, union those (narrow — all scans share one stage), and run
    a single ``groupBy(table_name)`` whose partial aggregation reduces every
    partition to one (count, sum) pair per table.  Same checksum values, one
    shuffle of ≤ tables×partitions tiny rows — the per-tick detect pass of
    duckdb_cdc.go:114-120 as one job.
    """
    parts = []
    for name, df in dfs.items():
        parts.append(
            df.select(F.lit(name).alias("table_name"), row_hash(df, fast=fast).alias("h"))
        )
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.unionByName(p)
    return rows.groupBy("table_name").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.count("*").cast("string"),
                F.coalesce(
                    F.sum(F.col("h").cast("decimal(38,0)")).cast("string"), F.lit("")
                ),
            )
        ).alias("checksum")
    )


def table_checksum_value(df: DataFrame, cols: list[str] | None = None, fast: bool = True) -> str:
    """Collect the fingerprint as a plain string (engine-internal use —
    defaults to the fast xxhash64 family, no oracle parity needed)."""
    return table_checksum(df, cols, fast=fast).collect()[0]["checksum"]


def table_checksum_sql(table: str, cols_with_types: list[tuple[str, str]]) -> str:
    """DuckDB oracle SQL computing the identical fingerprint."""
    row_repr = canonical_row_sql(cols_with_types)
    h = portable_hash64_sql(row_repr)
    return (
        "SELECT md5(concat_ws(',', CAST(count(*) AS VARCHAR), "
        f"COALESCE(CAST(sum(CAST({h} AS DECIMAL(38,0))) AS VARCHAR), ''))) AS checksum "
        f"FROM {table}"
    )


def partition_checksums(
    df: DataFrame, part_col: str, cols: list[str] | None = None, fast: bool = False
) -> DataFrame:
    """Fingerprint per partition-key (``[part, n_rows, checksum]``).

    The scale-path refinement of C3 (SURVEY.md §4): with per-partition
    digests, a downstream differ re-reads/re-emits only drifted partitions —
    partition pruning on write.  Plain hash-aggregate: map-side partial,
    one shuffle keyed by ``part_col``.
    """
    value_cols = [c for c in (cols or df.columns) if c != part_col]
    return (
        df.select(F.col(part_col).alias("part"), row_hash(df, value_cols, fast=fast).alias("h"))
        .groupBy("part")
        .agg(
            F.count("*").alias("n_rows"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.count("*").cast("string"),
                    F.sum(F.col("h").cast("decimal(38,0)")).cast("string"),
                )
            ).alias("checksum"),
        )
    )
