"""Relational snapshot diff — the CDC core (SURVEY.md §2 F1-F3).

The reference detects change as ``lastChecksum != currentChecksum`` and then
re-emits the *whole table* as SNAPSHOT records
(/root/reference/pkg/duckdb/duckdb_cdc.go:197-208, :248).  This engine keeps
that mode (engine.py) and adds the strictly-stronger row-level form: a single
full-outer join of previous vs current snapshot keyed by primary key,
classifying every key as INSERT / UPDATE / DELETE.

Scale shape: one shuffle on the key columns for each side (sort-merge join);
with AQE skew-split enabled a hot key fragments automatically.  The value
comparison is a 60-bit row hash computed *before* the join, so the shuffle
carries (keys, hash) plus payload — and ``changed_only=True`` keeps the
payload columns pruned until after classification.  If one snapshot is small
(dimension tables), pass ``broadcast_prev=True`` to skip its shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.envelope import DELETE, INSERT, UPDATE
from cdc_lite_spark.operators.checksum import row_hash


def snapshot_diff(
    prev: DataFrame,
    cur: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    broadcast_prev: bool = False,
    fast_hash: bool = False,
    null_safe: bool = True,
    include_prev: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns ``keys... , operation, <current non-key cols (null for DELETE)>``;
    with ``include_prev=True`` also the previous values as ``prev_<col>``
    (what incremental aggregate maintenance needs — apply +new −old).
    Unchanged keys are dropped (the reference emits nothing when the
    fingerprint is stable — same contract, row granularity).

    ``null_safe=False`` uses plain key equality: required to preserve
    bucketed tables' output partitioning (null-safe equality wraps the join
    keys, forcing a shuffle even over co-bucketed snapshots) — safe whenever
    the keys are genuine primary keys (non-null).
    """
    non_key = [c for c in cur.columns if c not in keys]
    cmp_prev = compare_cols or [c for c in prev.columns if c not in keys]
    cmp_cur = compare_cols or non_key

    prev_payload = (
        [F.col(c).alias(f"__prev_{c}") for c in prev.columns if c not in keys]
        if include_prev
        else []
    )
    p = prev.select(
        *[F.col(k).alias(f"__pk_{k}") for k in keys],
        *prev_payload,
        row_hash(prev, cmp_prev, fast=fast_hash).alias("__prev_hash"),
        F.lit(1).alias("__prev_present"),
    )
    if broadcast_prev:
        p = F.broadcast(p)
    c = cur.select(
        *keys,
        *non_key,
        row_hash(cur, cmp_cur, fast=fast_hash).alias("__cur_hash"),
        F.lit(1).alias("__cur_present"),
    )

    # null-safe equality: a null key must match itself across snapshots —
    # plain `==` never matches null, which would misclassify a stable
    # null-key row as a simultaneous INSERT + DELETE
    if null_safe:
        cond = [c[k].eqNullSafe(p[f"__pk_{k}"]) for k in keys]
    else:
        cond = [c[k] == p[f"__pk_{k}"] for k in keys]
    joined = c.join(p, cond, "full_outer")

    # presence markers, not key-null checks: a legitimately-null key row
    # that matched via eqNullSafe still has null key columns on both sides
    op = (
        F.when(F.col("__prev_present").isNull(), F.lit(INSERT))
        .when(F.col("__cur_present").isNull(), F.lit(DELETE))
        .when(F.col("__prev_hash") != F.col("__cur_hash"), F.lit(UPDATE))
        .otherwise(F.lit(None))
    )

    out_keys = [
        F.coalesce(c[k], p[f"__pk_{k}"]).alias(k) for k in keys
    ]
    prev_out = (
        [F.col(f"__prev_{x}").alias(f"prev_{x}") for x in prev.columns if x not in keys]
        if include_prev
        else []
    )
    return (
        joined.select(*out_keys, op.alias("operation"), *[c[x] for x in non_key], *prev_out)
        .filter(F.col("operation").isNotNull())
    )


def inserted_keys(prev: DataFrame, cur: DataFrame, keys: list[str]) -> DataFrame:
    """Op F1 — keys in current but not previous (left-anti join)."""
    return cur.join(prev.select(*keys), keys, "left_anti")


def persisted_keys(prev: DataFrame, cur: DataFrame, keys: list[str]) -> DataFrame:
    """Op F2 — keys present in both snapshots (left-semi join)."""
    return cur.join(prev.select(*keys), keys, "left_semi")
