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


def _eval_both_images(changes: DataFrame, exprs: "dict[str, str]") -> DataFrame:
    """Evaluate SQL expressions against BOTH row images of diff records:
    adds ``__cur_<alias>`` (current columns) and ``__prev_<alias>``
    (``prev_`` twins where they exist; diff-key columns have no twin
    because a key cannot change) for every ``alias -> sql`` entry — via
    two narrow projections (positional stash, rebind prev values under the
    data-column names, evaluate, restore): zero shuffles, zero UDFs.
    Shared by :func:`filter_diff` and :func:`derive_diff`."""
    cols = changes.columns
    data_cols = [c for c in cols if c != "operation" and not c.startswith("prev_")]
    has_prev = {c for c in data_cols if f"prev_{c}" in cols}

    step = changes.select(
        "*", *[F.expr(sql).alias(f"__cur_{a}") for a, sql in exprs.items()]
    )
    stashed = step.columns
    prev_env = step.select(
        *[F.col(f"`{c}`").alias(f"__o{i}") for i, c in enumerate(stashed)],
        *[
            (F.col(f"`prev_{c}`") if c in has_prev else F.col(f"`{c}`")).alias(c)
            for c in data_cols
        ],
    )
    return prev_env.select(
        *[F.col(f"__o{i}").alias(c) for i, c in enumerate(stashed)],
        *[F.expr(sql).alias(f"__prev_{a}") for a, sql in exprs.items()],
    )


def filter_diff(changes: DataFrame, predicate: str) -> DataFrame:
    """Diff records of the FILTERED relation σ_pred(T), derived from the
    diff records of T — what lets a maintained view aggregate a predicate
    subset of a table while still folding O(delta) per tick.

    A filter commutes with the snapshot diff as long as ``predicate``
    depends only on the row's own columns, but each change record must be
    re-classified against both row images:

    =========  ========  ========  =================================
    operation  prev ok?  cur ok?   emitted for the filtered relation
    =========  ========  ========  =================================
    INSERT        —       yes      INSERT (as-is)
    INSERT        —       no       (dropped)
    DELETE       yes       —       DELETE (as-is)
    DELETE       no        —       (dropped)
    UPDATE       yes      yes      UPDATE (as-is)
    UPDATE       no       yes      INSERT of the new image (prev_ nulled)
    UPDATE       yes      no       DELETE of the old image (cur nulled)
    UPDATE       no       no       (dropped)
    =========  ========  ========  =================================

    Input and output are both the ``snapshot_diff(include_prev=True)``
    shape, so every existing fold (``apply_delta``, histogram/moments/
    min_max/sketch folds, the retraction probes) consumes the result
    unchanged — an UPDATE that crosses the predicate boundary correctly
    becomes an INSERT into / DELETE from the view's world.

    NULL predicate results count as false (SQL WHERE semantics).  The
    predicate is evaluated twice per record — once against the current
    columns, once against the previous row image (``prev_`` twins where
    they exist; diff-key columns have no twin because a key cannot
    change) — via two narrow projections: zero shuffles, zero UDFs.
    """
    cols = changes.columns
    data_cols = [c for c in cols if c != "operation" and not c.startswith("prev_")]
    has_prev = {c for c in data_cols if f"prev_{c}" in cols}

    def _ok(c):
        return F.coalesce(F.col(c).cast("boolean"), F.lit(False))

    flagged = _eval_both_images(changes, {"ok": predicate}).withColumns(
        {"__cur_ok": _ok("__cur_ok"), "__prev_ok": _ok("__prev_ok")}
    )

    ins = F.col("operation") == INSERT
    dele = F.col("operation") == DELETE
    upd = F.col("operation") == UPDATE
    entering = upd & F.col("__cur_ok") & ~F.col("__prev_ok")
    leaving = upd & ~F.col("__cur_ok") & F.col("__prev_ok")
    kept = (
        (ins & F.col("__cur_ok"))
        | (dele & F.col("__prev_ok"))
        | (upd & F.col("__cur_ok") & F.col("__prev_ok"))
        | entering
        | leaving
    )

    def _shape(c: str):
        if c == "operation":
            return (
                F.when(entering, F.lit(INSERT))
                .when(leaving, F.lit(DELETE))
                .otherwise(F.col("operation"))
                .alias(c)
            )
        if c.startswith("prev_"):
            # an UPDATE promoted to INSERT has no previous image in the view
            return F.when(entering, F.lit(None)).otherwise(F.col(f"`{c}`")).alias(c)
        if c in has_prev:
            # an UPDATE demoted to DELETE nulls the current payload columns
            # (keys keep their values — snapshot_diff's DELETE shape)
            return F.when(leaving, F.lit(None)).otherwise(F.col(f"`{c}`")).alias(c)
        return F.col(f"`{c}`")

    return flagged.filter(kept).select(*[_shape(c) for c in cols])


def derive_diff(changes: DataFrame, derive: "dict[str, str]") -> DataFrame:
    """Diff records EXTENDED with derived columns, evaluated against both
    row images — what lets a maintained view group or aggregate by an
    EXPRESSION of the row (``{"revenue": "l_extendedprice*(1-l_discount)"}``,
    ``{"hour": "date_trunc('hour', ts)"}``) while folding O(delta).

    Each ``name -> sql`` entry adds ``name`` (from the current image, NULL
    on DELETE rows — the diff contract for payload columns) and
    ``prev_name`` (from the previous image, NULL on INSERT rows), so the
    output is still the ``snapshot_diff(include_prev=True)`` shape and
    every fold and retraction probe consumes derived columns exactly like
    stored ones.  Expressions must be row-local and deterministic (the
    same discipline as :func:`filter_diff` predicates); names must not
    collide with existing columns.  Two narrow projections — no shuffle,
    no UDFs.
    """
    cols = changes.columns
    for name in derive:
        if name in cols or f"prev_{name}" in cols:
            raise ValueError(
                f"derived column {name!r} collides with an existing diff column"
            )
    ev = _eval_both_images(changes, derive)
    ins = F.col("operation") == INSERT
    dele = F.col("operation") == DELETE
    return ev.select(
        *[F.col(f"`{c}`") for c in cols],
        # cur-side derived values are NULL on DELETE rows even when the
        # expression itself is null-tolerant (e.g. coalesce(x, 0)) — the
        # retracts stream must read only prev-side values
        *[
            F.when(~dele, F.col(f"__cur_{a}")).alias(a)
            for a in derive
        ],
        *[
            F.when(~ins, F.col(f"__prev_{a}")).alias(f"prev_{a}")
            for a in derive
        ],
    )
