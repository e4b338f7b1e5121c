"""Change-log replay: reconstruct table state from change records.

The inverse of the diff operator — given a base snapshot and a stream of
INSERT/UPDATE/DELETE records, materialize the resulting state.  This is the
consumer-side contract of the whole CDC pipeline: what a downstream
lakehouse table does with the change log (reference consumers parse the
JSONL and fold it themselves, duckdb_cdc_test.go:183-197; here it is one
relational expression).

With multiple records per key, last-writer-wins by (timestamp, tiebreak) —
the G1 latest-per-key window applied to the log (SURVEY.md §2g), then a
full-outer merge with the base.

Scale shape: one shuffle of the log on the key (latest-per-key via max_by
partial aggregation), one co-partitioned join against the base.  At 100 TB
the base is bucketed by key, so the merge is shuffle-free on the base side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.operators.latest import latest_per_key


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str] | None = None,
) -> DataFrame:
    """Fold ``changes`` (columns: keys…, payload…, ``operation`` [, order
    cols]) into ``base`` → the reconstructed state.

    INSERT/UPDATE upsert the payload; DELETE removes the key; unchanged
    base keys pass through.

    Schema drift (a log spanning ALTER ADD/DROP — the reference re-probes
    columns every poll, duckdb_cdc.go:146-159, so its log spans DDL too):
    the *changes* schema is the table's current shape and wins.  A column
    the log has but ``base`` lacks (ADDed mid-log) appears in the output,
    null for untouched base rows — matching a database ALTER, which back-
    fills existing rows with NULL.  A ``base`` column absent from the log
    (DROPped mid-log) is dropped from the reconstructed state.  Records
    written *before* an ADD simply carry null there (the wire envelope is a
    map, so re-typing old records against the final schema yields null —
    engine.materialize does exactly that).
    """
    order_by = order_by or []
    latest = (
        latest_per_key(changes, keys, order_by, via_agg=True) if order_by else changes
    )
    skip = set(keys) | {"operation"} | set(order_by)
    payload_cols = [c for c in changes.columns if c not in skip]
    base_payload = {c for c in base.columns if c not in keys}
    change_types = dict(changes.dtypes)

    c = latest.select(
        *[F.col(k).alias(f"__ck_{k}") for k in keys],
        F.col("operation").alias("__op"),
        *[F.col(p).alias(f"__cv_{p}") for p in payload_cols],
    )
    cond = [base[k] == c[f"__ck_{k}"] for k in keys]
    merged = base.join(c, cond, "full_outer")

    out_keys = [F.coalesce(base[k], c[f"__ck_{k}"]).alias(k) for k in keys]
    out_payload = [
        F.when(F.col("__op").isNotNull(), F.col(f"__cv_{p}"))
        .otherwise(
            base[p] if p in base_payload else F.lit(None).cast(change_types[p])
        )
        .alias(p)
        for p in payload_cols
    ]
    return (
        merged.filter((F.col("__op").isNull()) | (F.col("__op") != "DELETE"))
        .select(*out_keys, *out_payload)
    )
