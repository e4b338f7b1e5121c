"""SCD Type-2 historization: turn change records into validity intervals.

The standard lakehouse consumer of a CDC feed: instead of overwriting state
(replay.apply_changes) keep every version with ``[valid_from, valid_to)``
intervals and an ``is_current`` flag.  Pure window expression over the
per-key change history — no MERGE INTO engine support needed (SURVEY.md
guide: "CDC / SCD2 → emulate with anti-join + union + window").

Scale shape: one shuffle on the key for the lead() window; the history
table appends — never rewrites — so the operator is also the idempotent
`foreachBatch` body for a streaming SCD2 sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    op_col: str = "operation",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Build the full SCD2 history from a change stream.

    Input: one row per change ``(keys…, payload…, operation, ts)``.
    Output: one row per VERSION: payload columns as of that version,
    ``valid_from`` = its change ts, ``valid_to`` = next change ts for the
    key (null = open), ``is_current`` = open AND not deleted.  DELETE
    records close the previous version and contribute a tombstone row
    (is_current = false) so downstream joins can see removals.
    ``tiebreak`` columns make same-timestamp ordering deterministic.
    """
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak or [])]]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn(
            "is_current",
            nxt.isNull() & (F.col(op_col) != F.lit("DELETE")),
        )
        .drop(ts_col)
    )


def scd2_as_of(history: DataFrame, ts, keys: list[str] | None = None) -> DataFrame:
    """Point-in-time view: the version valid at ``ts`` per key
    (valid_from <= ts < valid_to, open intervals included)."""
    # Cast the probe literal to the history's own validity-column type so an
    # NTZ-typed history (e.g. straight off timestamp[us]-no-tz parquet)
    # compares cleanly instead of throwing DATATYPE_MISMATCH.
    vf_type = dict(history.dtypes).get("valid_from") or "timestamp"
    t = F.lit(ts).cast(vf_type)
    cond = (F.col("valid_from") <= t) & (
        F.col("valid_to").isNull() | (F.col("valid_to") > t)
    )
    out = history.filter(cond).filter(F.col("operation") != "DELETE")
    return out
