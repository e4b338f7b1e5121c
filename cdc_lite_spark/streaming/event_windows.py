"""Event-time streaming operators over the change stream (SURVEY.md §2 H7,
F6, H2).

These are the Structured-Streaming twins of the batch queries in
queries.py: the same declarative expressions over ``readStream`` sources
with watermarks bounding state.  Tests drive them with file sources +
``availableNow`` triggers (no sleeps — the reference's timing-based tests,
duckdb_cdc_test.go:159, are replaced by deterministic drains).

Scale notes: every stateful operator here carries watermark-bounded keyed
state — state size ∝ (keys × window retention), never ∝ stream length.
That is the 100 TB contract: no unbounded driver or executor state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """H7: tumbling event-time window aggregation with late-data bound.

    Works identically on batch and streaming DataFrames (same Catalyst
    plan); on a stream the watermark lets Spark drop window state once the
    event-time frontier passes window_end + 2h.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window), key_col)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """H7: sliding windows (each event lands in window/slide buckets)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window, slide))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """H7: native session windows (dynamic gap-based windows).  The batch
    twin is the lag+cumsum sessionization query (queries.py) — same
    semantics, this form maintains per-key session state on the stream."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            key_col,
            "n_events",
        )
    )


def enrich_stream(change_stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """F6: stream-static join — enrich change events with a dimension
    table.  The static side is re-read per micro-batch (picks up dim
    updates) and broadcast when small; the stream side never shuffles."""
    return change_stream.join(F.broadcast(dim), on, "left")


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
) -> DataFrame:
    """Stream-stream interval join: match right rows to left rows of the
    same key with ``right.ts ∈ [left.ts - within, left.ts]``.

    Both sides carry watermarks, and the join condition bounds event-time
    distance — that bound is what lets Spark expire buffered state on both
    sides (an unbounded stream-stream join would buffer forever).  Works on
    batch frames too (same plan minus the state bookkeeping).
    """
    l_wm = left.withWatermark(left_ts, within) if left.isStreaming else left
    r_wm = right.withWatermark(right_ts, within) if right.isStreaming else right
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_ts] <= l_wm[left_ts])
        & (r_wm[right_ts] >= l_wm[left_ts] - F.expr(f"INTERVAL {within}"))
    )
    return l_wm.join(r_wm, cond, "inner").drop(r_wm[key])


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """H2: stateful streaming dedup — drop re-deliveries of the same key
    within the watermark horizon.  This is the reference's "remember the
    last checksum per table" state (duckdb_cdc.go:188-212) generalized to
    arbitrary keys with bounded state: entries expire once the event-time
    frontier passes the watermark."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
