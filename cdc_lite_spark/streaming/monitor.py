"""Structured-Streaming monitor loop (SURVEY.md §2 H1-H6, §3.1).

The reference runs a goroutine with a 1 s ticker
(/root/reference/pkg/duckdb/duckdb_cdc.go:86-99).  The Spark-idiomatic shape
for "poll a mutable table" is a **rate source driving foreachBatch**: the
rate stream provides the clock + checkpointed progress; each micro-batch
re-reads the monitored tables in batch mode and runs the detect/capture
logic (SURVEY.md §7.4 — Spark's file source won't re-read a mutated path,
so the tick itself must be the stream).

Scale shape: the per-tick work is the C3 fingerprint (full-scan partial
agg) plus capture-on-change only; all heavy lifting is executor-side, the
driver only compares two strings per table per tick.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_monitor(
    engine,
    tables: dict[str, DataFrame],
    interval_seconds: float = 1.0,
    checkpoint_dir: str | None = None,
    mode: str = "snapshot",
    keys: dict[str, list[str]] | None = None,
    parallelism: int = 1,
    retention_minutes: float | None = None,
    expire_every_ticks: int = 60,
    partition_cols: dict[str, str] | None = None,
) -> StreamingQuery:
    """Start the continuous monitor; returns the StreamingQuery.

    ``query.stop()`` is the graceful-shutdown path (reference: ctx
    cancellation on SIGINT/SIGTERM, main.go:31-38 / duckdb_cdc.go:96-98).
    Per-table errors inside a tick are isolated by ``poll_once`` (H6).

    ``retention_minutes`` arms in-loop change-log GC: every
    ``expire_every_ticks`` micro-batches the engine folds change files
    wholly older than ``now - retention_minutes`` into one latest-per-key
    segment (sources/changelog.py:expire_changelog), so an always-on
    monitor's log directory stays bounded.  Tables without declared
    ``keys`` are compacted verbatim, never folded.  GC errors are isolated
    like per-table poll errors — a failed pass retries at the next arming
    tick.

    ``partition_cols`` (table → column) routes those tables through
    partition-gated capture (``poll_partitions``): only drifted partition
    values re-emit per tick instead of the whole table.
    """
    import datetime

    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="cdc_monitor_ckpt_")
    ticks = engine.spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    part_cols = partition_cols or {}

    def _tick(_batch_df: DataFrame, batch_id: int) -> None:
        # the monitor owns the tick boundary: advance snapshot providers
        # ONCE for the whole table set, so snapshot-captured and
        # partition-captured tables of one provider see the same copy
        engine._advance_tick_providers(tables.values())
        rest = {t: s for t, s in tables.items() if t not in part_cols}
        if rest:
            engine.poll_once(
                rest,
                mode=mode,
                keys=keys,
                parallelism=parallelism,
                advance_providers=False,
            )
        for t, col in part_cols.items():
            if t not in tables:
                continue
            try:
                engine.poll_partitions(t, tables[t], col, advance_providers=False)
            except Exception as exc:  # noqa: BLE001 — per-table isolation (H6)
                print(f"cdc_lite_spark: error checking table {t}: {exc}")
        if (
            retention_minutes is not None
            and expire_every_ticks > 0
            and batch_id > 0
            and batch_id % expire_every_ticks == 0
        ):
            try:
                # naive-UTC, matching the log's UTC-pinned session-timezone
                # timestamps — local now() on a host east of UTC would place
                # the watermark in the future and fold the ENTIRE log
                wm = datetime.datetime.now(datetime.timezone.utc).replace(
                    tzinfo=None
                ) - datetime.timedelta(minutes=retention_minutes)
                # partition-captured tables must never fold latest-per-key
                # (poll_partitions documents the exclusivity); without their
                # keys they compact verbatim, which is safe
                gc_keys = {
                    t: k for t, k in (keys or {}).items() if t not in part_cols
                }
                engine.expire_log(wm, gc_keys)
            except Exception:  # noqa: BLE001 — same isolation as poll errors
                pass

    return (
        ticks.writeStream.foreachBatch(_tick)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{interval_seconds} seconds")
        .start()
    )
