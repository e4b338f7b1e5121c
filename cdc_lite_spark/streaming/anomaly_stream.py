"""Streaming rolling-anomaly detection: each micro-batch's events fold
into the maintained per-(key, hour) DECIMAL sum state, and the per-tick
anomaly snapshot (operators/anomaly.py flags over the full tiny state)
lands in the sink — the ops dashboard over a stream without rescanning
history.

Same state discipline as the gram-novelty and sketch streams, via the
shared ``streaming/_state.py`` protocol: versioned parquet state + atomic
``_CURRENT`` pointer; epoch e merges into the exact version it saw, and
EVERY epoch — including empty ones — commits ``v{e+1}`` so the version
chain a replay depends on never breaks (r5 review: an isEmpty early-return
here let a replayed epoch after an empty one double-fold).

Because the hourly sums are DECIMAL and addition is commutative/associative,
the maintained state after N batches EXACTLY equals the batch
``hourly_stats`` over the retained rows regardless of arrival order or
batch boundaries — so the emitted flags equal ``anomaly_flags`` over the
same retained rows bit-for-bit (the test pins this and a stop/restart).

Retention is PER KEY and ROW-BASED — each key keeps its most recent
``retention_rows`` observed hourly rows (default trailing window + the
same again as slack) — because ``anomaly_flags``' frame is 24 observed
ROWS, not 24 wall-clock hours: a global hour horizon would cut frame rows
out from under sparse keys and erase idle keys entirely (r5 review).
State is bounded at |keys| × retention_rows.  Inherent boundary effect of
ANY retention: flags for the oldest ``WINDOW_HOURS`` retained rows of a
key see a shorter history than a full-log batch run would; rows past that
prefix match full history exactly.

Why foreachBatch, not ``transformWithState``: the state is a maintained
aggregate TABLE keyed by (key, hour), and trailing-window flags need each
key's neighboring hours in one place; a per-epoch merge of two tiny tables
expresses it with one O(|state|) union-agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_lite_spark.operators.anomaly import WINDOW_HOURS, anomaly_flags, hourly_stats
from cdc_lite_spark.streaming._state import (
    fs_for,
    publish_version,
    read_current,
    read_for_epoch,
    repoint,
    run_writes,
    write_version,
)

#: rows of slack kept beyond the trailing window (per key)
RETENTION_SLACK = 24


def init_anomaly_state(history: DataFrame, state_dir: str) -> None:
    """Build initial hourly-sum state from historical events — the one
    O(history) pass."""
    import os

    hourly_stats(history).write.mode("overwrite").parquet(
        os.path.join(state_dir, "v0")
    )
    repoint(state_dir, "v0")


def load_anomaly_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return read_current(spark, state_dir)


def start_anomaly_stream(
    stream: DataFrame,
    state_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    retention_rows: int | None = None,
) -> StreamingQuery:
    """Fold each micro-batch into the hourly state and snapshot the flag
    table to ``sink_path``.  Each key keeps its most recent
    ``retention_rows`` hourly rows (default WINDOW_HOURS +
    RETENTION_SLACK)."""
    keep = (
        retention_rows
        if retention_rows is not None
        else WINDOW_HOURS + RETENTION_SLACK
    )
    spark = stream.sparkSession

    def _tick(batch: DataFrame, epoch: int) -> None:
        from pyspark.sql import Window as W

        fs = fs_for(state_dir, spark)
        state = read_for_epoch(spark, state_dir, epoch, fs)
        merged = (
            state.unionByName(hourly_stats(batch))
            .groupBy("event_type", "hour")
            .agg(F.sum("x").alias("x"))
        )
        # per-key row retention in the SAME pass (no second derivation of
        # the merge): newest `keep` hourly rows per key survive
        rn = F.row_number().over(
            W.partitionBy("event_type").orderBy(F.desc("hour"))
        )
        merged = (
            merged.withColumn("__rn", rn)
            .filter(F.col("__rn") <= keep)
            .drop("__rn")
            # consumed by TWO writes below (state version + flag snapshot):
            # pin it so the merge/retention subtree runs once (guide §5)
            .persist()
        )
        try:
            # the flag snapshot is a deterministic function of the NEW state
            # content, which is `merged` itself — computing it from the
            # cached frame instead of re-reading the just-written parquet
            # drops one read-back per epoch, and the two writes are
            # independent phase-1 work (an unpublished v{e+1} is an orphan;
            # the sink is epoch-idempotent), so they overlap (guide §2.6)
            # before the pointer publishes — the commit semantics and every
            # crash/replay window converge exactly as before
            snapshot = anomaly_flags(merged).withColumn(
                "epoch", F.lit(epoch).cast("long")
            )
            run_writes(
                [
                    ("state write", lambda: write_version(merged, state_dir, epoch)),
                    (
                        "sink write",
                        lambda: snapshot.write.mode("overwrite").parquet(sink_path),
                    ),
                ]
            )
            publish_version(state_dir, epoch, fs)
        finally:
            merged.unpersist()

    return (
        stream.writeStream.foreachBatch(_tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


__all__ = [
    "init_anomaly_state",
    "load_anomaly_state",
    "start_anomaly_stream",
]
