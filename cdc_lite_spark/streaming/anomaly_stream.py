"""Streaming rolling-anomaly detection: each micro-batch's events fold
into the maintained per-(key, hour) DECIMAL sum state, and the per-tick
anomaly snapshot (operators/anomaly.py flags over the full tiny state)
lands in the sink — the ops dashboard over a stream without rescanning
history.

Same state discipline as the gram-novelty and sketch streams (versioned
parquet state + atomic ``_CURRENT`` pointer; epoch e merges into the exact
version it saw, so a replayed epoch rewrites a bit-identical v{e+1} —
state exactly-once, sink at-least-once with identical duplicate rows).

Because the hourly sums are DECIMAL and addition is commutative/associative,
the maintained state after N batches EXACTLY equals the batch
``hourly_stats`` over all rows regardless of arrival order or batch
boundaries — so the emitted flags equal the batch ``rolling_anomaly_flags``
query bit-for-bit.  The test pins this equality and a stop/restart.

Why foreachBatch, not ``transformWithState``: the state is a maintained
aggregate TABLE keyed by (key, hour) — |keys|×|window| rows shared across
the stream — and trailing-window flags need the neighboring hours of each
key in one place; a per-epoch merge of two tiny tables expresses it with
one O(|state|) union-agg, where per-stream-key state would re-implement the
window by hand.  State stays bounded by ``retention_hours`` (old hours are
dropped past the trailing window's reach — the watermark equivalent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_lite_spark.operators.anomaly import WINDOW_HOURS, anomaly_flags, hourly_stats

#: hours of state kept beyond the trailing window (replay slack)
RETENTION_SLACK = 24


def _repoint(state_dir: str, version: str) -> None:
    tmp = os.path.join(state_dir, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(state_dir, "_CURRENT"))


def _current(state_dir: str) -> str:
    with open(os.path.join(state_dir, "_CURRENT")) as f:
        return f.read().strip()


def init_anomaly_state(history: DataFrame, state_dir: str) -> None:
    """Build initial hourly-sum state from historical events — the one
    O(history) pass."""
    hourly_stats(history).write.mode("overwrite").parquet(
        os.path.join(state_dir, "v0")
    )
    _repoint(state_dir, "v0")


def load_anomaly_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, _current(state_dir)))


def start_anomaly_stream(
    stream: DataFrame,
    state_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    retention_hours: int | None = None,
) -> StreamingQuery:
    """Fold each micro-batch into the hourly state and snapshot the flag
    table to ``sink_path``.  ``retention_hours`` (default WINDOW_HOURS +
    RETENTION_SLACK past the state's max hour) bounds state size."""
    keep = retention_hours or (WINDOW_HOURS + RETENTION_SLACK)
    spark = stream.sparkSession

    def _tick(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        # replay safety (the novelty/sketch stream contract): epoch e
        # always merges into the exact state version it originally saw —
        # v{e} if it still exists, else the current pointer — so a
        # replayed epoch rewrites a bit-identical v{e+1}, never
        # double-folds
        versioned = os.path.join(state_dir, f"v{epoch}")
        if os.path.isdir(versioned):
            state = spark.read.parquet(versioned)
        else:
            state = spark.read.parquet(os.path.join(state_dir, _current(state_dir)))
        delta = hourly_stats(batch)
        merged = (
            state.unionByName(delta)
            .groupBy("event_type", "hour")
            .agg(F.sum("x").alias("x"))
        )
        horizon = merged.agg(F.max("hour").alias("mx"))
        merged = (
            merged.crossJoin(F.broadcast(horizon))
            .filter(F.col("hour") >= F.col("mx") - F.expr(f"INTERVAL {keep} HOURS"))
            .drop("mx")
        )
        next_v = f"v{epoch + 1}"
        merged.write.mode("overwrite").parquet(os.path.join(state_dir, next_v))
        _repoint(state_dir, next_v)
        snapshot = anomaly_flags(
            spark.read.parquet(os.path.join(state_dir, next_v))
        ).withColumn("epoch", F.lit(epoch).cast("long"))
        snapshot.write.mode("overwrite").parquet(sink_path)
        # GC: keep current + the version a replay of THIS epoch re-reads
        import shutil

        for name in os.listdir(state_dir):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) < epoch:
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)

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
