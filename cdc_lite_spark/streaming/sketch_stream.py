"""Streaming maintenance of distinct-sketch state: each micro-batch's rows
fold into the per-grain HLL state (operators/sketches.py) and a per-tick
rollup snapshot lands in the sink — distinct-count dashboards over a stream
without ever rescanning history.

Same state discipline as the gram-novelty gate (novelty_stream.py, which
documents the replay semantics in full): state lives as a versioned parquet
directory swapped atomically per epoch, epoch e always merges into the
exact state version it originally saw (v{e}), so a replayed epoch rewrites
a bit-identical v{e+1} — state is exactly-once, the estimates SINK is
at-least-once with identical duplicate rows (dedup downstream by
(grain, epoch) if exactly-once reads are needed).

Because the HLL merge is lossless and commutative (register max), the
maintained state after N batches is EXACTLY the state a from-scratch build
over all N batches' rows would produce — the test pins this equality, not
an approximation of it.

Why foreachBatch, not ``transformWithState``: like the gram state, this is
a maintained aggregate table keyed by grain (dates/domains shared by all
stream keys), not per-stream-key state; a per-epoch merge of two tiny
state tables expresses it with one O(|state|) join-free union-agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from cdc_lite_spark.operators.sketches import (
    DEFAULT_LGK,
    distinct_sketch_state,
    merge_states,
    rollup_estimates,
)

# versioned-state protocol shared with the novelty/anomaly streams — every
# filesystem touch routes through the _state.py adapter so remote state
# dirs (hdfs:// / s3a:// / file://) use one filesystem throughout
from cdc_lite_spark.streaming._state import (
    commit_version,
    fs_for,
    read_current,
    read_for_epoch,
    repoint,
)


def init_sketch_state(
    history: DataFrame,
    grain_cols: list[str],
    value_col: str,
    state_dir: str,
    lgk: int = DEFAULT_LGK,
) -> None:
    """Build initial state from historical rows — the one O(history) pass."""
    distinct_sketch_state(history, grain_cols, value_col, lgk).write.mode(
        "overwrite"
    ).parquet(state_dir + "/v0")
    repoint(state_dir, "v0")


def load_sketch_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return read_current(spark, state_dir)


def start_sketch_stream(
    stream: DataFrame,
    grain_cols: list[str],
    value_col: str,
    state_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    trigger_seconds: int = 1,
    lgk: int = DEFAULT_LGK,
) -> StreamingQuery:
    """Attach sketch maintenance to a stream.  Each tick: sketch the batch,
    merge into state v{epoch} → v{epoch+1} (atomic repoint), and append the
    post-merge per-grain estimates (grain…, distinct_estimate, n_rows,
    epoch) to the sink."""

    def _tick(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        fs = fs_for(state_dir, spark)
        state = read_for_epoch(spark, state_dir, epoch, fs)
        new_state = merge_states(
            state,
            distinct_sketch_state(batch, grain_cols, value_col, lgk),
            grain_cols,
        ).localCheckpoint()  # one computation feeds both the write and the snapshot
        # write v{epoch+1}, swing the pointer, GC — all via the fs adapter
        commit_version(new_state, state_dir, epoch, fs)
        import pyspark.sql.functions as F

        rollup_estimates(new_state, grain_cols).withColumn(
            "epoch", F.lit(epoch).cast("long")
        ).write.mode("append").parquet(sink_path)

    return (
        stream.writeStream.foreachBatch(_tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
