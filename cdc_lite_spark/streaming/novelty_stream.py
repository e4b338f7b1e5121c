"""Streaming gram-novelty gate: documents arriving on a stream are scored
against the maintained corpus gram-frequency state, then folded INTO that
state — the streaming face of ``operators.dedup.batch_gram_novelty`` +
``update_gram_frequencies``.

Shape: ``readStream`` → ``foreachBatch`` → score batch vs state (left join
on the gram key; batch side small) → append scores to the sink → merge the
batch's grams into the state parquet.  Per-tick cost is O(batch grams);
the corpus text is never rescanned.  State lives as a parquet directory
swapped atomically per epoch (write-new-then-repoint): a replayed epoch
re-reads exactly the state version it originally saw (v{epoch}), so its
scores and its state rewrite are bit-identical.  The scores SINK is
at-least-once — a replay appends duplicate (but identical) rows, which
downstream consumers drop by (doc_id, epoch) if they need exactly-once;
the STATE is exactly-once by the version swap.

Why foreachBatch, not ``transformWithState``: the state here is keyed by
GRAM (millions of keys shared across all documents), not by stream key —
it is a maintained aggregate table, which is exactly what a per-epoch
merge join expresses; per-key streaming state would shuffle every tick's
grams into the state store for no benefit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_lite_spark.operators.dedup import (
    batch_gram_novelty,
    gram_frequency_state,
    update_gram_frequencies,
)

# versioned-state protocol shared with the sketch/anomaly streams — every
# filesystem touch (pointer swap, replay check, GC) routes through the
# _state.py adapter, so a remote (hdfs:// / s3a:// / file://) state dir
# uses ONE filesystem for all of them (r6 advice: the inline os.path
# replay check silently missed v{e} on remote dirs and double-folded)
from cdc_lite_spark.streaming._state import (
    commit_version,
    fs_for,
    read_current,
    read_for_epoch,
    repoint,
)

_STATE_SCHEMA = "gram long, doc_freq bigint"


def init_novelty_state(corpus: DataFrame, state_dir: str) -> None:
    """Build the initial gram-frequency state from the historical corpus —
    the one O(corpus) pass; every tick afterwards is O(batch)."""
    gram_frequency_state(corpus).write.mode("overwrite").parquet(state_dir + "/v0")
    repoint(state_dir, "v0")


def load_novelty_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return read_current(spark, state_dir, schema=_STATE_SCHEMA)


def start_novelty_stream(
    new_docs_stream: DataFrame,
    state_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    trigger_seconds: int = 1,
    on_batch: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Attach the novelty gate to a stream of (doc_id, text) rows.

    Each tick: score the batch against state version v{epoch} (falling
    back to the committed head when the checkpoint predates this state
    dir), append (doc_id, n_grams, n_seen, novelty) to the sink, then
    write v{epoch+1} = state ⊕ batch and repoint _CURRENT.  A replayed
    epoch recomputes identical scores and rewrites the identical state
    version; only the sink append is at-least-once (see module note).
    """

    def _tick(batch: DataFrame, epoch: int) -> None:
        spark = batch.sparkSession
        fs = fs_for(state_dir, spark)
        # a replayed epoch must score against the SAME state it originally
        # saw: epoch e always reads version v{e} when it exists (the tick
        # for e-1 wrote it), falling back to the committed head only when
        # the stream's checkpoint predates this state directory
        state = read_for_epoch(spark, state_dir, epoch, fs, schema=_STATE_SCHEMA)
        scores = batch_gram_novelty(batch, state)
        if on_batch is not None:
            on_batch(scores, epoch)
        scores.write.mode("append").parquet(sink_path)
        # write v{epoch+1}, swing the pointer, GC versions a replay of this
        # epoch can no longer read — all on the state dir's own filesystem
        commit_version(update_gram_frequencies(state, batch), state_dir, epoch, fs)

    return (
        new_docs_stream.writeStream.foreachBatch(_tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
