"""Streaming incremental near-dup: new documents arriving on a stream are
LSH-checked against a static (periodically refreshed) corpus signature
table — the streaming face of ``operators.dedup.lsh_pairs_between``.

Shape: ``readStream`` (any source producing (doc_id, text)) →
``foreachBatch`` → per-batch MinHash + two-sided bucket join against the
broadcast-or-co-partitioned corpus signatures → verified duplicate pairs
appended to a parquet sink.  Each micro-batch costs O(batch x bucket
occupancy), independent of corpus size — the only scale-correct shape for
dedup-on-ingest at 100 TB (re-pairing the corpus per tick would be O(n²)).

Why foreachBatch, not a stream-static join: the LSH pipeline needs an
aggregation (signature → band explode → bucket join → distinct) that
Structured Streaming can't express as a single stream-static equi-join;
foreachBatch gives each micro-batch the full batch DataFrame API while the
stream retains checkpointed exactly-once sink semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_lite_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET_INCR,
    jaccard_verify,
    lsh_pairs_between,
    minhash_signatures,
)


def build_corpus_signatures(corpus: DataFrame) -> DataFrame:
    """Precompute (and typically persist to parquet) the corpus MinHash
    signatures once; ticks only read them."""
    return minhash_signatures(corpus)


def dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    corpus_sig: DataFrame,
    threshold: float = 0.5,
    max_bucket: int = DEFAULT_MAX_BUCKET_INCR,
) -> DataFrame:
    """One micro-batch of new docs vs the stored corpus: returns verified
    (id_new, id_old, jaccard) pairs."""
    pairs = lsh_pairs_between(
        minhash_signatures(batch), corpus_sig, max_bucket=max_bucket
    ).withColumnsRenamed({"id_new": "id_a", "id_old": "id_b"})
    both = batch.select("doc_id", "text").unionByName(corpus.select("doc_id", "text"))
    out = jaccard_verify(both, pairs, threshold=threshold)
    return out.select(
        F.col("id_a").alias("id_new"), F.col("id_b").alias("id_old"), "jaccard"
    )


def start_dedup_stream(
    new_docs_stream: DataFrame,
    corpus: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_bucket: int = DEFAULT_MAX_BUCKET_INCR,
    trigger_seconds: int = 1,
    on_batch: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Attach the incremental dedup to a stream of (doc_id, text) rows.

    Corpus signatures are computed once at start (refresh by restarting the
    query — the checkpoint makes that exactly-once).  Duplicate pairs append
    to ``sink_path`` as parquet.
    """
    # signatures are reused every tick: materialize once, executor-resident
    corpus_sig = build_corpus_signatures(corpus).persist()
    corpus_sig.count()

    def _tick(batch: DataFrame, epoch: int) -> None:
        dups = dedup_against_corpus(
            batch, corpus, corpus_sig, threshold=threshold, max_bucket=max_bucket
        )
        if on_batch is not None:
            on_batch(dups, epoch)
        dups.write.mode("append").parquet(sink_path)

    return (
        new_docs_stream.writeStream.foreachBatch(_tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
