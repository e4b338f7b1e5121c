"""Streaming incremental near-dup: new docs arriving as a file stream are
LSH-checked against static corpus signatures, duplicate pairs land in the
parquet sink exactly once (checkpointed foreachBatch)."""

from __future__ import annotations

import pytest

from cdc_lite_spark.streaming.dedup_stream import (
    dedup_against_corpus,
    start_dedup_stream,
)

DUP = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "completely unrelated text with different vocabulary entirely here now"


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(1, DUP), (2, OTHER), (3, "third doc about spark engines and parquet files")],
        "doc_id long, text string",
    )


def test_dedup_against_corpus_batch(spark, corpus):
    batch = spark.createDataFrame(
        [(100, DUP), (101, "novel content matching nothing in the corpus")],
        "doc_id long, text string",
    )
    out = dedup_against_corpus(batch, corpus, _sig(corpus)).collect()
    assert {(r.id_new, r.id_old) for r in out} == {(100, 1)}
    assert all(r.jaccard >= 0.5 for r in out)


def _sig(corpus):
    from cdc_lite_spark.streaming.dedup_stream import build_corpus_signatures

    return build_corpus_signatures(corpus)


def test_streaming_dedup_end_to_end(spark, corpus, tmp_path):
    new_dir = str(tmp_path / "incoming")
    sink = str(tmp_path / "dups")
    ckpt = str(tmp_path / "ckpt")

    incoming = spark.createDataFrame(
        [(100, DUP), (101, "nothing like the corpus"), (102, OTHER)],
        "doc_id long, text string",
    )
    incoming.repartition(2).write.mode("overwrite").parquet(new_dir)

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_dir)
    )
    q = start_dedup_stream(stream, corpus, sink, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.id_new, r.id_old) for r in spark.read.parquet(sink).collect()
    }
    assert got == {(100, 1), (102, 2)}
