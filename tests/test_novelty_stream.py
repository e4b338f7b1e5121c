"""Streaming gram-novelty gate: batches score against the maintained state
and fold into it — later batches see earlier batches' grams."""

from __future__ import annotations

from cdc_lite_spark.streaming.novelty_stream import (
    init_novelty_state,
    load_novelty_state,
    start_novelty_stream,
)

KNOWN = "alpha beta gamma delta epsilon zeta"
NOVEL = "totally fresh wording never recorded anywhere"


def test_novelty_stream_scores_and_maintains_state(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    sink = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    new_dir = str(tmp_path / "incoming")
    (tmp_path / "state").mkdir()

    corpus = spark.createDataFrame(
        [(1, KNOWN), (2, "some other historical document text here")],
        "doc_id long, text string",
    )
    init_novelty_state(corpus, state_dir)

    incoming = spark.createDataFrame(
        [(100, KNOWN), (101, NOVEL), (102, NOVEL)],
        "doc_id long, text string",
    )
    # three files → three micro-batches; 102 may or may not land after 101
    # in a separate batch, so only assert the cross-batch case via 100/101
    incoming.repartition(3).write.mode("overwrite").parquet(new_dir)

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_dir)
    )
    q = start_novelty_stream(stream, state_dir, sink, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r["doc_id"]: r for r in spark.read.parquet(sink).collect()}
    assert set(rows) == {100, 101, 102}
    assert rows[100]["novelty"] == 0.0  # exact copy of corpus content
    # 101 and 102 are identical NOVEL text; whichever arrived first scored
    # 1.0 and folded its grams in, so if they hit different batches the
    # second scored 0.0 — in all cases at least one is fully novel
    assert max(rows[101]["novelty"], rows[102]["novelty"]) == 1.0

    # final state contains the novel grams: re-scoring NOVEL now gives 0
    from cdc_lite_spark.operators.dedup import batch_gram_novelty

    re_batch = spark.createDataFrame([(200, NOVEL)], "doc_id long, text string")
    state = load_novelty_state(spark, state_dir)
    assert batch_gram_novelty(re_batch, state).collect()[0]["novelty"] == 0.0


def test_novelty_state_versions_are_gcd(spark, tmp_path):
    import os

    state_dir = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    corpus = spark.createDataFrame([(1, KNOWN)], "doc_id long, text string")
    init_novelty_state(corpus, state_dir)

    incoming = spark.createDataFrame(
        [(i, f"batch {i} words w{i} x{i} y{i} z{i}") for i in range(4)],
        "doc_id long, text string",
    )
    new_dir = str(tmp_path / "in")
    incoming.repartition(4).write.mode("overwrite").parquet(new_dir)
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_dir)
    )
    q = start_novelty_stream(
        stream, state_dir, str(tmp_path / "sink"), str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    versions = sorted(n for n in os.listdir(state_dir) if n.startswith("v"))
    assert len(versions) <= 3  # current + replay window, older GC'd


def test_novelty_stream_survives_stop_and_restart(spark, tmp_path):
    """Stop mid-corpus, append input, restart on the same checkpoint +
    state dir: the maintained gram state after the second run equals what
    a single uninterrupted run over all documents would hold (grams from
    every processed doc present; re-scoring any of them yields novelty 0)."""
    from cdc_lite_spark.operators.dedup import batch_gram_novelty

    state_dir = str(tmp_path / "state")
    sink = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    in_dir = str(tmp_path / "in")
    (tmp_path / "state").mkdir()

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    init_novelty_state(corpus, state_dir)

    batch1 = spark.createDataFrame(
        [(10, "first wave of completely new wording here today")],
        "doc_id long, text string",
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(in_dir)

    def start():
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        return start_novelty_stream(stream, state_dir, sink, ckpt)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch2 = spark.createDataFrame(
        [(20, "second wave arriving after the restart boundary now")],
        "doc_id long, text string",
    )
    batch2.coalesce(1).write.mode("append").parquet(in_dir)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    scores = {r["doc_id"]: r["novelty"] for r in spark.read.parquet(sink).collect()}
    assert set(scores) == {10, 20} and scores[20] == 1.0  # fresh text, post-restart

    state = load_novelty_state(spark, state_dir)
    for text in [
        "first wave of completely new wording here today",
        "second wave arriving after the restart boundary now",
    ]:
        re_batch = spark.createDataFrame([(99, text)], "doc_id long, text string")
        assert batch_gram_novelty(re_batch, state).collect()[0]["novelty"] == 0.0


def test_novelty_stream_with_file_scheme_state_dir(spark, tmp_path):
    """r6 advice (high): the stream's replay check and GC must route
    through the same fs adapter as the pointer swap — a scheme'd state
    dir (file:// here, the same adapter seam hdfs:///s3a:// take) runs
    the full tick path without touching raw os.* on the URI."""
    (tmp_path / "state").mkdir()
    state_dir = "file://" + str(tmp_path / "state")
    sink = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    new_dir = str(tmp_path / "incoming")

    corpus = spark.createDataFrame([(1, KNOWN)], "doc_id long, text string")
    init_novelty_state(corpus, state_dir)

    incoming = spark.createDataFrame(
        [(100, KNOWN), (101, NOVEL)], "doc_id long, text string"
    )
    incoming.repartition(2).write.mode("overwrite").parquet(new_dir)
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_dir)
    )
    q = start_novelty_stream(stream, state_dir, sink, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["doc_id"]: r for r in spark.read.parquet(sink).collect()}
    assert rows[100]["novelty"] == 0.0 and rows[101]["novelty"] == 1.0
    # versions GC'd through the adapter on the plain local path
    import os

    names = sorted(
        n for n in os.listdir(tmp_path / "state") if n.startswith("v")
    )
    assert len(names) <= 2 and load_novelty_state(spark, state_dir).count() > 0
