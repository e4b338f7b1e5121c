"""Streaming sketch maintenance: per-batch folds produce exactly the state
a from-scratch build over all arrived rows would — the lossless-merge
property under the versioned-state discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.sketches import (
    distinct_sketch_state,
    rollup_estimates,
)
from cdc_lite_spark.streaming.sketch_stream import (
    init_sketch_state,
    load_sketch_state,
    start_sketch_stream,
)


def test_sketch_stream_matches_batch_rebuild(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    sink = str(tmp_path / "estimates")
    ckpt = str(tmp_path / "ckpt")
    in_dir = str(tmp_path / "incoming")
    (tmp_path / "state").mkdir()

    history = spark.createDataFrame(
        [("d1", i % 40) for i in range(200)], "grain string, uid long"
    )
    init_sketch_state(history, ["grain"], "uid", state_dir)

    # two grains: d1 overlaps history's users, d2 is entirely new
    incoming = spark.createDataFrame(
        [("d1", 30 + (i % 30)) for i in range(90)]
        + [("d2", 1000 + (i % 55)) for i in range(110)],
        "grain string, uid long",
    )
    incoming.repartition(3).write.mode("overwrite").parquet(in_dir)

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_sketch_stream(stream, ["grain"], "uid", state_dir, sink, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    maintained = {
        r["grain"]: (r["distinct_estimate"], r["n_rows"])
        for r in rollup_estimates(load_sketch_state(spark, state_dir), ["grain"]).collect()
    }
    rebuilt = {
        r["grain"]: (r["distinct_estimate"], r["n_rows"])
        for r in rollup_estimates(
            distinct_sketch_state(history.unionByName(incoming), ["grain"], "uid"),
            ["grain"],
        ).collect()
    }
    # lossless merge: maintained state == from-scratch state, exactly
    assert maintained == rebuilt
    # and the estimates are right (small cardinalities are exact in HLL)
    assert maintained["d1"][0] == 60  # 0..39 ∪ 30..59
    assert maintained["d2"][0] == 55

    # the sink carries one snapshot per grain per epoch, monotone epochs
    snaps = spark.read.parquet(sink)
    assert snaps.filter(F.col("grain") == "d2").count() >= 1
    assert snaps.select("epoch").distinct().count() >= 2  # multiple ticks ran


def test_sketch_stream_gcs_old_versions(spark, tmp_path):
    import os

    state_dir = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    init_sketch_state(
        spark.createDataFrame([("d1", 1)], "grain string, uid long"),
        ["grain"],
        "uid",
        state_dir,
    )
    incoming = spark.createDataFrame(
        [("d1", i) for i in range(4)], "grain string, uid long"
    )
    in_dir = str(tmp_path / "in")
    incoming.repartition(4).write.mode("overwrite").parquet(in_dir)
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_sketch_stream(
        stream,
        ["grain"],
        "uid",
        state_dir,
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    versions = [n for n in os.listdir(state_dir) if n.startswith("v")]
    assert len(versions) <= 2  # current + replay-reachable only


def test_sketch_stream_survives_stop_and_restart(spark, tmp_path):
    """Stop the query mid-corpus, append more input, restart on the SAME
    checkpoint + state dir: epochs resume where they left off and the
    final maintained state still equals the from-scratch rebuild — the
    versioned-swap discipline under a real restart, not just a clean run."""
    state_dir = str(tmp_path / "state")
    sink = str(tmp_path / "est")
    ckpt = str(tmp_path / "ckpt")
    in_dir = str(tmp_path / "in")
    (tmp_path / "state").mkdir()

    history = spark.createDataFrame(
        [("d1", i % 25) for i in range(100)], "grain string, uid long"
    )
    init_sketch_state(history, ["grain"], "uid", state_dir)

    first = spark.createDataFrame(
        [("d1", 20 + (i % 20)) for i in range(60)], "grain string, uid long"
    )
    first.repartition(2).write.mode("overwrite").parquet(in_dir)

    def start():
        stream = (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        return start_sketch_stream(stream, ["grain"], "uid", state_dir, sink, ckpt)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    second = spark.createDataFrame(
        [("d2", 500 + (i % 30)) for i in range(40)], "grain string, uid long"
    )
    second.coalesce(1).write.mode("append").parquet(in_dir)

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    maintained = {
        r["grain"]: (r["distinct_estimate"], r["n_rows"])
        for r in rollup_estimates(load_sketch_state(spark, state_dir), ["grain"]).collect()
    }
    everything = history.unionByName(first).unionByName(second)
    rebuilt = {
        r["grain"]: (r["distinct_estimate"], r["n_rows"])
        for r in rollup_estimates(
            distinct_sketch_state(everything, ["grain"], "uid"), ["grain"]
        ).collect()
    }
    assert maintained == rebuilt
    assert maintained["d1"] == (40, 160)  # 0..24 ∪ 20..39
    assert maintained["d2"] == (30, 40)
