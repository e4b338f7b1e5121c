"""Streaming rolling-anomaly twin (streaming/anomaly_stream.py): the
maintained hourly state must equal the from-scratch batch aggregate
exactly (DECIMAL sums are commutative), so the emitted flags equal the
batch rolling_anomaly_flags query bit-for-bit — including across a
stop/restart on the same checkpoint + state dir."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.anomaly import anomaly_flags, hourly_stats
from cdc_lite_spark.streaming.anomaly_stream import (
    init_anomaly_state,
    load_anomaly_state,
    start_anomaly_stream,
)


def _flag_set(df):
    return {
        (r["event_type"], r["hour"], r["x"], r["n_prev"], r["anomaly"])
        for r in df.select(
            "event_type", "hour", "x", "n_prev", "anomaly"
        ).collect()
    }


def test_anomaly_stream_matches_batch_and_survives_restart(spark, tables, tmp_path):
    ev = tables["events"].select("ts", "event_type", "value")
    cutoff = ev.agg(
        F.expr("percentile(unix_timestamp(ts), 0.4)").alias("c")
    ).first()["c"]
    hist = ev.filter(F.unix_timestamp("ts") <= cutoff)
    live = ev.filter(F.unix_timestamp("ts") > cutoff)
    mid = ev.agg(
        F.expr("percentile(unix_timestamp(ts), 0.7)").alias("c")
    ).first()["c"]
    live1 = live.filter(F.unix_timestamp("ts") <= mid)
    live2 = live.filter(F.unix_timestamp("ts") > mid)

    state_dir = str(tmp_path / "state")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    (tmp_path / "state").mkdir()
    init_anomaly_state(hist, state_dir)

    live1.repartition(2).write.mode("overwrite").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_anomaly_stream(stream, state_dir, sink, ckpt)
        q.awaitTermination(180)
        return q

    run_once()
    # stop/restart boundary: second wave lands, stream resumes on the same
    # checkpoint + state pointer
    live2.repartition(2).write.mode("append").parquet(src)
    run_once()

    # maintained state == from-scratch hourly aggregate (exact)
    state = load_anomaly_state(spark, state_dir)
    full = hourly_stats(ev)
    # restrict to the retained horizon
    mx = state.agg(F.max("hour").alias("m")).first()["m"]
    lo = state.agg(F.min("hour").alias("m")).first()["m"]
    full_kept = full.filter((F.col("hour") >= lo) & (F.col("hour") <= mx))
    s = {(r["event_type"], r["hour"]): r["x"] for r in state.collect()}
    b = {(r["event_type"], r["hour"]): r["x"] for r in full_kept.collect()}
    assert s == b

    # emitted snapshot == batch flags over the same horizon, bit-for-bit
    got = spark.read.parquet(sink)
    expect = anomaly_flags(full_kept)
    assert _flag_set(got) == _flag_set(expect)
    assert got.filter(F.col("anomaly") == 1).count() == expect.filter(
        F.col("anomaly") == 1
    ).count()


def test_anomaly_state_retention_bounds_rows(spark, tmp_path):
    """State never grows past the retention horizon: a batch far in the
    future evicts ancient hours."""
    import datetime

    base = datetime.datetime(2026, 1, 1)
    old = spark.createDataFrame(
        [(base, "click", 1.0)], "ts timestamp, event_type string, value double"
    )
    state_dir = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    init_anomaly_state(old, state_dir)

    future = spark.createDataFrame(
        [(base + datetime.timedelta(days=30), "click", 2.0)],
        "ts timestamp, event_type string, value double",
    )
    src = str(tmp_path / "src")
    future.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(future.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_anomaly_stream(
        stream, state_dir, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    state = load_anomaly_state(spark, state_dir)
    assert state.count() == 1  # the ancient hour evicted
    assert state.first()["hour"].day == (base + datetime.timedelta(days=30)).day
