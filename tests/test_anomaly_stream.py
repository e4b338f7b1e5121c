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


def test_constant_series_never_flags_and_real_spike_does(spark):
    """Regression (r5 review): the float formulation computed a slightly
    NEGATIVE variance on constant series (decimal-rounded sxx vs
    full-precision mean²) and flagged every eligible hour.  The exact
    denominator-cleared test must flag zero hours of a constant series —
    for values that exercised the bug — and still flag a genuine spike on
    a constant history."""
    import datetime

    base = datetime.datetime(2026, 1, 1)
    for v in (123.456789, 0.000123, 99999.9):
        rows = [
            (base + datetime.timedelta(hours=h), "click", v) for h in range(40)
        ]
        ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        out = anomaly_flags(hourly_stats(ev))
        assert out.filter(F.col("anomaly") == 1).count() == 0, v

    spike = [
        (base + datetime.timedelta(hours=h), "click", 10.0) for h in range(30)
    ] + [(base + datetime.timedelta(hours=30), "click", 1000.0)]
    ev = spark.createDataFrame(spike, "ts timestamp, event_type string, value double")
    flagged = anomaly_flags(hourly_stats(ev)).filter(F.col("anomaly") == 1).collect()
    assert len(flagged) == 1
    assert flagged[0]["hour"] == base + datetime.timedelta(hours=30)
