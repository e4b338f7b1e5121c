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

    # maintained state == from-scratch hourly aggregate restricted to the
    # per-key row-retention contract (newest `keep` rows per key) — exact
    from pyspark.sql import Window as W

    from cdc_lite_spark.streaming.anomaly_stream import RETENTION_SLACK
    from cdc_lite_spark.operators.anomaly import WINDOW_HOURS

    keep = WINDOW_HOURS + RETENTION_SLACK
    state = load_anomaly_state(spark, state_dir)
    rn = F.row_number().over(W.partitionBy("event_type").orderBy(F.desc("hour")))
    full_kept = (
        hourly_stats(ev).withColumn("__rn", rn).filter(F.col("__rn") <= keep).drop("__rn")
    )
    s = {(r["event_type"], r["hour"]): r["x"] for r in state.collect()}
    b = {(r["event_type"], r["hour"]): r["x"] for r in full_kept.collect()}
    assert s == b

    # emitted snapshot == batch flags over the same retained rows, bit-for-bit
    got = spark.read.parquet(sink)
    expect = anomaly_flags(full_kept)
    assert _flag_set(got) == _flag_set(expect)
    assert got.filter(F.col("anomaly") == 1).count() == expect.filter(
        F.col("anomaly") == 1
    ).count()


def test_anomaly_state_retention_is_per_key_and_row_based(spark, tmp_path):
    """Each key keeps its newest `retention_rows` hourly rows — a busy key
    is trimmed while a sparse/idle key keeps all its frame rows (a global
    hour horizon would erase it; r5 review)."""
    import datetime

    base = datetime.datetime(2026, 1, 1)
    hist = spark.createDataFrame(
        [(base, "sparse", 1.0)], "ts timestamp, event_type string, value double"
    )
    state_dir = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    init_anomaly_state(hist, state_dir)

    busy = spark.createDataFrame(
        [
            (base + datetime.timedelta(hours=h), "busy", float(h))
            for h in range(60)
        ],
        "ts timestamp, event_type string, value double",
    )
    src = str(tmp_path / "src")
    busy.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(busy.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_anomaly_stream(
        stream, state_dir, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    state = load_anomaly_state(spark, state_dir)
    by_key = {r["event_type"]: r["count"] for r in state.groupBy("event_type").count().collect()}
    assert by_key["busy"] == 48  # trimmed to WINDOW_HOURS + RETENTION_SLACK
    assert by_key["sparse"] == 1  # idle key NOT erased


def test_anomaly_stream_empty_epoch_keeps_version_chain(spark, tmp_path):
    """An empty micro-batch must still commit v{e+1}: the replay fallback
    reads v{e}, and a missing link lets a replayed later epoch double-fold
    (r5 review)."""
    import datetime
    import os

    base = datetime.datetime(2026, 1, 1)
    hist = spark.createDataFrame(
        [(base, "k", 1.0)], "ts timestamp, event_type string, value double"
    )
    state_dir = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    init_anomaly_state(hist, state_dir)

    src = str(tmp_path / "src")
    os.makedirs(src)
    # an empty parquet dir -> first micro-batch is empty
    spark.createDataFrame([], hist.schema).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(hist.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_anomaly_stream(
        stream, state_dir, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    # the empty epoch committed a new version and the state is unchanged
    from cdc_lite_spark.streaming._state import current

    assert current(state_dir) != "v0"
    assert load_anomaly_state(spark, state_dir).count() == 1


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
