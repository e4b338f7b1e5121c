"""Structured-Streaming operator tests (SURVEY.md §2 H1-H7, F6).

Deterministic drains via availableNow + processAllAvailable — no sleeps
(the reference's timing-based integration test, duckdb_cdc_test.go:159,
done right)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark.streaming.event_windows import (
    dedup_stream,
    enrich_stream,
    session_windows,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tables, tmp_path_factory):
    """Events table re-written as a small parquet dir usable as a stream."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    tables["events"].repartition(4).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(events_dir)


def _drain(df, mode="append", name="sink_tbl"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = _stream(spark, events_dir)
    q = _drain(tumbling_counts(stream), mode="append", name="tumbling_out")
    assert not q.isActive
    got = spark.sql("SELECT * FROM tumbling_out")
    batch = tumbling_counts(spark.read.parquet(events_dir))
    # the final watermark leaves the tail windows unemitted in append mode;
    # every emitted row must equal its batch twin
    emitted = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got.collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert len(emitted) > 0
    for k, v in emitted.items():
        assert expect[k][0] == v[0]
        assert abs(expect[k][1] - v[1]) < 1e-6


def test_sliding_stream_matches_batch(spark, events_dir):
    """Every sliding window the stream emits must carry the exact count the
    batch computation assigns it (append mode withholds only the tail
    windows past the final watermark)."""
    stream = _stream(spark, events_dir)
    q1 = _drain(sliding_counts(stream), name="sliding_out")
    assert not q1.isActive
    emitted = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    expect = {
        r["window_start"]: r["n_events"]
        for r in sliding_counts(spark.read.parquet(events_dir)).collect()
    }
    assert len(emitted) > 0
    for k, v in emitted.items():
        assert expect[k] == v


def test_session_stream_matches_batch(spark, events_dir):
    """Every session the stream finalizes must be exactly a session the
    batch form computes — same start, same key, same event count (append
    mode withholds only sessions not yet closed by the final watermark)."""
    stream2 = _stream(spark, events_dir)
    q2 = _drain(session_windows(stream2), name="session_out")
    assert not q2.isActive
    emitted = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    expect = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in session_windows(spark.read.parquet(events_dir)).collect()
    }
    assert len(emitted) > 0
    for k, v in emitted.items():
        assert expect[k] == v


def test_stream_static_join_enriches(spark, tables, events_dir):
    stream = _stream(spark, events_dir)
    # dimension: user_id → a label (derived deterministic dim)
    dim = tables["events"].select("user_id").distinct().withColumn(
        "user_label", F.concat(F.lit("u"), F.col("user_id"))
    )
    q = _drain(enrich_stream(stream, dim, "user_id"), name="enriched_out")
    assert not q.isActive
    out = spark.sql("SELECT * FROM enriched_out")
    assert out.count() == tables["events"].count()
    assert out.filter(F.col("user_label").isNull()).count() == 0


def test_dedup_stream_bounded_state(spark, tables, events_dir):
    stream = _stream(spark, events_dir)
    deduped = dedup_stream(stream, ["user_id", "event_type"])
    q = _drain(deduped, name="dedup_out")
    assert not q.isActive
    got = spark.sql("SELECT count(*) FROM dedup_out").first()[0]
    exact = tables["events"].select("user_id", "event_type").distinct().count()
    # dropDuplicatesWithinWatermark may re-admit keys whose first sighting
    # expired; with this small time range it should match exact dedup
    assert got >= exact
    assert got <= tables["events"].count()


def test_batch_twins_of_streaming_ops(spark, tables):
    """The same functions accept batch frames — one code path, two modes."""
    ev = tables["events"]
    t = tumbling_counts(ev)
    assert t.count() > 0
    s = session_windows(ev)
    assert s.count() > 0
    d = dedup_stream(ev, ["user_id", "event_type"])
    assert d.count() == ev.select("user_id", "event_type").distinct().count()


def test_stream_stream_interval_join(spark, tables, events_dir):
    from cdc_lite_spark.streaming.event_windows import interval_join_streams

    def side(name, ts_alias, id_alias):
        s = _stream(spark, events_dir)
        return s.filter(F.col("event_type") == name).select(
            "user_id", F.col("ts").alias(ts_alias), F.col("event_id").alias(id_alias)
        )

    clicks = side("click", "l_ts", "click_id")
    purchases = side("purchase", "r_ts", "purchase_id")
    joined = interval_join_streams(clicks, purchases, "user_id", within="2 hours")
    q = _drain(joined, name="ssjoin_out")
    assert not q.isActive

    got = spark.sql("SELECT * FROM ssjoin_out")
    # batch twin over the same frames must agree on the matched pairs
    ev = tables["events"]
    bc = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("click_id")
    )
    bp = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("purchase_id")
    )
    batch = interval_join_streams(bc, bp, "user_id", within="2 hours")
    s_pairs = {(r["click_id"], r["purchase_id"]) for r in got.collect()}
    b_pairs = {(r["click_id"], r["purchase_id"]) for r in batch.collect()}
    assert s_pairs == b_pairs
    assert len(s_pairs) > 0


def test_exactly_once_across_restart(spark, tables, tmp_path):
    """H3: a checkpointed streaming write resumed with the same checkpoint
    does not re-emit already-committed batches (vs the reference's
    at-least-once buffer, duckdb_cdc.go:260-294)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tables["events"].limit(200).repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # restart with same checkpoint: nothing new → no duplicates
    assert spark.read.parquet(out).count() == n1 == 200

    # new files arrive → only the delta is appended
    tables["events"].limit(300).subtract(tables["events"].limit(200)).repartition(
        1
    ).write.mode("append").parquet(src)
    run_once()
    assert spark.read.parquet(out).count() == 300


def test_interval_join_rocksdb_state_store(spark, tables, events_dir):
    """Same stream==batch interval-join equality, but with state backed by
    the RocksDB provider — the store a production deployment uses when
    join/window state outgrows executor heap (r03 verdict #8).  Guards
    against provider-specific divergence in state expiry/lookups."""
    from cdc_lite_spark.streaming.event_windows import interval_join_streams

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def side(name, ts_alias, id_alias):
            s = _stream(spark, events_dir)
            return s.filter(F.col("event_type") == name).select(
                "user_id", F.col("ts").alias(ts_alias), F.col("event_id").alias(id_alias)
            )

        joined = interval_join_streams(
            side("click", "l_ts", "click_id"),
            side("purchase", "r_ts", "purchase_id"),
            "user_id",
            within="2 hours",
        )
        q = _drain(joined, name="ssjoin_rocks_out")
        assert not q.isActive
        got = spark.sql("SELECT * FROM ssjoin_rocks_out")

        ev = tables["events"]
        bc = ev.filter("event_type = 'click'").select(
            "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("click_id")
        )
        bp = ev.filter("event_type = 'purchase'").select(
            "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("purchase_id")
        )
        batch = interval_join_streams(bc, bp, "user_id", within="2 hours")
        s_pairs = {(r["click_id"], r["purchase_id"]) for r in got.collect()}
        b_pairs = {(r["click_id"], r["purchase_id"]) for r in batch.collect()}
        assert s_pairs == b_pairs and len(s_pairs) > 0
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_interval_join_restart_recovers_state(spark, tables, tmp_path):
    """Stop the stream-stream interval join mid-corpus, append the rest of
    the events, restart on the same checkpoint (RocksDB state store): the
    union of emitted pairs equals the batch twin over ALL events — i.e.
    buffered join state (unmatched clicks/purchases near the stop boundary)
    survives the restart and still matches cross-boundary partners.
    Completes the novelty/sketch streams' stop/restart coverage for the
    stream-stream join (r04 verdict #7)."""
    import datetime

    from cdc_lite_spark.streaming.event_windows import interval_join_streams

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        ev = tables["events"].select("user_id", "ts", "event_type", "event_id")
        cutoff = ev.agg(
            F.expr("percentile(unix_timestamp(ts), 0.5)").alias("c")
        ).first()["c"]
        first = ev.filter(F.unix_timestamp("ts") <= cutoff)
        second = ev.filter(F.unix_timestamp("ts") > cutoff)
        first.repartition(2).write.mode("overwrite").parquet(src)

        def run_once():
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(src)
            )

            def side(name, ts_alias, id_alias):
                return stream.filter(F.col("event_type") == name).select(
                    "user_id",
                    F.col("ts").alias(ts_alias),
                    F.col("event_id").alias(id_alias),
                )

            joined = interval_join_streams(
                side("click", "l_ts", "click_id"),
                side("purchase", "r_ts", "purchase_id"),
                "user_id",
                within="2 hours",
            )
            q = (
                joined.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return q

        run_once()
        n_first = spark.read.parquet(out).count()
        second.repartition(2).write.mode("append").parquet(src)
        run_once()

        got = spark.read.parquet(out)
        bc = ev.filter("event_type = 'click'").select(
            "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("click_id")
        )
        bp = ev.filter("event_type = 'purchase'").select(
            "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("purchase_id")
        )
        batch = interval_join_streams(bc, bp, "user_id", within="2 hours")
        s_pairs = {(r["click_id"], r["purchase_id"]) for r in got.collect()}
        b_pairs = {(r["click_id"], r["purchase_id"]) for r in batch.collect()}
        assert s_pairs == b_pairs and len(s_pairs) > 0
        # the restart genuinely produced cross-boundary pairs, not a no-op
        assert len(s_pairs) > n_first
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
