"""applyInPandasWithState checksum-change detector (SURVEY.md §2 H2)."""

from __future__ import annotations

from datetime import datetime

from cdc_lite_spark.streaming.stateful import OBSERVATION_SCHEMA, checksum_change_stream


def _obs(spark, rows, tmp_path, name):
    d = str(tmp_path / name)
    spark.createDataFrame(
        [(t, c, datetime(2024, 1, 1, 0, 0, s)) for t, c, s in rows], OBSERVATION_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)
    return spark.readStream.schema(OBSERVATION_SCHEMA).parquet(d)


def test_stateful_change_detection(spark, tmp_path):
    rows = [
        ("users", "aaa", 0),   # first sight → emit
        ("users", "aaa", 1),   # unchanged → silent
        ("users", "bbb", 2),   # drift → emit
        ("users", "bbb", 3),   # unchanged → silent
        ("orders", "xxx", 0),  # first sight (independent key) → emit
    ]
    stream = _obs(spark, rows, tmp_path, "obs1")
    q = (
        checksum_change_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("state_changes")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["table"], r["checksum"]): r
        for r in spark.sql("SELECT * FROM state_changes").collect()
    }
    assert set(got) == {("users", "aaa"), ("users", "bbb"), ("orders", "xxx")}
    assert got[("users", "aaa")]["first_sight"] is True
    assert got[("users", "aaa")]["prev_checksum"] is None
    assert got[("users", "bbb")]["first_sight"] is False
    assert got[("users", "bbb")]["prev_checksum"] == "aaa"
    # observation counter folded through state
    assert got[("users", "bbb")]["n_observations"] == 3


def test_tws_detector_matches_legacy(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 API) must emit the same change
    events as the applyInPandasWithState detector.

    The TWS python runner needs google.protobuf (not shipped in every
    environment) — skip, not fail, where it's absent; the operator itself
    is importable everywhere.
    """
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithState runner requires google.protobuf")
    from cdc_lite_spark.streaming.stateful import checksum_change_stream_tws

    rows = [
        ("users", "aaa", 0),
        ("users", "aaa", 1),
        ("users", "bbb", 2),
        ("orders", "xxx", 0),
        ("orders", "xxx", 1),
    ]
    stream = _obs(spark, rows, tmp_path, "obs_tws")
    q = (
        checksum_change_stream_tws(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_changes")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["table"], r["checksum"]): r
        for r in spark.sql("SELECT * FROM tws_changes").collect()
    }
    assert set(got) == {("users", "aaa"), ("users", "bbb"), ("orders", "xxx")}
    assert got[("users", "bbb")]["prev_checksum"] == "aaa"
    assert got[("users", "bbb")]["n_observations"] == 3
    assert got[("orders", "xxx")]["first_sight"] is True
