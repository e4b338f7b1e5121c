"""Row-level diff capture mode (strictly stronger than the reference's
whole-table SNAPSHOT re-emit) + the change log as a streaming source (A8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.sources.changelog import stream_changes


def _engine(spark, tmp_path) -> CdcEngine:
    return CdcEngine(
        spark, output_dir=str(tmp_path / "changes"), state_dir=str(tmp_path / "state")
    )


def test_diff_mode_first_sight_all_inserts(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    captured = eng.poll_once(
        {"region": tables["region"]}, mode="diff", keys={"region": ["r_regionkey"]}
    )
    assert captured == ["region"]
    log = eng.changes("region")
    assert log.count() == tables["region"].count()
    assert log.filter("operation != 'INSERT'").count() == 0


def test_diff_mode_emits_row_level_ops(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    keys = {"nation": ["n_nationkey"]}
    eng.poll_once({"nation": tables["nation"]}, mode="diff", keys=keys)

    mutated = (
        tables["nation"]
        .filter(F.col("n_nationkey") != 3)  # delete key 3
        .withColumn(
            "n_name",
            F.when(F.col("n_nationkey") == 0, F.lit("RENAMED")).otherwise(F.col("n_name")),
        )
    )
    assert eng.poll_once({"nation": mutated}, mode="diff", keys=keys) == ["nation"]

    ops = {
        (r["operation"], r["data"]["n_nationkey"])
        for r in eng.changes("nation").filter("operation != 'INSERT'").collect()
    }
    assert ("DELETE", "3") in ops
    assert ("UPDATE", "0") in ops
    assert len(ops) == 2  # nothing else changed

    # third poll with no change: nothing captured
    assert eng.poll_once({"nation": mutated}, mode="diff", keys=keys) == []


def test_changelog_is_streaming_source(spark, tables, tmp_path):
    """A8: the JSONL change dir consumed by Structured Streaming."""
    eng = _engine(spark, tmp_path)
    eng.poll_once({"region": tables["region"], "nation": tables["nation"]})
    stream = stream_changes(spark, eng.output_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    q = (
        stream.groupBy("table")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("changelog_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r["table"]: r["count"] for r in spark.sql("SELECT * FROM changelog_counts").collect()}
    assert got["region"] == tables["region"].count()
    assert got["nation"] == tables["nation"].count()
