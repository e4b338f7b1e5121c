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


def test_diff_mode_writes_snapshot_once_per_tick(spark, tables, tmp_path):
    """r01 VERDICT #3: each tick must persist the snapshot with ONE write job
    (versioned dir + _SUCCESS commit marker), not write-.next-then-rewrite.
    Asserted on the filesystem: every tick adds exactly one new v=N dir, no
    .next staging dir ever exists, and old versions are GC'd."""
    import os

    eng = _engine(spark, tmp_path)
    keys = {"nation": ["n_nationkey"]}
    snap_root = str(tmp_path / "state" / "snapshots" / "nation")

    eng.poll_once({"nation": tables["nation"]}, mode="diff", keys=keys)
    assert sorted(os.listdir(snap_root)) == ["v=1"]
    assert not os.path.exists(snap_root + ".next")

    mutated = tables["nation"].withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 0, F.lit("RENAMED")).otherwise(F.col("n_name")),
    )
    eng.poll_once({"nation": mutated}, mode="diff", keys=keys)
    assert sorted(os.listdir(snap_root)) == ["v=1", "v=2"]

    mutated2 = mutated.filter(F.col("n_nationkey") != 5)
    eng.poll_once({"nation": mutated2}, mode="diff", keys=keys)
    # keep = 2: v=1 GC'd, v=2 (previous) and v=3 (current) remain
    assert sorted(os.listdir(snap_root)) == ["v=2", "v=3"]
    assert not os.path.exists(snap_root + ".next")

    # the surviving current snapshot is the correct state
    cur = spark.read.parquet(snap_root + "/v=3")
    assert cur.count() == tables["nation"].count() - 1


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


def test_key_churn_reports_hot_keys(spark, tables, tmp_path):
    """key_churn counts per-key change records with the latest operation —
    the hot-key observability downstream merge planning needs."""
    import time

    from cdc_lite_spark import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    region = tables["region"]
    keys = {"region": ["r_regionkey"]}
    cur = region
    eng.poll_once({"region": cur}, mode="diff", keys=keys)
    # key 2 churns twice; key 4 is deleted
    for new_name in ("X", "Y"):
        time.sleep(0.02)
        cur = cur.withColumn(
            "r_name",
            F.when(F.col("r_regionkey") == 2, F.lit(new_name)).otherwise(
                F.col("r_name")
            ),
        )
        eng.poll_once({"region": cur}, mode="diff", keys=keys)
    time.sleep(0.02)
    cur = cur.filter(F.col("r_regionkey") != 4)
    eng.poll_once({"region": cur}, mode="diff", keys=keys)

    churn = {
        int(r["r_regionkey"]): r
        for r in eng.key_churn("region", ["r_regionkey"]).collect()
    }
    assert churn[2]["n_changes"] == 3  # initial INSERT + 2 UPDATEs
    assert churn[2]["last_operation"] == "UPDATE"
    assert churn[4]["n_changes"] == 2  # initial INSERT + DELETE
    assert churn[4]["last_operation"] == "DELETE"
    assert churn[0]["n_changes"] == 1 and churn[0]["last_operation"] == "INSERT"
    assert churn[2]["last_seen"] >= churn[2]["first_seen"]
