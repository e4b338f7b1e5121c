"""Small-file compaction (operators/maintenance.py): fewer files, identical
data, crash-safe swap, no-op guards."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_lite_spark.operators.maintenance import compact_parquet, dir_stats


def _fragmented(spark, tmp_path, n_files=24):
    path = str(tmp_path / "frag")
    df = spark.range(0, 12_000).withColumn("v", F.col("id") * 2)
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path, df


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    path, df = _fragmented(spark, tmp_path)
    n0, _ = dir_stats(spark, path)
    assert n0 >= 24
    report = compact_parquet(spark, path, target_file_mb=128)
    assert report["skipped"] is False
    assert report["files_after"] < n0
    back = spark.read.parquet(path)
    assert back.count() == 12_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # no leftover staging dirs
    assert not os.path.exists(path + ".compact.tmp")
    assert not os.path.exists(path + ".old")


def test_compaction_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(10).coalesce(1).write.parquet(path)
    report = compact_parquet(spark, path)
    assert report["skipped"] is True
    assert report["files_after"] == report["files_before"]


def test_compaction_idempotent(spark, tmp_path):
    path, _ = _fragmented(spark, tmp_path)
    r1 = compact_parquet(spark, path, target_file_mb=128)
    r2 = compact_parquet(spark, path, target_file_mb=128)
    assert r1["skipped"] is False and r2["skipped"] is True
    assert spark.read.parquet(path).count() == 12_000


# ---------------------------------------------------------------------------
# change-log retention GC (sources/changelog.py:expire_changelog)
# ---------------------------------------------------------------------------


def _poll_ticks(spark, tables, tmp_path, n_mutations=3):
    """Drive the engine through several diff-mode ticks to accumulate
    change files, returning (engine, final_table_df, keys)."""
    import time

    from cdc_lite_spark import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    keys = {"nation": ["n_nationkey"]}
    cur = nation
    eng.poll_once({"nation": cur}, mode="diff", keys=keys)
    for i in range(n_mutations):
        time.sleep(0.02)
        if i == 1:
            cur = cur.filter(F.col("n_nationkey") != 3)  # a DELETE mid-log
        else:
            cur = cur.withColumn(
                "n_name",
                F.when(
                    F.col("n_nationkey") == i, F.concat(F.col("n_name"), F.lit("!"))
                ).otherwise(F.col("n_name")),
            )
        eng.poll_once({"nation": cur}, mode="diff", keys=keys)
    return eng, cur, keys


def test_expire_changelog_materialize_unchanged(spark, tables, tmp_path):
    """GC below a watermark covering the whole log: files shrink to the one
    folded segment, materialize reconstructs the same state, and the DELETE
    tombstone is released."""
    import datetime

    eng, cur, keys = _poll_ticks(spark, tables, tmp_path)
    before = eng.materialize("nation", ["n_nationkey"], tables["nation"].schema)
    before_rows = {r["n_nationkey"]: r for r in before.collect()}
    files_before = len(
        [p for p in (tmp_path / "log").glob("part-*") if p.is_file()]
    )
    assert files_before >= 3

    report = eng.expire_log(datetime.datetime.now() + datetime.timedelta(days=1), keys)
    assert report["skipped"] is False
    assert report["files_deleted"] == report["files_expired"] == files_before

    after = eng.materialize("nation", ["n_nationkey"], tables["nation"].schema)
    after_rows = {r["n_nationkey"]: r for r in after.collect()}
    assert after_rows.keys() == before_rows.keys()
    for k in after_rows:
        assert after_rows[k] == before_rows[k]
    # folded: at most one record per surviving key (+ none for the deleted)
    log = eng.changes("nation")
    assert log.filter(F.col("operation") == "DELETE").count() == 0
    assert log.groupBy(F.col("data").getItem("n_nationkey")).count().agg(
        F.max("count")
    ).first()[0] == 1


def test_expire_changelog_watermark_preserves_young_files(spark, tables, tmp_path):
    """A mid-log watermark folds only wholly-cold files; records at or after
    the watermark keep their full per-record history."""
    import datetime
    import time

    eng, cur, keys = _poll_ticks(spark, tables, tmp_path, n_mutations=2)
    wm = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)
    # one young tick after the watermark
    cur2 = cur.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 7, F.lit("YOUNG")).otherwise(F.col("n_name")),
    )
    eng.poll_once({"nation": cur2}, mode="diff", keys=keys)

    young_before = eng.changes("nation").filter(F.col("timestamp") >= wm).collect()
    report = eng.expire_log(wm, keys)
    assert report["skipped"] is False
    assert report["files_expired"] >= 1
    young_after = eng.changes("nation").filter(F.col("timestamp") >= wm).collect()
    assert sorted(map(str, young_before)) == sorted(map(str, young_after))
    out = eng.materialize("nation", ["n_nationkey"], tables["nation"].schema)
    assert {r["n_nationkey"]: r["n_name"] for r in out.collect()}[7] == "YOUNG"


def test_expire_changelog_distributed_path_many_files(spark, tables, tmp_path):
    """collect_max_files=0 forces the 10^7-file code path — cold selection
    via semi-join and deletion via streamed iterator, no driver-side path
    list — and it must behave identically to the collected path: young
    records untouched, cold files folded + deleted, materialize unchanged,
    and the just-written folded segment never self-selected for deletion."""
    import datetime
    import time

    eng, cur, keys = _poll_ticks(spark, tables, tmp_path, n_mutations=4)
    before = eng.materialize("nation", ["n_nationkey"], tables["nation"].schema)
    before_rows = sorted(map(str, before.collect()))
    wm = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)
    cur2 = cur.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 9, F.lit("YOUNG")).otherwise(F.col("n_name")),
    )
    eng.poll_once({"nation": cur2}, mode="diff", keys=keys)

    report = eng.expire_log(wm, keys, collect_max_files=0)
    assert report["skipped"] is False
    assert report["files_expired"] >= 4
    assert report["files_deleted"] == report["files_expired"]

    # the folded segment written by THIS run is wholly pre-watermark — a
    # re-listing bug would have deleted it; prove it survived
    assert eng.changes("nation").filter(F.col("timestamp") < wm).count() > 0
    after = eng.materialize("nation", ["n_nationkey"], tables["nation"].schema)
    got = {r["n_nationkey"]: r["n_name"] for r in after.collect()}
    assert got[9] == "YOUNG"
    base = {r["n_nationkey"]: r for r in before.collect()}
    for k, row in base.items():
        if k != 9:
            assert got[k] == row["n_name"]
    # a second distributed-path run folds the leftover cold segment again
    # without disturbing state (idempotent under re-run)
    report2 = eng.expire_log(wm, keys, collect_max_files=0)
    after2 = eng.materialize("nation", ["n_nationkey"], tables["nation"].schema)
    assert sorted(map(str, after2.collect())) == sorted(map(str, after.collect()))


def test_expire_changelog_noop_when_all_young(spark, tables, tmp_path):
    import datetime

    eng, _, keys = _poll_ticks(spark, tables, tmp_path, n_mutations=1)
    report = eng.expire_log(
        datetime.datetime.now() - datetime.timedelta(days=1), keys
    )
    assert report["skipped"] is True


def test_expire_changelog_partitioned_layout(spark, tables, tmp_path):
    """A table=<name>/ partitioned log GCs within its layout: the folded
    segment lands partitioned too, and reads stay correct."""
    import datetime
    import glob
    import time

    from cdc_lite_spark.envelope import snapshot_envelope
    from cdc_lite_spark.sources.changelog import (
        append_changes,
        expire_changelog,
        read_changes,
    )

    log = str(tmp_path / "plog")
    env1 = snapshot_envelope(tables["region"], "region")
    env2 = snapshot_envelope(tables["nation"], "nation")
    append_changes(env1, log, partition_by_table=True)
    time.sleep(0.01)
    append_changes(env2, log, partition_by_table=True)
    n_before = read_changes(spark, log).count()
    assert n_before == tables["region"].count() + tables["nation"].count()

    report = expire_changelog(
        spark,
        log,
        datetime.datetime.now() + datetime.timedelta(days=1),
        {"region": ["r_regionkey"], "nation": ["n_nationkey"]},
    )
    assert report["skipped"] is False
    # layout stayed partitioned: no flat part files at the root
    assert glob.glob(f"{log}/part-*") == []
    assert glob.glob(f"{log}/table=region/part-*")
    back = read_changes(spark, log)
    assert back.count() == n_before  # one SNAPSHOT per key survives the fold
    assert set(r["table"] for r in back.select("table").distinct().collect()) == {
        "region",
        "nation",
    }


def test_changes_between_above_watermark_survives_gc(spark, tables, tmp_path):
    """The CDF contract under retention: a `changes_between` window that
    lies entirely ABOVE the GC watermark returns exactly the same records
    before and after `expire_log` — only pre-watermark history is folded.
    (A window reaching below the watermark reads the compacted latest-only
    segment; consumers resuming from a checkpoint are above it by
    construction.)"""
    import datetime
    import time

    from cdc_lite_spark import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    keys = {"nation": ["n_nationkey"]}
    eng.poll_once({"nation": nation}, mode="diff", keys=keys)
    time.sleep(1.1)
    watermark = datetime.datetime.now()
    time.sleep(1.1)
    mutated = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 7, F.lit("POST_WM")).otherwise(F.col("n_name")),
    )
    eng.poll_once({"nation": mutated}, mode="diff", keys=keys)

    far_future = datetime.datetime(2100, 1, 1)
    before = sorted(
        (r["operation"], r["data"]["n_nationkey"], r["data"]["n_name"])
        for r in eng.changes_between(watermark, far_future, "nation").collect()
    )
    assert before == [("UPDATE", "7", "POST_WM")]

    report = eng.expire_log(watermark, keys)
    assert report["skipped"] is False and report["files_deleted"] >= 1

    after = sorted(
        (r["operation"], r["data"]["n_nationkey"], r["data"]["n_name"])
        for r in eng.changes_between(watermark, far_future, "nation").collect()
    )
    assert after == before


def test_expire_crash_between_fold_and_delete_is_harmless(spark, tables, tmp_path):
    """The documented crash contract: a crash AFTER the folded segment is
    appended but BEFORE the cold files are deleted leaves duplicate cold
    records — materialize must be unchanged (latest-per-key is idempotent)
    and the next expire run cleans the duplicates."""
    import datetime

    from cdc_lite_spark.operators.latest import latest_per_key

    eng, cur, keys = _poll_ticks(spark, tables, tmp_path)
    before = sorted(
        map(str, eng.materialize("nation", ["n_nationkey"], tables["nation"].schema).collect())
    )

    # simulate the crash by appending the fold WITHOUT deleting the originals
    from cdc_lite_spark.sources.changelog import append_changes

    log = eng.changes("nation").filter(F.col("operation") != "SCHEMA")
    keyed = log.withColumn("__k", F.col("data").getItem("n_nationkey"))
    folded = latest_per_key(keyed, ["__k"], ["timestamp"], via_agg=True).select(
        "timestamp", "table", "operation", "data"
    ).filter(F.col("operation") != "DELETE")
    append_changes(folded, str(tmp_path / "log"))

    mid = sorted(
        map(str, eng.materialize("nation", ["n_nationkey"], tables["nation"].schema).collect())
    )
    assert mid == before  # duplicates are invisible to materialize

    # the next (successful) expire cleans everything into one segment
    report = eng.expire_log(
        datetime.datetime.now() + datetime.timedelta(days=1), keys
    )
    assert report["skipped"] is False
    after = sorted(
        map(str, eng.materialize("nation", ["n_nationkey"], tables["nation"].schema).collect())
    )
    assert after == before


def test_expire_watermark_timezone_aware_converts_to_utc(spark, tables, tmp_path):
    """An AWARE watermark converts to UTC (r5 review: a bare tzinfo strip
    kept foreign wall-clock digits and shifted the boundary by the zone
    offset — east-of-UTC hosts would fold files written seconds ago)."""
    import datetime

    eng, _cur, keys = _poll_ticks(spark, tables, tmp_path, n_mutations=1)
    # a watermark expressed in UTC+9 whose UTC instant is one day in the
    # past: nothing in the just-written log is cold
    tokyo = datetime.timezone(datetime.timedelta(hours=9))
    wm = datetime.datetime.now(tokyo) - datetime.timedelta(days=1)
    report = eng.expire_log(wm, keys)
    assert report["skipped"] is True  # naive-strip would have folded it all

    # and an aware watermark one day in the FUTURE folds everything,
    # exactly like its naive-UTC equivalent
    wm2 = datetime.datetime.now(tokyo) + datetime.timedelta(days=1)
    report2 = eng.expire_log(wm2, keys)
    assert report2["skipped"] is False
