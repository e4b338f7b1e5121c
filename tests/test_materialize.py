"""Log compaction: CdcEngine.materialize reconstructs current state from the
accumulated change log (snapshot + diff records mixed)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine


def test_materialize_after_snapshot_polls(spark, tables, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    eng.poll_once({"nation": nation})
    time.sleep(0.01)  # distinct capture timestamps across polls
    mutated = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 5, F.lit("RENAMED")).otherwise(F.col("n_name")),
    )
    eng.poll_once({"nation": mutated})

    out = eng.materialize("nation", ["n_nationkey"], nation.schema)
    assert out.count() == nation.count()
    assert out.exceptAll(mutated).count() == 0
    assert mutated.exceptAll(out).count() == 0


def test_materialize_across_schema_drift(spark, tables, tmp_path):
    """A log spanning ALTER ADD + DROP (r03 verdict #5): poll 1 captures the
    old schema, poll 2 the drifted one.  Re-typing the map-wire envelope
    against the FINAL schema folds cleanly — pre-drift records read null for
    the ADDed column, the DROPped column vanishes, and last-writer-wins
    yields exactly the drifted table."""
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    eng.poll_once({"nation": nation})
    time.sleep(0.01)
    drifted = (
        nation.withColumn("pop", (F.col("n_nationkey") * 100).cast("long"))
        .drop("n_regionkey")
    )
    # only a subset of rows re-emit after the drift: the fold must combine
    # pre-drift records (null pop) with post-drift ones
    eng.poll_once({"nation": drifted.filter(F.col("n_nationkey") < 10)})

    out = eng.materialize("nation", ["n_nationkey"], drifted.schema)
    assert sorted(out.columns) == sorted(drifted.columns)
    rows = {r["n_nationkey"]: r for r in out.collect()}
    assert len(rows) == nation.count()
    for k, r in rows.items():
        assert r["pop"] == (k * 100 if k < 10 else None)


def test_materialize_with_diff_mode_deletes(spark, tables, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    region = tables["region"]
    keys = {"region": ["r_regionkey"]}
    eng.poll_once({"region": region}, mode="diff", keys=keys)
    time.sleep(0.01)
    shrunk = region.filter(F.col("r_regionkey") != 2)
    eng.poll_once({"region": shrunk}, mode="diff", keys=keys)

    out = eng.materialize("region", ["r_regionkey"], region.schema)
    assert out.count() == shrunk.count()
    assert {r["r_regionkey"] for r in out.collect()} == {
        r["r_regionkey"] for r in shrunk.collect()
    }


def test_materialize_to_writes_skipping_layout(spark, tables, tmp_path):
    """materialize_to persists current state partitioned + sorted: same rows
    as materialize(), one directory per partition value, and coarse filters
    on the partition column become PartitionFilters at read time."""
    import glob

    from cdc_lite_spark.plans.inspect import explain_str

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    eng.poll_once({"nation": nation})
    out_path = str(tmp_path / "nation_state")
    back = eng.materialize_to(
        "nation",
        ["n_nationkey"],
        nation.schema,
        out_path,
        partition_by=["n_regionkey"],
        sort_by=["n_nationkey"],
    )
    assert back.count() == nation.count()
    assert back.exceptAll(nation).count() == 0
    n_regions = nation.select("n_regionkey").distinct().count()
    assert len(glob.glob(f"{out_path}/n_regionkey=*")) == n_regions
    plan = explain_str(back.filter(F.col("n_regionkey") == 2))
    assert any("PartitionFilters" in l and "n_regionkey" in l for l in plan.splitlines())


def test_materialize_as_of_time_travels(spark, tables, tmp_path):
    """Point-in-time reconstruction: materialize(as_of=T) returns the
    table exactly as it stood at T — before later updates and deletes,
    and an as_of predating the log returns empty."""
    import datetime
    import time

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    keys = {"nation": ["n_nationkey"]}
    eng.poll_once({"nation": nation}, mode="diff", keys=keys)
    t1 = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)

    v2 = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 0, F.lit("RENAMED")).otherwise(F.col("n_name")),
    ).filter(F.col("n_nationkey") != 5)
    eng.poll_once({"nation": v2}, mode="diff", keys=keys)

    now = eng.materialize("nation", ["n_nationkey"], nation.schema)
    cur = {r["n_nationkey"]: r["n_name"] for r in now.collect()}
    assert cur[0] == "RENAMED" and 5 not in cur

    past = eng.materialize("nation", ["n_nationkey"], nation.schema, as_of=t1)
    old = {r["n_nationkey"]: r["n_name"] for r in past.collect()}
    assert old[0] != "RENAMED" and 5 in old
    assert len(old) == nation.count()

    epoch = datetime.datetime(2000, 1, 1)
    assert eng.materialize("nation", ["n_nationkey"], nation.schema, as_of=epoch).count() == 0


def test_materialize_snapshot_drops_vanished_keys(spark, tables, tmp_path):
    """Snapshot-mode logs have no DELETE records: latest-per-key would
    resurrect a key missing from the newest capture; materialize_snapshot
    (latest-capture-wins) must not (r5 review)."""
    import datetime
    import time

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    eng.poll_once({"nation": nation})  # snapshot mode
    t1 = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)
    v2 = nation.filter(F.col("n_nationkey") != 5)
    eng.poll_once({"nation": v2})

    out = eng.materialize_snapshot("nation", nation.schema)
    keys = {r["n_nationkey"] for r in out.collect()}
    assert 5 not in keys and len(keys) == nation.count() - 1
    # latest-per-key materialize WOULD resurrect it — the documented gap
    assert 5 in {
        r["n_nationkey"]
        for r in eng.materialize("nation", ["n_nationkey"], nation.schema).collect()
    }
    # as-of time travel back to the first capture
    past = eng.materialize_snapshot("nation", nation.schema, as_of=t1)
    assert {r["n_nationkey"] for r in past.collect()} == {
        r["n_nationkey"] for r in nation.collect()
    }
