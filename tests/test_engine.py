"""End-to-end CdcEngine tests — the Spark analogue of the reference's
TestChangeDetection (duckdb_cdc_test.go:125-208): mutate → poll → change
records appear in the JSONL log; unchanged tables emit nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine


def _engine(spark, tmp_path) -> CdcEngine:
    return CdcEngine(
        spark, output_dir=str(tmp_path / "changes"), state_dir=str(tmp_path / "state")
    )


def test_first_poll_captures_everything(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    captured = eng.poll_once({"region": tables["region"], "nation": tables["nation"]})
    assert sorted(captured) == ["nation", "region"]
    log = eng.changes()
    assert log.filter("table = 'region'").count() == tables["region"].count()
    assert log.filter("table = 'nation'").count() == tables["nation"].count()
    assert log.filter("operation != 'SNAPSHOT'").count() == 0


def test_unchanged_table_not_recaptured(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.poll_once({"region": tables["region"]})
    assert eng.poll_once({"region": tables["region"]}) == []
    assert eng.changes("region").count() == tables["region"].count()  # no double emit


def test_mutation_detected_on_next_poll(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.poll_once({"region": tables["region"]})
    mutated = tables["region"].withColumn(
        "r_name",
        F.when(F.col("r_regionkey") == 0, F.lit("MUTATED")).otherwise(F.col("r_name")),
    )
    assert eng.poll_once({"region": mutated}) == ["region"]
    assert eng.changes("region").count() == 2 * tables["region"].count()
    names = {
        r["data"]["r_name"] for r in eng.changes("region").collect()
    }
    assert "MUTATED" in names


def test_error_isolation_per_table(spark, tables, tmp_path):
    """H6 — a broken table must not stop the loop (duckdb_cdc.go:116-120)."""
    eng = _engine(spark, tmp_path)
    bad = tables["region"].selectExpr("assert_true(r_regionkey < 0) as boom", "r_name")
    captured = eng.poll_once({"bad": bad, "nation": tables["nation"]})
    assert captured == ["nation"]


def test_streaming_monitor_end_to_end(spark, tables, tmp_path):
    """H1-H5: the rate-source monitor ticks, captures, and stops gracefully."""
    eng = _engine(spark, tmp_path)
    q = eng.monitor({"region": tables["region"]}, interval_seconds=0.5)
    try:
        assert eng.wait_for_changes("region", timeout_s=30)
    finally:
        q.stop()
        q.awaitTermination(30)
    assert eng.changes("region").count() >= tables["region"].count()


def test_external_writer_mutation_detected(spark, tables, tmp_path):
    """The reference's deployment scenario: another process mutates the
    monitored source between polls (duckdb_cdc_test.go:125-208). Here the
    monitored table is a parquet PATH re-read per tick."""
    src = str(tmp_path / "users_src")
    tables["region"].write.mode("overwrite").parquet(src)
    eng = _engine(spark, tmp_path)
    assert eng.poll_once({"region": src}) == ["region"]
    assert eng.poll_once({"region": src}) == []  # no change

    # external writer rewrites the source
    tables["region"].withColumn(
        "r_name", F.concat(F.col("r_name"), F.lit("!"))
    ).write.mode("overwrite").parquet(src)
    assert eng.poll_once({"region": src}) == ["region"]
    names = {r["data"]["r_name"] for r in eng.changes("region").collect()}
    assert any(n.endswith("!") for n in names)


def test_external_duckdb_writer_mutation_detected(spark, tmp_path):
    """The SAME scenario over the DuckDB source.  A DataFrame built once
    freezes at its first action (the plan-time snapshot copy is reused), so
    the monitored source must be a per-tick FACTORY — this is the exact bug
    class where the CLI monitored a .duckdb file and never saw external
    writes."""
    import duckdb

    from cdc_lite_spark.sources.duckdb_source import read_duckdb_table

    db = str(tmp_path / "src.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE users (id INTEGER, name VARCHAR)")
    con.execute("INSERT INTO users VALUES (1,'ada'), (2,'bob')")
    con.close()

    eng = _engine(spark, tmp_path)
    src = {"users": lambda: read_duckdb_table(spark, db, "users")}
    assert eng.poll_once(src, mode="diff", keys={"users": ["id"]}) == ["users"]
    assert eng.poll_once(src, mode="diff", keys={"users": ["id"]}) == []

    # external writer mutates the database between polls
    con = duckdb.connect(db)
    con.execute("UPDATE users SET name='ADA' WHERE id=1")
    con.execute("INSERT INTO users VALUES (3,'eve')")
    con.close()
    assert eng.poll_once(src, mode="diff", keys={"users": ["id"]}) == ["users"]
    ops = {
        (r["operation"], r["data"]["id"]) for r in eng.changes("users").collect()
    }
    assert ("UPDATE", "1") in ops
    assert ("INSERT", "3") in ops


def test_streaming_monitor_diff_mode(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    q = eng.monitor(
        {"region": tables["region"]},
        interval_seconds=0.5,
        mode="diff",
        keys={"region": ["r_regionkey"]},
    )
    try:
        assert eng.wait_for_changes("region", timeout_s=30)
    finally:
        q.stop()
        q.awaitTermination(30)
    assert eng.changes("region").filter("operation = 'INSERT'").count() >= tables[
        "region"
    ].count()


def test_parallel_poll_captures_all(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    captured = eng.poll_once(
        {"region": tables["region"], "nation": tables["nation"], "supplier": tables["supplier"]},
        parallelism=3,
    )
    assert sorted(captured) == ["nation", "region", "supplier"]
    # unchanged second parallel poll is silent
    assert eng.poll_once(
        {"region": tables["region"], "nation": tables["nation"]}, parallelism=2
    ) == []


def test_schema_change_fires_capture(spark, tables, tmp_path):
    """SURVEY §1.3: a pure DDL change also fires a capture — the column list
    feeds the fingerprint expression, so adding a column changes the digest
    even when existing data is untouched (reference emergent behavior,
    duckdb_cdc.go:169-179)."""
    src = str(tmp_path / "src")
    tables["region"].write.mode("overwrite").parquet(src)
    eng = _engine(spark, tmp_path)
    assert eng.poll_once({"region": src}) == ["region"]
    assert eng.poll_once({"region": src}) == []

    # DDL-only change: same rows, one new column with a constant
    tables["region"].withColumn("r_comment", F.lit("n/a")).write.mode(
        "overwrite"
    ).parquet(src)
    assert eng.poll_once({"region": src}) == ["region"]
    latest = eng.changes("region").orderBy(F.desc("timestamp")).first()
    assert "r_comment" in latest["data"]


def test_monitor_inloop_retention_gc(spark, tables, tmp_path):
    """An always-on monitor with retention armed GCs its own log: after the
    arming tick fires, the cold files are folded and the materialized state
    is unchanged (r03 verdict #6, operationalized)."""
    import glob
    import time

    eng = _engine(spark, tmp_path)
    keys = {"region": ["r_regionkey"]}
    # poll a few ticks manually first so there is cold history
    eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys)
    mutated = tables["region"].withColumn(
        "r_name",
        F.when(F.col("r_regionkey") == 1, F.lit("CHANGED")).otherwise(F.col("r_name")),
    )
    eng.poll_once({"region": mutated}, mode="diff", keys=keys)
    before = sorted(map(str, eng.materialize(
        "region", ["r_regionkey"], tables["region"].schema
    ).collect()))
    n_before = len(glob.glob(str(tmp_path / "changes" / "part-*")))
    assert n_before >= 2

    # retention of ~0: everything already written is cold; expire every tick
    q = eng.monitor(
        {"region": mutated},
        interval_seconds=0.5,
        mode="diff",
        keys=keys,
        retention_minutes=0.0,
        expire_every_ticks=1,
    )
    try:
        # generous deadline: under a fully loaded box (whole-suite run) the
        # first monitor tick + expire can take well over a minute; the loop
        # exits the moment the GC lands, so the ceiling only pays on failure
        deadline = time.time() + 120
        while time.time() < deadline:
            if len(glob.glob(str(tmp_path / "changes" / "part-*"))) < n_before:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(30)
    assert len(glob.glob(str(tmp_path / "changes" / "part-*"))) < n_before
    after = sorted(map(str, eng.materialize(
        "region", ["r_regionkey"], tables["region"].schema
    ).collect()))
    assert after == before


def test_poll_once_records_tick_metrics(spark, tmp_path):
    """Every tick appends one metrics row per table: changed/captured
    outcomes, phase latencies, and error text for the isolated-failure
    case — the ops surface the reference lacks."""
    from cdc_lite_spark.engine import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "out"), str(tmp_path / "state"))
    good = spark.createDataFrame([(1, "a")], "id long, v string")

    def boom():
        raise RuntimeError("source exploded")

    eng.poll_once({"good": good, "bad": boom})
    m1 = {r["table_name"]: r for r in eng.metrics().collect()}
    assert m1["good"]["changed"] and m1["good"]["captured"]
    assert m1["good"]["error"] is None and m1["good"]["detect_secs"] >= 0
    assert not m1["bad"]["captured"] and "source exploded" in m1["bad"]["error"]

    # unchanged tick: changed=False row still recorded (heartbeat evidence)
    eng.poll_once({"good": good})
    rows = [r for r in eng.metrics().collect() if r["table_name"] == "good"]
    assert len(rows) == 2
    assert sorted(r["changed"] for r in rows) == [False, True]


def test_capture_fires_on_empty_to_null_flip(spark, tmp_path):
    """End-to-end: the checksum GATE itself must see a ''→NULL flip and fire a
    capture through poll_once (VERDICT r05 "What's wrong" #2 done-criterion)."""
    eng = _engine(spark, tmp_path)
    before = spark.createDataFrame([(1, ""), (2, "b")], "id int, v string")
    after = spark.createDataFrame([(1, None), (2, "b")], "id int, v string")
    assert eng.poll_once({"t": before}) == ["t"]
    assert eng.poll_once({"t": before}) == []  # stable state: no recapture
    assert eng.poll_once({"t": after}) == ["t"]  # the flip fires
