"""DuckDB-file data source tests — full reference parity: monitor tables
inside a .duckdb file, detect external mutations, capture change records
(the reference's TestChangeDetection scenario, duckdb_cdc_test.go:125-208,
minus the sleeps)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.sources.duckdb_source import read_duckdb_table


@pytest.fixture
def users_db(tmp_path):
    """The reference's fixture schema + seed rows (scripts/setup.sql:5-15)."""
    path = str(tmp_path / "app.duckdb")
    con = duckdb.connect(path)
    con.execute(
        """CREATE TABLE users (
               id INTEGER PRIMARY KEY, name VARCHAR, email VARCHAR,
               created_at TIMESTAMP DEFAULT '2024-01-01 00:00:00')"""
    )
    con.execute(
        "INSERT INTO users (id, name, email) VALUES "
        "(1, 'John Doe', 'john@example.com'), (2, 'Jane Smith', 'jane@example.com')"
    )
    con.close()
    return path


def test_read_duckdb_table(spark, users_db):
    df = read_duckdb_table(spark, users_db, "users")
    assert set(df.columns) == {"id", "name", "email", "created_at"}
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {1: "John Doe", 2: "Jane Smith"}
    assert dict(df.dtypes)["id"] == "int"
    assert dict(df.dtypes)["created_at"] == "timestamp_ntz"


def test_partitioned_read(spark, users_db):
    con = duckdb.connect(users_db)
    con.execute(
        "INSERT INTO users (id, name, email) "
        "SELECT i, 'u' || i, 'u' || i || '@x.com' FROM range(10, 500) t(i)"
    )
    con.close()
    df = read_duckdb_table(spark, users_db, "users", partitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 492
    assert df.select(F.countDistinct("id")).first()[0] == 492


def test_partitioned_read_after_deletes(spark, users_db):
    """DuckDB rowids are physical and keep gaps after DELETEs, so partition
    ranges bounded by count(*) silently truncate; ranges must span
    min(rowid)..max(rowid)+1 (ADVICE r01, high)."""
    con = duckdb.connect(users_db)
    con.execute(
        "INSERT INTO users (id, name, email) "
        "SELECT i, 'u' || i, 'u' || i || '@x.com' FROM range(10, 130) t(i)"
    )
    con.execute("DELETE FROM users WHERE id % 2 = 0 AND id >= 10")  # punch gaps
    n_expected = con.execute("SELECT count(*) FROM users").fetchone()[0]
    max_rowid = con.execute("SELECT max(rowid) FROM users").fetchone()[0]
    con.close()
    assert max_rowid + 1 > n_expected  # the fixture really has gaps

    df = read_duckdb_table(spark, users_db, "users", partitions=8)
    assert df.count() == n_expected
    assert df.select(F.countDistinct("id")).first()[0] == n_expected


def test_partitioned_scan_is_one_consistent_snapshot(spark, users_db):
    """snapshot=true must copy the file ONCE per scan (at plan time) and have
    every task read that copy — per-task copies taken at different times see
    different writer states (ADVICE r01, medium).  The copy lands next to
    the source (shared-FS visible); count the copies the scan left behind.
    (partitions() runs in a Python worker process, so this is asserted on
    the filesystem, not via monkeypatch.)"""
    import os

    d = os.path.dirname(users_db)
    df = read_duckdb_table(spark, users_db, "users", partitions=8)
    assert df.count() == 2
    snaps = [f for f in os.listdir(d) if ".cdcsnap." in f]
    assert len(snaps) == 1  # one copy per scan plan, shared by all 8 tasks

    # a second scan GCs the first scan's copy and makes exactly one of its own
    assert df.count() == 2
    snaps = [f for f in os.listdir(d) if ".cdcsnap." in f]
    assert len(snaps) == 1


def test_cdc_over_duckdb_file(spark, users_db, tmp_path):
    """insert → poll → change captured; unchanged → silent (the reference's
    end-to-end loop over an actual DuckDB file)."""
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    users = lambda: read_duckdb_table(spark, users_db, "users")  # noqa: E731

    assert eng.poll_once({"users": users()}) == ["users"]
    assert eng.poll_once({"users": users()}) == []

    # external writer inserts Bob (duckdb_cdc_test.go:149-152)
    con = duckdb.connect(users_db)
    con.execute(
        "INSERT INTO users (id, name, email) VALUES (3, 'Bob Wilson', 'bob@example.com')"
    )
    con.close()

    assert eng.poll_once({"users": users()}) == ["users"]
    log = eng.changes("users")
    assert log.count() == 2 + 3  # first snapshot + re-snapshot
    names = {r["data"]["name"] for r in log.collect()}
    assert "Bob Wilson" in names
    assert log.filter("operation != 'SNAPSHOT'").count() == 0


def test_snapshot_copy_reads_while_writer_holds_lock(spark, users_db):
    """A4: the copy-then-read path must succeed while another connection
    holds the write lock (the reason the reference copies the file)."""
    writer = duckdb.connect(users_db)  # holds the write lock
    try:
        df = read_duckdb_table(spark, users_db, "users")
        assert df.count() == 2
    finally:
        writer.close()


def test_streaming_incremental_append_capture(spark, users_db):
    """spark.readStream over the DuckDB file: each micro-batch carries only
    the rows appended since the last offset — incremental CDC the reference
    cannot do (it re-emits whole tables)."""
    from cdc_lite_spark.sources.duckdb_source import register_duckdb_source

    register_duckdb_source(spark)
    stream = (
        spark.readStream.format("duckdb")
        .option("path", users_db)
        .option("table", "users")
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("duck_incr")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) FROM duck_incr").first()[0] == 2

        con = duckdb.connect(users_db)
        con.execute(
            "INSERT INTO users (id, name, email) VALUES (3, 'Bob Wilson', 'bob@example.com')"
        )
        con.close()
        q.processAllAvailable()
        rows = {r["id"]: r["name"] for r in spark.sql("SELECT * FROM duck_incr").collect()}
        # only the delta arrived: 3 total rows, not 2 + 3 re-emitted
        assert rows == {1: "John Doe", 2: "Jane Smith", 3: "Bob Wilson"}
        assert spark.sql("SELECT count(*) FROM duck_incr").first()[0] == 3
    finally:
        q.stop()
        q.awaitTermination(30)


# --- tick-consistent multi-table snapshots ---------------------------------


@pytest.fixture
def two_table_db(tmp_path):
    path = str(tmp_path / "shop.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE customers (id INTEGER, name VARCHAR)")
    con.execute("CREATE TABLE orders (id INTEGER, cust_id INTEGER)")
    con.execute("INSERT INTO customers VALUES (1, 'a')")
    con.execute("INSERT INTO orders VALUES (10, 1)")
    con.close()
    return path


def test_consistent_source_pins_tables_to_one_tick_copy(spark, two_table_db):
    """A writer transaction landing between two table reads of the same
    tick must be invisible to BOTH (the reference's one-copy-per-tick
    model, duckdb_cdc.go:100-124) — per-scan snapshots would show orders
    referencing a customer the same tick's customers read doesn't have."""
    from cdc_lite_spark.sources.duckdb_source import ConsistentSnapshotSource

    prov = ConsistentSnapshotSource(spark, two_table_db, partitions=1)
    srcs = prov.sources(["customers", "orders"])
    prov.begin_tick()
    n_cust = srcs["customers"]().count()
    # cross-table write AFTER the customers read, within the same tick
    con = duckdb.connect(two_table_db)
    con.execute("INSERT INTO customers VALUES (2, 'b')")
    con.execute("INSERT INTO orders VALUES (11, 2)")
    con.close()
    assert srcs["orders"]().count() == 1  # same copy: write invisible
    assert n_cust == 1
    # next tick observes the committed write in BOTH tables
    prov.begin_tick()
    assert srcs["customers"]().count() == 2
    assert srcs["orders"]().count() == 2
    prov.close()


def test_poll_once_advances_provider_per_tick(spark, tmp_path, two_table_db):
    """CdcEngine.poll_once drives begin_tick() itself: captures across two
    ticks see the pre- and post-write versions, and exactly one tick copy
    file exists at a time."""
    import glob
    import os

    from cdc_lite_spark.sources.duckdb_source import ConsistentSnapshotSource

    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "out"),
        state_dir=str(tmp_path / "state"),
    )
    prov = ConsistentSnapshotSource(spark, two_table_db, partitions=1)
    srcs = prov.sources(["customers", "orders"])
    assert sorted(eng.poll_once(srcs)) == ["customers", "orders"]
    con = duckdb.connect(two_table_db)
    con.execute("INSERT INTO orders VALUES (12, 1)")
    con.close()
    assert eng.poll_once(srcs) == ["orders"]  # only orders changed
    copies = glob.glob(two_table_db + ".cdctick.*")
    assert len(copies) == 1  # previous tick's copy was GC'd
    prov.close()
    assert not os.path.exists(copies[0])


def test_poll_partitions_advances_provider(spark, tmp_path, two_table_db):
    """Partition-captured DuckDB tables must not freeze on their first
    tick copy: poll_partitions advances the provider too (review r7)."""
    from cdc_lite_spark.sources.duckdb_source import ConsistentSnapshotSource

    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "out"),
        state_dir=str(tmp_path / "state"),
    )
    prov = ConsistentSnapshotSource(spark, two_table_db, partitions=1)
    src = prov.table("orders")
    first = eng.poll_partitions("orders", src, "cust_id")
    assert first["drifted"]  # initial capture
    con = duckdb.connect(two_table_db)
    con.execute("INSERT INTO orders VALUES (13, 9)")
    con.close()
    second = eng.poll_partitions("orders", src, "cust_id")
    assert "9" in second["drifted"]  # new tick copy observed the write
    prov.close()


def test_begin_tick_sweeps_crash_orphans(spark, two_table_db):
    """Copies left by a killed run (atexit never fired) are GC'd on the
    next begin_tick; the provider's own live copy survives."""
    import os

    from cdc_lite_spark.sources.duckdb_source import ConsistentSnapshotSource

    orphan = two_table_db + ".cdctick.deadbeef"
    with open(orphan, "wb") as f:
        f.write(b"stale")
    prov = ConsistentSnapshotSource(spark, two_table_db, partitions=1)
    live = prov.begin_tick()
    assert not os.path.exists(orphan)
    assert os.path.exists(live)
    prov.close()
