"""Partition-gated capture (CdcEngine.poll_partitions) — the SURVEY §4
refinement: only drifted partitions re-emit; vanished partitions tombstone;
materialize_partitions reconstructs exactly the current table."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine


def _counts_by_type(df):
    return {r["event_type"]: r["count"] for r in df.groupBy("event_type").count().collect()}


def test_partition_capture_reemits_only_drifted(spark, tables, tmp_path):
    import time

    ev = tables["events"].select("event_id", "event_type", "user_id", "value")
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))

    # tick 1: everything is new -> every partition captured
    r1 = eng.poll_partitions("events", ev, "event_type")
    all_types = set(_counts_by_type(ev))
    assert set(r1["drifted"]) == all_types and not r1["dropped"]
    n_after_1 = eng.changes("events").count()
    assert n_after_1 == ev.count()

    # tick 2: unchanged -> nothing captured at all
    time.sleep(0.05)
    r2 = eng.poll_partitions("events", ev, "event_type")
    assert r2["skipped"] is True
    assert eng.changes("events").count() == n_after_1

    # tick 3: mutate ONE partition -> only its rows re-emit
    time.sleep(0.05)
    victim = sorted(all_types)[0]
    mutated = ev.withColumn(
        "value",
        F.when(F.col("event_type") == victim, F.col("value") + 1).otherwise(
            F.col("value")
        ),
    )
    r3 = eng.poll_partitions("events", mutated, "event_type")
    assert r3["drifted"] == [victim] and not r3["dropped"]
    n_victim = _counts_by_type(ev)[victim]
    assert eng.changes("events").count() == n_after_1 + n_victim

    # reconstruction equals the current table exactly
    out = eng.materialize_partitions("events", "event_type", mutated.schema)
    assert sorted(map(str, out.collect())) == sorted(map(str, mutated.collect()))


def test_partition_capture_drop_and_reappear(spark, tables, tmp_path):
    import time

    ev = tables["events"].select("event_id", "event_type", "value")
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    eng.poll_partitions("events", ev, "event_type")
    victim = sorted(_counts_by_type(ev))[0]

    # drop one partition -> one PARTITION_DELETE marker, no row re-emits
    time.sleep(0.05)
    without = ev.filter(F.col("event_type") != victim)
    r = eng.poll_partitions("events", without, "event_type")
    assert r["dropped"] == [victim] and not r["drifted"]
    out = eng.materialize_partitions("events", "event_type", ev.schema)
    assert _counts_by_type(out).get(victim) is None
    assert out.count() == without.count()

    # a second identical tick is a no-op (tombstone holds)
    time.sleep(0.05)
    r2 = eng.poll_partitions("events", without, "event_type")
    assert r2["skipped"] is True

    # the partition reappears -> captured again, state reconstructs it
    time.sleep(0.05)
    r3 = eng.poll_partitions("events", ev, "event_type")
    assert r3["drifted"] == [victim]
    out2 = eng.materialize_partitions("events", "event_type", ev.schema)
    assert out2.count() == ev.count()


def test_monitor_routes_partition_tables(spark, tables, tmp_path):
    """monitor(partition_cols=...) drives poll_partitions in the streaming
    loop: an external mutation of ONE partition re-emits only that
    partition's rows on a later tick."""
    import time

    src = str(tmp_path / "events_src")
    ev = tables["events"].select("event_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(src)
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    q = eng.monitor(
        {"events": src},
        interval_seconds=0.5,
        partition_cols={"events": "event_type"},
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if eng.changes("events").count() >= ev.count():
                    break
            except Exception:
                pass
            time.sleep(0.5)
        n_initial = eng.changes("events").count()
        assert n_initial == ev.count()

        victim = sorted(
            r["event_type"] for r in ev.select("event_type").distinct().collect()
        )[0]
        ev.withColumn(
            "value",
            F.when(F.col("event_type") == victim, F.col("value") + 1).otherwise(
                F.col("value")
            ),
        ).write.mode("overwrite").parquet(src)
        n_victim = ev.filter(F.col("event_type") == victim).count()
        deadline = time.time() + 60
        while time.time() < deadline:
            if eng.changes("events").count() >= n_initial + n_victim:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    # only the victim partition re-emitted
    assert eng.changes("events").count() == n_initial + n_victim


def test_partition_capture_null_partition_value(spark, tmp_path):
    """Rows whose partition column is NULL form their own partition and
    must re-emit on drift like any other (isin alone never matches null)."""
    import time

    df1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, None, 3.0)],
        "id long, grp string, v double",
    )
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    r1 = eng.poll_partitions("t", df1, "grp")
    assert len(r1["drifted"]) == 2  # 'a' and the null partition
    assert eng.changes("t").count() == 3

    time.sleep(0.05)
    df2 = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.5), (3, None, 3.0)],
        "id long, grp string, v double",
    )
    r2 = eng.poll_partitions("t", df2, "grp")
    assert r2["drifted"] == [None]
    assert eng.changes("t").count() == 5  # only the 2 null-part rows re-emit

    # reconstruction must keep the null partition too (eqNullSafe join —
    # a plain == would silently drop every null-partition row)
    out = eng.materialize_partitions("t", "grp", df2.schema)
    assert sorted(map(str, out.collect())) == sorted(map(str, df2.collect()))
