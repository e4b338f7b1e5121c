"""Change-log format matrix: the JSONL log (reference parity,
duckdb_cdc.go:268) and the parquet log (the scale layout) must carry the
same envelope rows through append → batch read → stream read, and the
engine must run end-to-end in either format."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.sources.changelog import (
    LOG_FORMATS,
    append_changes,
    read_changes,
    stream_changes,
)


def _envelope(spark):
    return spark.range(5).select(
        F.current_timestamp().alias("timestamp"),
        F.lit("users").alias("table"),
        F.lit("SNAPSHOT").alias("operation"),
        F.create_map(F.lit("id"), F.col("id").cast("string")).alias("data"),
    )


@pytest.mark.parametrize("fmt", LOG_FORMATS)
def test_roundtrip_preserves_envelope(spark, tmp_path, fmt):
    out = str(tmp_path / fmt)
    env = _envelope(spark)
    append_changes(env, out, fmt=fmt)
    back = read_changes(spark, out, fmt=fmt)
    assert back.count() == 5
    assert [f.name for f in back.schema.fields] == [
        "timestamp",
        "table",
        "operation",
        "data",
    ]
    ids = sorted(r["data"]["id"] for r in back.collect())
    assert ids == ["0", "1", "2", "3", "4"]
    # the table filter prunes
    assert read_changes(spark, out, table="nope", fmt=fmt).count() == 0


def test_formats_carry_identical_rows(spark, tmp_path):
    env = _envelope(spark).withColumn("timestamp", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    outs = {}
    for fmt in LOG_FORMATS:
        outs[fmt] = str(tmp_path / f"same_{fmt}")
        append_changes(env, outs[fmt], fmt=fmt)
    rows = {
        fmt: sorted(
            (r["timestamp"], r["table"], r["operation"], r["data"]["id"])
            for r in read_changes(spark, outs[fmt], fmt=fmt).collect()
        )
        for fmt in LOG_FORMATS
    }
    assert rows["json"] == rows["parquet"]


def test_parquet_files_actually_written(spark, tmp_path):
    out = str(tmp_path / "p")
    append_changes(_envelope(spark), out, fmt="parquet")
    assert glob.glob(f"{out}/part-*.parquet")
    assert not glob.glob(f"{out}/part-*.json")


def test_bad_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="log format"):
        append_changes(_envelope(spark), str(tmp_path / "x"), fmt="csv")


@pytest.mark.parametrize("fmt", LOG_FORMATS)
def test_stream_source_reads_either_format(spark, tmp_path, fmt):
    out = str(tmp_path / f"stream_{fmt}")
    append_changes(_envelope(spark), out, fmt=fmt)
    q = (
        stream_changes(spark, out, fmt=fmt)
        .writeStream.format("memory")
        .queryName(f"chg_{fmt}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql(f"SELECT count(*) AS n FROM chg_{fmt}").collect()[0]["n"] == 5


@pytest.mark.parametrize("fmt", LOG_FORMATS)
def test_engine_poll_in_either_format(spark, tables, tmp_path, fmt):
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / f"chg_{fmt}"),
        state_dir=str(tmp_path / f"state_{fmt}"),
        log_format=fmt,
    )
    assert eng.poll_once({"region": tables["region"]}) == ["region"]
    assert eng.changes("region").count() == tables["region"].count()


def test_materialize_from_parquet_log(spark, tables, tmp_path):
    """The consumer-side compaction contract holds on the parquet log."""
    from pyspark.sql import types as T

    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "chg_m"),
        state_dir=str(tmp_path / "state_m"),
        log_format="parquet",
    )
    eng.poll_once({"region": tables["region"]})
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    cur = eng.materialize("region", ["r_regionkey"], schema)
    expect = {(r["r_regionkey"], r["r_name"]) for r in tables["region"].collect()}
    assert {(r["r_regionkey"], r["r_name"]) for r in cur.collect()} == expect


def test_format_drift_guard(spark, tables, tmp_path):
    """Pointing a parquet engine at a json log (or vice versa) fails fast
    instead of yielding null/garbage envelope rows (ADVICE r03)."""
    import pytest

    from cdc_lite_spark.envelope import snapshot_envelope
    from cdc_lite_spark.sources.changelog import append_changes, read_changes

    log = str(tmp_path / "log")
    env = snapshot_envelope(tables["region"], "region")
    append_changes(env, log, fmt="json")

    with pytest.raises(ValueError, match="format mismatch"):
        append_changes(env, log, fmt="parquet")
    with pytest.raises(ValueError, match="format mismatch"):
        read_changes(spark, log, fmt="parquet")
    # matching format still appends/reads fine
    append_changes(env, log, fmt="json")
    assert read_changes(spark, log).count() == 2 * tables["region"].count()


def test_corrupt_log_lines_never_become_phantom_state(spark, tables, tmp_path):
    """The reference silently skips marshal errors (duckdb_cdc.go:279-282);
    here a corrupt JSONL line surfaces as an all-null wire row (explicit
    schema, PERMISSIVE) — pinned: it must NOT materialize into a phantom
    record, because null `operation` fails every operation filter."""
    import time

    from cdc_lite_spark import CdcEngine

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    eng.poll_once({"region": tables["region"]})
    time.sleep(0.01)
    # corrupt line injected between valid appends
    with open(tmp_path / "log" / "zz-corrupt.json", "w") as fh:
        fh.write('{"timestamp": "not-a-ts", "table": 7 BROKEN\n')
    out = eng.materialize("region", ["r_regionkey"], tables["region"].schema)
    rows = out.collect()
    assert len(rows) == tables["region"].count()
    assert all(r["r_regionkey"] is not None for r in rows)
    # the wire read exposes the corruption as a null row, not a crash
    raw = eng.changes()
    assert raw.filter(raw.operation.isNull()).count() == 1


@pytest.mark.parametrize("fmt", LOG_FORMATS)
def test_changes_between_windows_the_feed(spark, tables, tmp_path, fmt):
    """CDF read: [start, end) returns exactly the ticks inside the window,
    for both log formats, via the engine surface."""
    import datetime
    import time

    eng = CdcEngine(
        spark, str(tmp_path / "log"), str(tmp_path / "state"), log_format=fmt
    )
    region = tables["region"]
    eng.poll_once({"region": region})
    time.sleep(1.1)
    cut = datetime.datetime.now()
    time.sleep(1.1)
    mutated = region.withColumn(
        "r_name",
        F.when(F.col("r_regionkey") == 0, F.lit("EDITED")).otherwise(F.col("r_name")),
    )
    eng.poll_once({"region": mutated})

    n = region.count()
    assert eng.changes("region").count() == 2 * n
    first = eng.changes_between(datetime.datetime(2000, 1, 1), cut, "region")
    second = eng.changes_between(cut, datetime.datetime(2100, 1, 1), "region")
    assert first.count() == n and second.count() == n
    assert second.filter(
        F.col("data").getItem("r_name") == "EDITED"
    ).count() == 1
    # empty window → empty feed
    assert eng.changes_between(cut, cut).count() == 0


def test_changes_between_pushes_bounds_to_parquet_scan(spark, tables, tmp_path):
    """Under the parquet log format the window bounds reach the scan as
    PushedFilters — each file is one tick's flush, so footer min/max on
    `timestamp` skips non-matching files entirely."""
    import datetime

    from cdc_lite_spark.plans.inspect import explain_str

    eng = CdcEngine(
        spark, str(tmp_path / "log"), str(tmp_path / "state"), log_format="parquet"
    )
    eng.poll_once({"region": tables["region"]})
    feed = eng.changes_between(
        datetime.datetime(2000, 1, 1), datetime.datetime(2100, 1, 1), "region"
    )
    plan = explain_str(feed)
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(timestamp" in pushed
    assert "LessThan(timestamp" in pushed
