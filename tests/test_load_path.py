"""Generic file-source loader (sources/tables.py:load_path) and the
engine's multi-format monitored-source support."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.sources.tables import load_path


def _rows(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)], "k long, s string, v double"
    )


def test_load_path_csv_json_parquet_roundtrip(spark, tmp_path):
    df = _rows(spark)
    pq, cs, js = (str(tmp_path / n) for n in ("t.parquet", "t.csv", "t.jsonl"))
    df.coalesce(1).write.parquet(pq)
    df.coalesce(1).write.option("header", "true").csv(cs)
    df.coalesce(1).write.json(js)
    for path in (pq, js):
        back = load_path(spark, path)
        assert back.count() == 3 and set(back.columns) == {"k", "s", "v"}
    csv_back = load_path(spark, cs, schema="k long, s string, v double")
    assert {r["s"] for r in csv_back.collect()} == {"a", "b", "c"}
    # inference path (no schema) also works for exploration
    assert load_path(spark, cs).count() == 3


def test_load_path_unknown_extension_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="cannot sniff"):
        load_path(spark, str(tmp_path / "t.avro"))


def test_load_path_extensionless_is_parquet_dataset(spark, tmp_path):
    """Bare directories (the normal parquet dataset layout, and what the
    engine's monitored-path tests use) read as parquet."""
    out = str(tmp_path / "plain_dir")
    _rows(spark).write.parquet(out)
    assert load_path(spark, out).count() == 3


def test_engine_monitors_csv_source_path(spark, tmp_path):
    """The reference monitors a mutable external file; the engine now does
    the same for CSV sources — mutation by an external writer between
    ticks is detected and captured."""
    src = str(tmp_path / "users.csv")
    d1 = spark.createDataFrame([(1, "ann"), (2, "bob")], "id long, name string")
    d1.coalesce(1).write.option("header", "true").mode("overwrite").csv(src)
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    eng.poll_once({"users": src})
    assert eng.changes("users").count() == 2
    time.sleep(0.01)
    d2 = spark.createDataFrame([(1, "ann"), (2, "bob"), (3, "cy")], "id long, name string")
    d2.coalesce(1).write.option("header", "true").mode("overwrite").csv(src)
    eng.poll_once({"users": src})  # external mutation seen on re-resolve
    assert eng.changes("users").count() == 5
    assert (
        eng.changes("users").filter(F.col("data").getItem("name") == "cy").count() == 1
    )


def test_engine_csv_schema_cached_no_spurious_type_flip(spark, tmp_path):
    """The first resolve's inferred schema is reused on later ticks: a new
    row that WOULD flip inference (int → double re-renders "1" as "1.0")
    must not surface as a spurious whole-table diff, and each tick pays one
    scan, not an extra inference pass (r04 advice)."""
    src = str(tmp_path / "vals.csv")
    d1 = spark.createDataFrame([(1, 10), (2, 20)], "id long, val long")
    d1.coalesce(1).write.option("header", "true").mode("overwrite").csv(src)
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    eng.poll_once({"vals": src}, mode="diff", keys={"vals": ["id"]})
    assert src in eng._schema_cache
    cached = eng._schema_cache[src]
    time.sleep(0.01)
    # external writer drops a new file with a clean row and one whose val
    # would re-infer the column as double ("1" re-rendering as "1.0" under
    # the old per-tick re-inference)
    with open(src + "/part-external.csv", "w") as f:
        f.write("id,val\n3,30\n4,40.5\n")
    eng.poll_once({"vals": src}, mode="diff", keys={"vals": ["id"]})
    assert eng._schema_cache[src] == cached  # schema pinned, no re-inference
    log = eng.changes("vals")
    # rows 1/2 untouched: no spurious UPDATEs from a type flip
    assert log.filter(F.col("operation") == "UPDATE").count() == 0
    assert (
        log.filter(
            (F.col("operation") == "INSERT")
            & (F.col("data").getItem("id") == "3")
        ).count()
        == 1
    )


def test_engine_explicit_schema_pins_types(spark, tmp_path):
    """set_source_schema (the CLI --schema path) declares the column
    contract: the CSV parses under it on the FIRST tick — no inference
    scan, no inference-derived types."""
    src = str(tmp_path / "m.csv")
    # values that inference would type as BIGINT
    spark.createDataFrame([(1, 10), (2, 20)], "id long, val long").coalesce(
        1
    ).write.option("header", "true").mode("overwrite").csv(src)
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    eng.set_source_schema(src, "id long, val double")
    df = eng._resolve(src)
    assert dict(df.dtypes)["val"] == "double"  # declared, not inferred
    eng.poll_once({"m": src})
    assert eng.changes("m").count() == 2
    # the declared schema stays pinned for later ticks
    assert eng._schema_cache[src] == "id long, val double"


def test_load_path_orc_roundtrip_and_monitor(spark, tmp_path):
    """ORC is self-describing like parquet: footer schema, no inference
    scan; the engine monitors an .orc path like any other file source."""
    src = str(tmp_path / "t.orc")
    _rows(spark).coalesce(1).write.orc(src)
    back = load_path(spark, src)
    assert back.count() == 3 and set(back.columns) == {"k", "s", "v"}
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    assert eng.poll_once({"t": src}) == ["t"]
    assert eng.poll_once({"t": src}) == []
