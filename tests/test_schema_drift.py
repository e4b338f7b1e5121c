"""Schema-drift detection: the reference's emergent DDL-fires-a-capture
behavior (duckdb_cdc.go:146-159 + :169-179), surfaced as first-class
operation='SCHEMA' change records."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.engine import CdcEngine
from cdc_lite_spark.operators.schema_drift import schema_drift, schema_map


def test_schema_drift_classifies_add_drop_retype():
    prev = {"id": "int", "name": "string", "score": "double"}
    cur = {"id": "bigint", "name": "string", "added": "date"}
    drift = {(d["column"], d["change"]) for d in schema_drift(prev, cur)}
    assert drift == {("id", "RETYPE"), ("added", "ADD"), ("score", "DROP")}
    retype = next(d for d in schema_drift(prev, cur) if d["change"] == "RETYPE")
    assert retype["from_type"] == "int" and retype["to_type"] == "bigint"


def test_schema_drift_ignores_order():
    a = {"x": "int", "y": "string"}
    b = {"y": "string", "x": "int"}
    assert schema_drift(a, b) == []


def test_pure_ddl_change_fires_capture_and_emits_schema_records(spark, tmp_path):
    """Add a column with constant content otherwise: the fingerprint built
    from the current column list changes (emergent reference behavior), the
    table is re-captured, and the log carries SCHEMA records naming the
    added column."""
    src = str(tmp_path / "src")
    eng = CdcEngine(spark, str(tmp_path / "out"), str(tmp_path / "state"))

    v1 = spark.range(5).select(F.col("id"), F.lit("a").alias("name"))
    v1.write.mode("overwrite").parquet(src)
    assert eng.poll_once({"users": src}) == ["users"]

    # same rows, one new column — a pure DDL change
    v2 = spark.range(5).select(
        F.col("id"), F.lit("a").alias("name"), F.lit(None).cast("date").alias("joined")
    )
    v2.write.mode("overwrite").parquet(src)
    assert eng.poll_once({"users": src}) == ["users"], "DDL change must fire a capture"

    log = eng.changes("users")
    schema_recs = log.filter(F.col("operation") == "SCHEMA").collect()
    assert len(schema_recs) == 1
    assert schema_recs[0]["data"]["column"] == "joined"
    assert schema_recs[0]["data"]["change"] == "ADD"
    assert schema_recs[0]["data"]["to_type"] == "date"

    # unchanged third poll: no new capture, no new SCHEMA records
    assert eng.poll_once({"users": src}) == []
    assert log.filter(F.col("operation") == "SCHEMA").count() == 1


def test_content_change_emits_no_schema_records(spark, tmp_path):
    src = str(tmp_path / "src")
    eng = CdcEngine(spark, str(tmp_path / "out"), str(tmp_path / "state"))
    spark.range(3).select(F.col("id"), F.lit("a").alias("v")).write.mode(
        "overwrite"
    ).parquet(src)
    eng.poll_once({"t": src})
    spark.range(4).select(F.col("id"), F.lit("b").alias("v")).write.mode(
        "overwrite"
    ).parquet(src)
    eng.poll_once({"t": src})
    assert eng.changes("t").filter(F.col("operation") == "SCHEMA").count() == 0
    assert schema_map(spark.read.parquet(src)) == {"id": "bigint", "v": "string"}
