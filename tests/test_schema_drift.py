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


def _duck_users(tmp_path, ddl_rows):
    import duckdb

    db = str(tmp_path / "src.duckdb")
    con = duckdb.connect(db)
    for stmt in ddl_rows:
        con.execute(stmt)
    con.close()
    return db


def _duck_mutate(db, stmts):
    import duckdb

    con = duckdb.connect(db)
    for s in stmts:
        con.execute(s)
    con.close()


def test_diff_mode_survives_added_column(spark, tmp_path):
    """ALTER TABLE ADD between diff polls: a SCHEMA ADD record fires and
    row diffs carry the widened schema (new column appears in data)."""
    from cdc_lite_spark.sources.duckdb_source import read_duckdb_table

    db = _duck_users(
        tmp_path,
        [
            "CREATE TABLE users (id INTEGER, name VARCHAR)",
            "INSERT INTO users VALUES (1,'ada'), (2,'bob')",
        ],
    )
    eng = CdcEngine(spark, str(tmp_path / "out"), str(tmp_path / "state"))
    src = {"users": lambda: read_duckdb_table(spark, db, "users")}
    assert eng.poll_once(src, mode="diff", keys={"users": ["id"]}) == ["users"]
    _duck_mutate(
        db,
        [
            "ALTER TABLE users ADD COLUMN email VARCHAR",
            "UPDATE users SET email='a@x.com' WHERE id=1",
        ],
    )
    assert eng.poll_once(src, mode="diff", keys={"users": ["id"]}) == ["users"]
    log = eng.changes("users")
    adds = log.filter(F.col("operation") == "SCHEMA").collect()
    assert [(r["data"]["column"], r["data"]["change"]) for r in adds] == [
        ("email", "ADD")
    ]
    upd = {
        r["data"]["id"]: r["data"].get("email")
        for r in log.filter(F.col("operation") == "UPDATE").collect()
    }
    assert upd["1"] == "a@x.com"


def test_diff_mode_survives_dropped_column(spark, tmp_path):
    """ALTER TABLE DROP between diff polls: a SCHEMA DROP record fires and
    row diffs continue on the narrowed schema."""
    from cdc_lite_spark.sources.duckdb_source import read_duckdb_table

    db = _duck_users(
        tmp_path,
        [
            "CREATE TABLE users (id INTEGER, name VARCHAR, email VARCHAR)",
            "INSERT INTO users VALUES (1,'ada','a@x.com'), (2,'bob','b@x.com')",
        ],
    )
    eng = CdcEngine(spark, str(tmp_path / "out"), str(tmp_path / "state"))
    src = {"users": lambda: read_duckdb_table(spark, db, "users")}
    assert eng.poll_once(src, mode="diff", keys={"users": ["id"]}) == ["users"]
    _duck_mutate(
        db,
        [
            "ALTER TABLE users DROP COLUMN email",
            "UPDATE users SET name='ADA' WHERE id=1",
        ],
    )
    assert eng.poll_once(src, mode="diff", keys={"users": ["id"]}) == ["users"]
    log = eng.changes("users")
    drops = log.filter(F.col("operation") == "SCHEMA").collect()
    assert [(r["data"]["column"], r["data"]["change"]) for r in drops] == [
        ("email", "DROP")
    ]
    names = {
        r["data"]["id"]: r["data"]["name"]
        for r in log.filter(F.col("operation") == "UPDATE").collect()
    }
    assert names["1"] == "ADA"
