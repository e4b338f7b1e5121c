"""Whole-engine integration: every layer composed in one flow.

DuckDB file (external writer) → CDC poll → JSONL change log →
Structured-Streaming consumer → materialized state — the complete
reference workflow (SURVEY.md §3.1) plus the consumer side the reference
leaves to its tests.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.sources.changelog import stream_changes
from cdc_lite_spark.sources.duckdb_source import read_duckdb_table


def test_full_pipeline(spark, tmp_path):
    # 1. an operational DuckDB database, as in the reference
    db = str(tmp_path / "ops.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE users (id INTEGER, name VARCHAR, score DOUBLE)")
    con.execute("INSERT INTO users VALUES (1, 'ann', 10.5), (2, 'bob', 20.0)")
    con.close()

    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))

    # 2. poll #1: initial capture
    assert eng.poll_once({"users": read_duckdb_table(spark, db, "users")}) == ["users"]

    # 3. external writer mutates
    con = duckdb.connect(db)
    con.execute("INSERT INTO users VALUES (3, 'cat', 30.0)")
    con.execute("UPDATE users SET score = 11.0 WHERE id = 1")
    con.close()

    # 4. poll #2: drift detected, re-captured
    assert eng.poll_once({"users": read_duckdb_table(spark, db, "users")}) == ["users"]

    # 5. downstream consumer: the change log as a stream → per-table counts
    q = (
        stream_changes(spark, eng.output_dir)
        .groupBy("table", "operation")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("e2e_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = {
        (r["table"], r["operation"]): r["count"]
        for r in spark.sql("SELECT * FROM e2e_counts").collect()
    }
    assert counts[("users", "SNAPSHOT")] == 2 + 3  # both captures

    # 6. materialized current state equals the live table
    state = eng.materialize(
        "users", ["id"], read_duckdb_table(spark, db, "users").schema
    )
    live = {r["id"]: (r["name"], r["score"]) for r in read_duckdb_table(spark, db, "users").collect()}
    got = {r["id"]: (r["name"], r["score"]) for r in state.collect()}
    assert got == live
    assert got[1][1] == 11.0  # the UPDATE took effect


def test_csv_json_source_roundtrip(spark, tables, tmp_path):
    """Source-format breadth: the engine's frames survive CSV and JSON
    round-trips with explicit schemas (inferSchema avoided by design)."""
    nation = tables["nation"]
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    nation.write.mode("overwrite").option("header", True).csv(csv_dir)
    nation.write.mode("overwrite").json(json_dir)

    csv_back = spark.read.schema(nation.schema).option("header", True).csv(csv_dir)
    json_back = spark.read.schema(nation.schema).json(json_dir)
    assert csv_back.exceptAll(nation).count() == 0
    assert nation.exceptAll(csv_back).count() == 0
    assert json_back.exceptAll(nation).count() == 0

    # and the CDC envelope works over a CSV-sourced frame unchanged
    from cdc_lite_spark.envelope import snapshot_envelope

    env = snapshot_envelope(csv_back, "nation_csv")
    assert env.count() == nation.count()
    assert env.filter(F.col("data")["n_name"].isNull()).count() == 0
