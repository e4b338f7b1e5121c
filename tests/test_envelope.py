"""Envelope + change-log round-trip tests (SURVEY.md §2 B3/B4, A5, A8).

Spark analogue of the reference's TestFileWriting / TestChangeDetection
(duckdb_cdc_test.go:210-273, :125-208): build envelopes, write JSONL,
parse back, compare fields.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.envelope import CHANGE_SCHEMA, snapshot_envelope
from cdc_lite_spark.sources.changelog import append_changes, read_changes


def test_envelope_schema_and_fields(tables):
    nation = tables["nation"]
    env = snapshot_envelope(nation, "nation")
    assert [f.name for f in env.schema.fields] == ["timestamp", "table", "operation", "data"]
    rows = env.collect()
    assert len(rows) == nation.count()
    r = rows[0]
    assert r["table"] == "nation"
    assert r["operation"] == "SNAPSHOT"
    assert set(r["data"].keys()) == set(nation.columns)


def test_envelope_data_values_stringified(tables):
    region = tables["region"]
    env = snapshot_envelope(region, "region")
    data = {r["data"]["r_regionkey"]: r["data"]["r_name"] for r in env.collect()}
    src = {str(r["r_regionkey"]): r["r_name"] for r in region.collect()}
    assert data == src


def test_jsonl_roundtrip(spark, tables, tmp_path):
    out = str(tmp_path / "changes")
    env = snapshot_envelope(tables["region"], "region")
    append_changes(env, out)
    back = read_changes(spark, out)
    # JSON read-back marks everything nullable; compare names + types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in CHANGE_SCHEMA.fields
    ]
    assert back.count() == tables["region"].count()
    assert back.filter(F.col("table") == "region").count() == back.count()
    # appending again accumulates (append-only log, duckdb_cdc.go:268-270)
    append_changes(env, out)
    assert read_changes(spark, out).count() == 2 * tables["region"].count()
    # filtered read
    assert read_changes(spark, out, table="nope").count() == 0


def test_partitioned_changelog_prunes_by_table(spark, tables, tmp_path):
    out = str(tmp_path / "changes_part")
    append_changes(snapshot_envelope(tables["region"], "region"), out, partition_by_table=True)
    append_changes(snapshot_envelope(tables["nation"], "nation"), out, partition_by_table=True)
    back = read_changes(spark, out, table="nation")
    assert back.count() == tables["nation"].count()
    # partition pruning: the filter appears as a PartitionFilters entry
    from cdc_lite_spark.plans.inspect import explain_str

    plan = explain_str(read_changes(spark, out, table="nation"))
    assert "PartitionFilters" in plan and "table" in plan


def test_envelope_to_json_wire_roundtrip(spark):
    """The single-string wire form (Kafka-value shape) must parse back via
    WIRE_SCHEMA with nothing lost — pins envelope_to_json as the E8
    serialize API (duckdb_cdc.go:278-287)."""
    from pyspark.sql import functions as F

    from cdc_lite_spark.envelope import envelope_to_json, snapshot_envelope
    from cdc_lite_spark.sources.changelog import WIRE_SCHEMA

    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, v string")
    env = snapshot_envelope(df, "t", ts=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    wire = envelope_to_json(env)
    assert wire.columns == ["value"]
    back = wire.select(
        F.from_json("value", WIRE_SCHEMA).alias("r")
    ).select("r.*")
    rows = {r["data"]["id"]: r for r in back.collect()}
    assert rows["1"]["table"] == "t" and rows["1"]["operation"] == "SNAPSHOT"
    assert rows["1"]["data"]["v"] == "a"
    assert rows["2"]["data"]["v"] is None
