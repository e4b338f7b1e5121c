"""The change log: JSONL append sink + batch/stream source (ops A5, A8).

Reference: buffered records flushed to ``changes_<UTC ts>.jsonl``
(/root/reference/pkg/duckdb/duckdb_cdc.go:260-294).  Spark's file-sink
task-commit protocol supersedes the reference's hand-rolled buffering and
fixes two of its defects by construction (SURVEY.md §7.4): same-second
filename overwrites (duckdb_cdc.go:272) and silently skipped marshal errors
(duckdb_cdc.go:279-282).

The directory written here is simultaneously a *streaming source* for
downstream consumers (op A8) — the "change log consumed by Structured
Streaming" of the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamReader

from cdc_lite_spark.envelope import CHANGE_SCHEMA

#: JSON wire schema: `data` rides as a JSON object keyed by column name.
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("data", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def append_changes(env: DataFrame, out_dir: str, partition_by_table: bool = False) -> None:
    """Append envelope rows to the JSONL change log (op A5).

    One atomic task-committed file per partition per flush — at-least-once
    in the reference (duckdb_cdc.go:291), exactly-once here when driven
    from a checkpointed ``foreachBatch``.

    ``partition_by_table=True`` lays the log out as ``table=<name>/`` dirs
    so per-table consumers prune files at the listing level — the scale
    layout when many tables share one log (a flat dir makes every consumer
    list every file).
    """
    writer = env.write.mode("append")
    if partition_by_table:
        writer = writer.partitionBy("table")
    writer.json(out_dir)


def read_changes(spark: SparkSession, out_dir: str, table: str | None = None) -> DataFrame:
    """Batch-read the change log back as typed envelope rows."""
    df = spark.read.schema(WIRE_SCHEMA).json(out_dir)
    if table is not None:
        df = df.filter(F.col("table") == table)
    return df


def stream_changes(
    spark: SparkSession, out_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Op A8 — the change-log directory as a Structured Streaming source."""
    reader: DataStreamReader = spark.readStream.schema(WIRE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(out_dir)


__all__ = ["CHANGE_SCHEMA", "WIRE_SCHEMA", "append_changes", "read_changes", "stream_changes"]
