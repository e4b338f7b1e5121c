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


#: supported change-log file formats.  "json" (JSONL) is reference parity
#: (duckdb_cdc.go:268) and human-greppable; "parquet" is the scale layout —
#: columnar + compressed (~10x smaller for wide envelopes), typed without a
#: read schema, and footer-stats prunable on `table`/`timestamp`.
LOG_FORMATS = ("json", "parquet")


def _check_fmt(fmt: str) -> None:
    if fmt not in LOG_FORMATS:
        raise ValueError(f"log format must be one of {LOG_FORMATS}, got {fmt!r}")


def append_changes(
    env: DataFrame, out_dir: str, partition_by_table: bool = False, fmt: str = "json"
) -> None:
    """Append envelope rows to the change log (op A5).

    One atomic task-committed file per partition per flush — at-least-once
    in the reference (duckdb_cdc.go:291), exactly-once here when driven
    from a checkpointed ``foreachBatch``.

    ``partition_by_table=True`` lays the log out as ``table=<name>/`` dirs
    so per-table consumers prune files at the listing level — the scale
    layout when many tables share one log (a flat dir makes every consumer
    list every file).
    """
    _check_fmt(fmt)
    writer = env.write.mode("append")
    if partition_by_table:
        writer = writer.partitionBy("table")
    writer.format(fmt).save(out_dir)


def read_changes(
    spark: SparkSession, out_dir: str, table: str | None = None, fmt: str = "json"
) -> DataFrame:
    """Batch-read the change log back as typed envelope rows."""
    _check_fmt(fmt)
    df = spark.read.schema(WIRE_SCHEMA).format(fmt).load(out_dir)
    if table is not None:
        df = df.filter(F.col("table") == table)
    return df


def stream_changes(
    spark: SparkSession,
    out_dir: str,
    max_files_per_trigger: int | None = None,
    fmt: str = "json",
) -> DataFrame:
    """Op A8 — the change-log directory as a Structured Streaming source."""
    _check_fmt(fmt)
    reader: DataStreamReader = spark.readStream.schema(WIRE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.format(fmt).load(out_dir)


__all__ = [
    "CHANGE_SCHEMA",
    "LOG_FORMATS",
    "WIRE_SCHEMA",
    "append_changes",
    "read_changes",
    "stream_changes",
]
