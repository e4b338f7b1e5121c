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

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamReader

from cdc_lite_spark.envelope import CHANGE_SCHEMA, DELETE
from cdc_lite_spark.operators.latest import latest_per_key

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
LOG_FORMATS = ("json", "parquet", "orc")


def _check_fmt(fmt: str) -> None:
    if fmt not in LOG_FORMATS:
        raise ValueError(f"log format must be one of {LOG_FORMATS}, got {fmt!r}")


#: file suffixes that identify each log format's part files
_FMT_SUFFIX = {"json": ".json", "parquet": ".parquet", "orc": ".orc"}


def _check_dir_format(out_dir: str, fmt: str) -> None:
    """Guard against format drift on an existing log directory (ADVICE r03):
    pointing a json engine at a parquet log (or vice versa) would mix part
    files, and Spark's JSON reader over parquet parts yields null/garbage
    envelope rows instead of a clean error.  Detect existing part-file
    extensions and raise on mismatch; empty/missing dirs pass.

    Short-circuits at the first recognizable part file (every prior append
    was guarded the same way, so one file witnesses the directory's format)
    — O(1) per tick, not O(log size).  Non-local URIs (s3:// …) pass
    through; there the cluster's layout conventions apply."""
    import os

    if not os.path.isdir(out_dir):
        return
    others = tuple(s for f, s in _FMT_SUFFIX.items() if f != fmt)
    for root, _dirs, files in os.walk(out_dir):
        for name in sorted(files):
            if name.startswith(("_", ".")):
                continue
            base = name[: -len(".gz")] if name.endswith(".gz") else name
            if base.endswith(others):
                raise ValueError(
                    f"change-log format mismatch: {out_dir!r} already holds "
                    f"other-format part files (found {name!r}) but "
                    f"fmt={fmt!r} was requested — use the directory's "
                    "original format or a fresh directory"
                )
            if base.endswith(_FMT_SUFFIX[fmt]):
                return  # witnessed a matching part file — dir is consistent


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
    _check_dir_format(out_dir, fmt)
    writer = env.write.mode("append")
    if partition_by_table:
        writer = writer.partitionBy("table")
    writer.format(fmt).save(out_dir)


def read_changes(
    spark: SparkSession, out_dir: str, table: str | None = None, fmt: str = "json"
) -> DataFrame:
    """Batch-read the change log back as typed envelope rows."""
    _check_fmt(fmt)
    _check_dir_format(out_dir, fmt)
    df = spark.read.schema(WIRE_SCHEMA).format(fmt).load(out_dir)
    if table is not None:
        df = df.filter(F.col("table") == table)
    return df


def read_changes_between(
    spark: SparkSession,
    out_dir: str,
    start,
    end,
    table: str | None = None,
    fmt: str = "json",
) -> DataFrame:
    """Change-data-feed read: envelope rows captured in ``[start, end)``
    (datetimes or ISO strings), optionally for one table.

    Scale shape: each log file is one tick's atomic flush, so its
    ``timestamp`` values span that tick only — with ``fmt="parquet"`` the
    pushed-down bounds prune whole files via footer min/max before any row
    is read (and ``partition_by_table=True`` layouts prune at the listing
    level first).  A consumer catching up on "what changed since t" reads
    O(changed ticks), not O(log history) — the JSONL format scans history
    but still filters record-level, which is why parquet is the scale
    format for long-lived logs (see append_changes)."""
    df = read_changes(spark, out_dir, table, fmt=fmt)
    return df.filter(
        (F.col("timestamp") >= F.lit(start).cast("timestamp"))
        & (F.col("timestamp") < F.lit(end).cast("timestamp"))
    )


def stream_changes(
    spark: SparkSession,
    out_dir: str,
    max_files_per_trigger: int | None = None,
    fmt: str = "json",
) -> DataFrame:
    """Op A8 — the change-log directory as a Structured Streaming source."""
    _check_fmt(fmt)
    _check_dir_format(out_dir, fmt)
    reader: DataStreamReader = spark.readStream.schema(WIRE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.format(fmt).load(out_dir)


#: above this many cold files, expire_changelog stops collecting the path
#: list to the driver and switches to a fully distributed semi-join +
#: streamed-iterator path (bounded driver memory at 10^7-file logs)
EXPIRE_COLLECT_MAX_FILES = 100_000


def expire_changelog(
    spark: SparkSession,
    out_dir: str,
    watermark: _dt.datetime,
    keys: dict[str, list[str]],
    fmt: str = "json",
    collect_max_files: int = EXPIRE_COLLECT_MAX_FILES,
) -> dict:
    """Retention GC for the change log (r03 verdict #6): fold every file
    whose records all predate ``watermark`` into one compact segment, then
    delete those files — bounding directory growth at a 1 s trigger without
    changing what consumers reconstruct.

    Per table with primary ``keys``, cold records collapse to
    latest-per-key (``max_by`` over capture timestamp — no sort); a key
    whose latest cold record is a DELETE is dropped outright (pre-watermark
    state for it is "absent", which is exactly what an empty log says).
    ``operation='SCHEMA'`` drift markers and tables without declared keys
    are kept verbatim (still compacted into the new segment).  Invariants:

    - ``Engine.materialize`` over the GC'd log equals materialize over the
      original log (pinned by tests/test_maintenance.py);
    - ``changes()`` rows at or after the watermark are untouched (their
      files are never rewritten);
    - per-record *history* below the watermark is gone — that is the
      retention contract; consumers must not replay from before it.

    Crash-safety: the folded segment is task-committed (append) BEFORE the
    cold files are deleted, so a crash in between leaves duplicate cold
    records — harmless to materialize (latest-per-key is idempotent) and
    cleaned by the next expire run.  Cost is O(cold files), never O(log):
    file selection reads only per-file max timestamps, so running this every
    N ticks is cheap and incremental.

    Driver memory stays bounded at any file count (r04 verdict #6): the
    per-file max-ts table is computed AND filtered executor-side, so only
    COLD paths can ever reach the driver — and past ``collect_max_files``
    even those stay distributed (the fold reads via a semi-join on file
    name and deletion streams paths through ``toLocalIterator``).  The
    per-file table is localCheckpoint-ed before the folded segment is
    appended, so the just-written segment (whose records are all
    pre-watermark by construction) can never be selected for deletion by a
    re-listing.
    """
    _check_fmt(fmt)
    reader = spark.read.schema(WIRE_SCHEMA).format(fmt).option("basePath", out_dir)
    whole = reader.load(out_dir).withColumn("__file", F.input_file_name())
    # aware watermarks CONVERT to UTC before dropping tzinfo (a bare
    # replace() would keep foreign wall-clock digits and shift the
    # retention boundary by the zone offset); naive inputs are taken as
    # UTC, matching the log's UTC-pinned session timestamps
    if watermark.tzinfo is not None:
        wm = watermark.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    else:
        wm = watermark
    per_file = (
        whole.groupBy("__file")
        .agg(F.max("timestamp").alias("mx"))
        .localCheckpoint(eager=True)  # pin the listing: one log scan, then
        # stats/selection/deletion all read this small per-file table
    )
    is_cold = F.col("mx").isNotNull() & (F.col("mx") < F.lit(wm))
    stats = per_file.agg(
        F.count("*").alias("n_total"),
        F.sum(is_cold.cast("long")).alias("n_cold"),
    ).first()
    n_cold = int(stats["n_cold"] or 0)
    report = {
        "files_total": int(stats["n_total"]),
        "files_expired": n_cold,
        "skipped": n_cold == 0,
    }
    if n_cold == 0:
        per_file.unpersist()
        return report

    cold_files = per_file.filter(is_cold).select("__file")
    small = n_cold <= collect_max_files
    if small:
        cold = sorted(r["__file"] for r in cold_files.collect())
        cold_df = reader.load(cold)
    else:
        cold_df = whole.join(cold_files, "__file", "semi").drop("__file")
    folded_parts: list[DataFrame] = []
    row_ops = cold_df.filter(F.col("operation") != "SCHEMA")
    for table, kcols in keys.items():
        part = row_ops.filter(F.col("table") == table)
        kexprs = [F.col("data").getItem(k).alias(f"__k_{k}") for k in kcols]
        keyed = part.select("*", *kexprs)
        latest = latest_per_key(
            keyed, [f"__k_{k}" for k in kcols], ["timestamp"], via_agg=True
        ).select("timestamp", "table", "operation", "data")
        folded_parts.append(latest.filter(F.col("operation") != DELETE))
    # SCHEMA markers + tables with no declared keys: verbatim (tiny / unsafe
    # to fold without a key)
    rest = cold_df.filter(
        (F.col("operation") == "SCHEMA") | ~F.col("table").isin(list(keys))
    )
    folded = rest
    for p in folded_parts:
        folded = folded.unionByName(p)

    # honor the directory's existing layout: a table=<name>/ partitioned log
    # must receive its folded segment partitioned the same way, or the dir
    # ends up with mixed flat/partitioned files that break discovery
    import os

    partitioned = any(
        e.name.startswith("table=")
        for e in os.scandir(out_dir)
        if e.is_dir()
    ) if os.path.isdir(out_dir) else False
    folded = folded.coalesce(1)
    append_changes(folded, out_dir, partition_by_table=partitioned, fmt=fmt)

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    removed = 0
    # the iterator path streams one partition of paths at a time — deletion
    # is inherently a driver-side FS walk, but never holds the full list
    paths = cold if small else (r["__file"] for r in cold_files.toLocalIterator())
    for f in paths:
        jpath = jvm.org.apache.hadoop.fs.Path(f)
        fs = jpath.getFileSystem(hconf)
        if fs.delete(jpath, False):
            removed += 1
    per_file.unpersist()
    spark.catalog.refreshByPath(out_dir)
    report["files_deleted"] = removed
    return report


__all__ = [
    "CHANGE_SCHEMA",
    "LOG_FORMATS",
    "WIRE_SCHEMA",
    "append_changes",
    "expire_changelog",
    "read_changes",
    "stream_changes",
]
