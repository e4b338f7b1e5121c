"""Lakehouse maintenance operators.

At 100 TB the CDC changelog and snapshot directories accumulate small files
(one per micro-batch tick per partition); scan cost is then dominated by
file-open overhead and footer reads.  ``compact_parquet`` rewrites a parquet
directory into ~``target_file_mb`` files — the OPTIMIZE/compaction step
every table-format service runs, on plain Spark primitives.

Safety: the rewrite lands in a sibling temp dir, is byte-complete before
the swap, and the swap is two renames (atomic per rename on
HDFS/local-POSIX).  A crash between the renames leaves the ``.old`` dir
intact for manual recovery; a crash before them leaves the original
untouched.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    fs, jpath, _ = _fs(spark, path)
    n, total = 0, 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            n += 1
            total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    min_files: int = 2,
) -> dict:
    """Rewrite ``path`` into ``ceil(total_bytes / target)`` parquet files.

    Returns a report dict (files/bytes before and after, skipped flag).
    No-op when the directory already has < ``min_files`` data files or one
    rewritten file would suffice and the directory already has one.
    """
    n_before, bytes_before = dir_stats(spark, path)
    target = max(1, math.ceil(bytes_before / (target_file_mb * 1024 * 1024)))
    if n_before < min_files or n_before <= target:
        return {
            "path": path,
            "skipped": True,
            "files_before": n_before,
            "files_after": n_before,
            "bytes": bytes_before,
        }

    df = spark.read.parquet(path)
    # coalesce, not repartition: compaction must not shuffle — it only
    # concatenates co-located row groups into bigger files
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".old"
    df.coalesce(target).write.mode("overwrite").parquet(tmp)

    fs, jpath, jvm = _fs(spark, path)
    old_path = jvm.org.apache.hadoop.fs.Path(old)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(old_path):
        fs.delete(old_path, True)
    fs.rename(jpath, old_path)
    fs.rename(tmp_path, jpath)
    fs.delete(old_path, True)
    spark.catalog.refreshByPath(path)

    n_after, bytes_after = dir_stats(spark, path)
    return {
        "path": path,
        "skipped": False,
        "files_before": n_before,
        "files_after": n_after,
        "bytes": bytes_after,
    }
