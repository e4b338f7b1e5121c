"""Output-table layout for data skipping: partitioned + sorted parquet
writes (the write-path counterpart of the scan-pushdown discipline).

The reference's only sink is an append-only change log (duckdb_cdc.go:
emitChanges → JSONL); this engine already mirrors that (sources/changelog)
and compacts it (operators/maintenance).  What a 100 TB *analytics* output
needs beyond a log is LAYOUT: directory partitioning so coarse predicates
prune whole directories without opening a file, and within-file ordering so
fine predicates prune row groups via parquet min/max statistics.  Both are
free at read time — Spark's parquet source applies PartitionFilters and
row-group skipping automatically — but only if the writer laid the data out
for it.

Two failure modes this module exists to avoid:

- **Small-files explosion**: `df.write.partitionBy(k)` alone makes EVERY
  task write a file into EVERY partition value it holds rows for —
  |tasks| × |values| files.  `write_partitioned` repartitions by the
  partition keys first, so each value's rows land in one task and the
  output is O(|values|) files.  (Hot partition values that need more than
  one file per value can widen via `files_per_partition`.)
- **Useless min/max stats**: unsorted row groups have min≈global-min,
  max≈global-max for every column — no row group ever prunes.
  `sortWithinPartitions` on the skip columns makes row-group ranges tight
  and disjoint, so selective predicates read a small fraction of each file.

`zorder_repartition` (operators/zorder.py) is the multi-column variant of
the same idea; this module is the single-dimension workhorse plus the
verification helper tests assert with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet partitioned by `partition_by`, with rows inside
    each file sorted by `sort_by` (for row-group min/max pruning).

    `files_per_partition` > 1 salts the repartition key so a skewed-hot
    partition value spreads across that many tasks/files instead of
    serializing through one."""
    sort_cols = list(sort_by or [])
    if files_per_partition > 1:
        # the salt must vary WITHIN a partition value or the anti-skew knob
        # is a no-op: with sort columns, hash those (keeps each file's sort
        # ranges tight); without, hash the full row so a hot value still
        # spreads across tasks
        salt_src = sort_cols or [c for c in df.columns if c not in partition_by] or df.columns
        salt = (F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in salt_src])) % files_per_partition).alias("__salt")
        staged = (
            df.withColumn("__salt", salt)
            .repartition(*[F.col(c) for c in partition_by], F.col("__salt"))
            .drop("__salt")
        )
    else:
        staged = df.repartition(*[F.col(c) for c in partition_by])
    if sort_cols:
        staged = staged.sortWithinPartitions(*(partition_by + sort_cols))
    staged.write.partitionBy(*partition_by).mode(mode).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a `write_partitioned` output; partition columns come back as
    directory-derived columns and coarse filters on them become
    PartitionFilters (no file listing I/O beyond the matching dirs)."""
    return spark.read.parquet(path)


def file_stats(path: str, column: str) -> list[dict]:
    """Per-file (path, num_rows, min, max) for `column`, read from parquet
    footers via pyarrow — the ground truth the skipping claims rest on.
    Test/verification helper: runs on the driver, touches only metadata."""
    import os

    import pyarrow.parquet as pq

    out: list[dict] = []
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(root, name)
            meta = pq.ParquetFile(fp).metadata
            lo, hi = None, None
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    col = meta.row_group(rg).column(ci)
                    if col.path_in_schema != column or col.statistics is None:
                        continue
                    st = col.statistics
                    lo = st.min if lo is None or st.min < lo else lo
                    hi = st.max if hi is None or st.max > hi else hi
            out.append(
                {"path": fp, "num_rows": meta.num_rows, "min": lo, "max": hi}
            )
    return out


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (+ per-bucket sorted) parquet TABLE —
    the layout that makes REPEATED joins/aggregations on `bucket_by`
    exchange-free.

    Directory partitioning (write_partitioned) prunes coarse predicates;
    bucketing removes the other big scale cost: the shuffle.  Two tables
    bucketed on their join key with the same bucket count sort-merge-join
    with ZERO Exchange (asserted in tests/test_layout.py), and a groupBy
    on the bucket key aggregates without one — at 100 TB that's the whole
    network phase of every fact-fact join amortized into the write.  An
    equality predicate on the bucket column also prunes to 1/num_buckets
    of the files (`SelectedBucketsCount` in the scan).

    The write repartitions by the bucket columns into `num_buckets` tasks
    first: Spark assigns output buckets with the same Murmur3
    hash-partitioning repartition() uses, so each task holds exactly one
    bucket's rows and the output is ONE file per bucket — without it,
    every input task writes a file into every bucket it touches
    (tasks x buckets small-files explosion), and multi-file buckets also
    forfeit the sorted-scan optimization.

    Sizing at scale: pick num_buckets so one bucket of the LARGEST
    co-bucketed table is a comfortable task unit (~128-512 MB compressed);
    co-joined tables must share bucket count and key.  Bucket metadata
    lives in the session catalog — `saveAsTable` with an explicit
    `path` keeps the data external, and `register_bucketed` re-attaches
    the metadata in a fresh session (local tests use the in-memory
    catalog; a cluster deployment points the same call at its metastore).
    Spark's bucket hash is Murmur3 (not Hive's), so the layout is read
    back by Spark, not by Hive/Trino bucketed readers."""
    sort_cols = list(sort_by or bucket_by)
    staged = df.repartition(num_buckets, *[F.col(c) for c in bucket_by])
    (
        staged.write.format("parquet")
        .bucketBy(num_buckets, *bucket_by)
        .sortBy(*sort_cols)
        .option("path", path)
        .mode(mode)
        .saveAsTable(name)
    )


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    validate: bool = False,
) -> DataFrame:
    """Re-attach catalog metadata for an existing `write_bucketed` output
    (new session, new metastore, or a table created by another job).
    ``validate=True`` scans the files first and refuses a spec that
    disagrees with the physical layout (see `validate_bucketed`).

    The parquet files alone don't carry the bucket spec — Spark keeps it
    in the catalog — so a plain `spark.read.parquet(path)` of a bucketed
    directory is just an ordinary scan (correct, but shuffles again).
    This recreates the table entry with an explicit column list (Spark
    rejects `CLUSTERED BY` without one), inferring the schema from the
    parquet footers.  The declared spec must match how the files were
    written: a wrong bucket count or key silently mis-co-locates and
    JOINS RETURN WRONG RESULTS under the exchange-free plan, so callers
    should treat (key, count) as part of the dataset's contract, exactly
    like its schema.

    ``validate`` checks bucket PLACEMENT only.  The ``SORTED BY``
    declaration is not physically verified — under default configs that
    is metadata-only (Spark re-sorts before a merge join unless the
    legacy ``bucketedTableScan.outputOrdering`` flag is enabled; with
    that flag on, a false sort declaration is the same wrong-results
    hazard, so only declare a sort you know the writer produced)."""
    if validate:
        bad = validate_bucketed(spark, path, bucket_by, num_buckets)
        if bad:
            raise ValueError(
                f"bucket spec ({bucket_by} INTO {num_buckets}) disagrees with "
                f"the files at {path}: {bad} rows live in the wrong bucket — "
                "registering this spec would silently mis-co-locate joins"
            )
    ddl_cols = spark.read.parquet(path)._jdf.schema().toDDL()
    sort_cols = list(sort_by or bucket_by)
    bucket_sql = ", ".join(f"`{c}`" for c in bucket_by)
    sort_sql = ", ".join(f"`{c}`" for c in sort_cols)
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.sql(
        f"CREATE TABLE `{name}` ({ddl_cols}) USING parquet "
        f"CLUSTERED BY ({bucket_sql}) SORTED BY ({sort_sql}) "
        f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
    )
    return spark.table(name)


def validate_bucketed(
    spark: SparkSession,
    path: str,
    bucket_by: list[str],
    num_buckets: int,
) -> int:
    """Count rows whose bucket hash disagrees with the file they live in.

    A declared bucket spec the files weren't actually written with makes
    the exchange-free join read mismatched buckets — WRONG RESULTS, not an
    error — so the spec deserves a cheap physical check.  Spark assigns
    buckets with ``pmod(murmur3(bucket cols), n)``, which is exactly the
    SQL ``hash()`` function (seed 42, verified bit-for-bit in
    tests/test_layout.py), and the writer stamps the bucket id into the
    file name (``..._00007.c000...``); one scan compares the two.  Returns
    0 for a faithful spec."""
    df = spark.read.parquet(path)
    stamp = F.regexp_extract(F.input_file_name(), r"_(\d{5})\.c\d+", 1)
    expected = F.pmod(F.hash(*[F.col(c) for c in bucket_by]), F.lit(num_buckets))
    # a file with NO bucket stamp (plain parquet that was never written
    # bucketed) is itself a spec violation — count its rows as mismatched
    # rather than crashing the ANSI cast on '' or null-skipping the compare
    bad = F.when(stamp == "", True).otherwise(stamp.cast("int") != expected)
    n_bad = (
        df.select(bad.cast("int").alias("bad")).agg(F.sum("bad").alias("n")).first()["n"]
    )
    return int(n_bad or 0)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out along the Z curve over ``zorder_cols`` —
    multi-dimensional data skipping where directory partitioning fits only
    one dimension.  Each output file covers a tight hyper-rectangle of the
    participating columns (operators/zorder.py), so a selective predicate
    on ANY of them prunes most files via footer min/max.  Columns must be
    pre-scaled to ``[0, 2^bits)`` by the caller (epoch days, bucketed
    doubles — see zorder_key)."""
    from pyspark.sql import functions as F

    from cdc_lite_spark.operators.zorder import zorder_repartition

    staged = zorder_repartition(
        df, [F.col(c) for c in zorder_cols], num_files, bits=bits
    ).drop("__zorder")  # layout key served its purpose; don't persist it
    staged.write.mode(mode).parquet(path)
