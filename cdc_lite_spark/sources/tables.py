"""Loaders for the harness's parquet tables (TESTDATA.md).

Parquet is self-describing — schema inference here is metadata-only, the
Spark analogue of the reference's zero-row probe ``SELECT * FROM t LIMIT 0``
(/root/reference/pkg/duckdb/duckdb_cdc.go:146-159) except no query runs at
all (op A2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Small dimension tables — always broadcast-join these (well under the
#: 10 MB auto-broadcast threshold even at sf100).
DIMENSIONS = {"region", "nation", "supplier", "part", "customer"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs this engine depends on, applied defensively —
    the harness may hand us a SparkSession built without them.

    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which Spark 4
      rejects outright otherwise;
    - UTC session timezone: oracle comparison and toPandas conversions are
      timezone-sensitive for TimestampType columns.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # a locked-down conf is better than a crashed query


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Parquet TIMESTAMP(NANOS) arrives as nano-epoch longs (see session.py);
    # normalize to Spark's native microsecond timestamps.  Floor division
    # matches DuckDB's ns→us truncation so oracle comparisons line up.
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division — `/` would round-trip through double and lose
            # precision above 2^53 (nano-epoch values are ~1.7e18)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] with no tz (TIMESTAMP_NTZ in Spark 4) — the
            # session tz is pinned UTC above, so this cast is value-identity
            # and keeps every downstream unix_micros/window expression on the
            # one timestamp type the whole engine is written against.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` matches the
    DuckDB oracle's pre-registered view names."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


#: extension → Spark reader format for the generic loader
_EXT_FORMATS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def load_path(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
):
    """Generic file-source loader: parquet, ORC, CSV/TSV, or JSON-lines,
    with the format sniffed from the extension when ``fmt`` is not given.

    Defaults per format: CSV reads ``header=true`` (and tab delimiter for
    .tsv); JSON is JSON-lines.  With no ``schema``, CSV/JSON runs Spark's
    inference, which SCANS THE DATA once before the real read — fine for
    exploration, wrong for a 100 TB production path, so pass an explicit
    schema there (parquet needs none: its footer is self-describing, the
    zero-row-probe property op A2 relies on).  Extra ``options`` pass
    through to the reader verbatim.
    """
    ensure_session_confs(spark)
    if fmt is None:
        ext = os.path.splitext(path)[1].lower()
        if ext == "":
            fmt = "parquet"  # extensionless = a parquet dataset directory
        else:
            fmt = _EXT_FORMATS.get(ext)
        if fmt is None:
            raise ValueError(
                f"cannot sniff source format from {path!r}; pass fmt= "
                f"(one of parquet/orc/csv/json)"
            )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if path.lower().endswith(".tsv"):
            reader = reader.option("sep", "\t")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)
