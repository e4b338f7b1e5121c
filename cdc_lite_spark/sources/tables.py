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
