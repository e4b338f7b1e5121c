"""SparkSession factory.

Local-mode settings mirror what a real cluster deployment would set per
executor; the parallelism knobs come from the environment so the same code
runs on local[32] (the harness) or a 1000-executor cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cdc_lite_spark",
    cpus: int | None = None,
    extra_conf: "dict[str, str] | None" = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing, skew-join splitting, dynamic join
      re-planning — essential at 100 TB where static estimates are wrong.
    - shuffle.partitions sized to cores locally; on a cluster this should be
      ~2-3x total executor cores (set via spark-submit, this is a default).
    - UTC session timezone: the DuckDB oracle compares timestamps UTC-naive.
    - Arrow on: every Pandas-UDF hop is Arrow-batched, not pickled rows.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS) which Spark rejects;
        # read as long and convert to micros in the loader (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # caller-specific settings that must land before the JVM starts
    # (e.g. the test session caps its heap and shortens the context
    # cleaner's periodic-GC interval — settings read once at startup)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
