"""Local mirror of the driver's correctness harness.

Runs every registered query in Spark AND its DuckDB oracle SQL over the same
parquet tables, then compares row count, column names, and an
order-insensitive multiset of canonicalized values — the same comparison
shape the driver applies (BASELINE.md "Correctness gate").  Used by
tests/test_oracle_parity.py so parity breaks locally before the driver sees
them.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from cdc_lite_spark.queries import REGISTRY
from cdc_lite_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        if v != v:  # NaN
            return "∅"
        return repr(v)  # shortest round-trip repr — bit-identical doubles match
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon_frame(pdf: pd.DataFrame) -> Counter:
    cols = sorted(pdf.columns)
    rows = Counter()
    for tup in pdf[cols].itertuples(index=False, name=None):
        rows["\x1f".join(_canon_cell(v) for v in tup)] += 1
    return rows


def compare_query(
    spark: SparkSession, con, name: str, sf_dir: str
) -> tuple[bool, str]:
    qd = REGISTRY[name]
    spark_pdf = qd.builder(spark, sf_dir).toPandas()
    if qd.oracle is None:
        return (len(spark_pdf) >= 0, f"rows-only: {len(spark_pdf)} rows")
    duck_pdf = con.execute(qd.oracle).fetchdf()

    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return (False, f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
    # compare dtype *kinds* (int/float/datetime/object) — width differences
    # (int32 vs int64, ns vs us) are value-identical; float-vs-int is a bug
    s_types = {c: spark_pdf[c].dtype.kind for c in spark_pdf.columns}
    d_types = {c: duck_pdf[c].dtype.kind for c in duck_pdf.columns}
    if s_types != d_types:
        diff = {c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]}
        return (False, f"dtype kinds differ: {diff}")
    if len(spark_pdf) != len(duck_pdf):
        return (False, f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = _canon_frame(spark_pdf), _canon_frame(duck_pdf)
    if s != d:
        only_s = list((s - d).keys())[:3]
        only_d = list((d - s).keys())[:3]
        return (False, f"values differ; spark-only={only_s} duck-only={only_d}")
    return (True, f"match: {len(spark_pdf)} rows")
