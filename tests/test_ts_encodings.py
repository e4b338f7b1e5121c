"""Timestamp-encoding robustness matrix.

The harness has regenerated ``events.parquet`` with three different
physical ``ts`` encodings across rounds — ``timestamp[ns]`` (read as
nano-epoch bigint under ``nanosAsLong``), ``timestamp[us]`` UTC
(TIMESTAMP), and ``timestamp[us]`` no-tz (TIMESTAMP_NTZ) — and each
switch has broken queries that assumed one encoding.  This matrix pins
the invariant: every events-touching registered query RUNS and returns
the SAME row count under all three encodings (load_table normalizes at
the scan; values are identical because the session tz is pinned UTC).
"""

from __future__ import annotations

import inspect
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdc_lite_spark.queries import REGISTRY
from cdc_lite_spark.sources.tables import TABLES

ENCODINGS = ["us_utc", "us_ntz", "ns"]


def _events_queries() -> list[str]:
    return sorted(
        name
        for name, qd in REGISTRY.items()
        if '"events"' in inspect.getsource(qd.builder)
    )


@pytest.fixture(scope="module")
def encoded_dirs(sf_dir, tmp_path_factory) -> dict[str, str]:
    """One sf-dir per encoding: re-encoded events.parquet + symlinks to the
    other tables so load_table/oracle paths resolve unchanged."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    i = src.schema.get_field_index("ts")
    base = src.column("ts").cast(pa.timestamp("us", tz="UTC"))
    variants = {
        "us_utc": base,
        "us_ntz": base.cast(pa.timestamp("us")),
        "ns": base.cast(pa.timestamp("ns", tz="UTC")),
    }
    out: dict[str, str] = {}
    for enc, col in variants.items():
        d = tmp_path_factory.mktemp(f"enc_{enc}")
        tbl = src.set_column(i, pa.field("ts", col.type), col)
        pq.write_table(tbl, str(d / "events.parquet"))
        for t in TABLES:
            if t != "events":
                os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
        out[enc] = str(d)
    return out


def test_fixture_encodings_differ(encoded_dirs, spark):
    """The fixtures must actually exercise distinct Spark-visible types."""
    from cdc_lite_spark.sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    raw = {
        enc: dict(spark.read.parquet(f"{d}/events.parquet").dtypes)["ts"]
        for enc, d in encoded_dirs.items()
    }
    assert raw["us_utc"] == "timestamp"
    assert raw["us_ntz"] == "timestamp_ntz"
    assert raw["ns"] == "bigint"  # nanosAsLong


def test_load_table_normalizes_every_encoding(encoded_dirs, spark):
    from cdc_lite_spark.sources.tables import load_table

    for enc, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", enc


@pytest.mark.parametrize("name", _events_queries())
def test_events_query_runs_under_every_encoding(name, encoded_dirs, spark):
    counts = {
        enc: REGISTRY[name].builder(spark, d).count()
        for enc, d in encoded_dirs.items()
    }
    assert counts["us_ntz"] == counts["us_utc"] == counts["ns"], (name, counts)


@pytest.fixture(scope="module")
def double_embedding_dir(sf_dir, tmp_path_factory) -> str:
    """embeddings.parquet re-encoded as list<double> — the same physical
    drift class that hit events.ts twice, applied to the other typed
    column a regeneration could plausibly change."""
    d = tmp_path_factory.mktemp("emb_double")
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    i = src.schema.get_field_index("embedding")
    dbl = src.column("embedding").cast(pa.list_(pa.float64()))
    pq.write_table(src.set_column(i, pa.field("embedding", dbl.type), dbl),
                   str(d / "embeddings.parquet"))
    for t in TABLES:
        if t != "embeddings":
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    return str(d)


def _embedding_queries() -> list[str]:
    return sorted(
        name
        for name, qd in REGISTRY.items()
        if '"embeddings"' in inspect.getsource(qd.builder)
    )


@pytest.mark.parametrize("name", _embedding_queries())
def test_embedding_query_runs_under_double_encoding(name, double_embedding_dir, spark):
    """Every embeddings-touching query must RUN when the vector column is
    list<double> instead of list<float> (values legitimately differ; the
    oracle reads the same file so parity stays internally consistent)."""
    assert REGISTRY[name].builder(spark, double_embedding_dir).count() >= 0
