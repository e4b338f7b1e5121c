"""The CDC change-record envelope.

Reference shape (``DuckDBChange``, /root/reference/pkg/duckdb/duckdb_cdc.go:20-25):
``{timestamp, table, operation, data}`` where ``data`` is one source row
pivoted into a ``map[column]value`` (duckdb_cdc.go:229-243) and ``operation``
is always ``"SNAPSHOT"`` (duckdb_cdc.go:248).  This engine keeps that wire
shape and extends ``operation`` with INSERT/UPDATE/DELETE from the relational
diff (operators/diff.py).

Everything here is a pure column expression — no Python runs per row, the
pivot is ``create_map`` / ``to_json`` inside whole-stage codegen.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The canonical envelope schema (FIXTURES.md §2).
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("data", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

SNAPSHOT = "SNAPSHOT"
INSERT = "INSERT"
UPDATE = "UPDATE"
DELETE = "DELETE"


def row_to_map(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Pivot a row into ``map<col_name, string_value>`` (op B3).

    The reference does this row-at-a-time in Go (duckdb_cdc.go:229-243); here
    it is one ``create_map`` expression — columnar, codegen'd, zero Python.
    """
    cols = cols or df.columns
    pairs = chain.from_iterable(
        (F.lit(c), F.col(c).cast("string")) for c in cols
    )
    return F.create_map(*pairs)


def snapshot_envelope(
    df: DataFrame,
    table: str,
    operation: str = SNAPSHOT,
    ts: Column | None = None,
) -> DataFrame:
    """Wrap every row of ``df`` in the change envelope (op B4).

    ``ts`` defaults to capture time (reference: ``time.Now()``,
    duckdb_cdc.go:246); pass a literal for deterministic tests/oracles.
    """
    ts = ts if ts is not None else F.current_timestamp()
    return df.select(
        ts.alias("timestamp"),
        F.lit(table).alias("table"),
        F.lit(operation).alias("operation"),
        row_to_map(df).alias("data"),
    )


def envelope_to_json(env: DataFrame) -> DataFrame:
    """Render envelope rows to single-line JSON strings (the JSONL wire
    format, duckdb_cdc.go:278-287)."""
    return env.select(F.to_json(F.struct(*env.columns)).alias("value"))
