"""Engine-portable hashing and row canonicalization.

The reference fingerprints tables with DuckDB-internal ``hash()`` (64-bit,
engine-specific constants — /root/reference/pkg/duckdb/duckdb_cdc.go:178).
Our correctness oracle runs in DuckDB while the engine runs in Spark, so any
hash that participates in an oracle-checked result must be computable
*bit-identically in both engines* (SURVEY.md §7.4).

The portable hash here is: ``md5(s)`` → first 15 hex chars → parse base-16 →
a 60-bit non-negative BIGINT.  Both engines share md5 exactly; 15 hex digits
(60 bits) fits signed 64-bit in both.  Each helper has a Spark Column form
and a DuckDB SQL-string form that produce identical values.

Scale note: md5 is ~3x slower than xxhash64 but still JVM-side,
whole-stage-codegen'd, and embarrassingly parallel — it never shuffles.
Production deployments that don't need a cross-engine oracle can swap
``portable_hash64`` for ``F.xxhash64`` via the ``fast=`` flag.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_PREFIX_LEN = 15  # 60 bits < 2^63, safe in signed BIGINT for both engines


def portable_hash64(col: Column | str, seed: str | None = None, fast: bool = False) -> Column:
    """60-bit deterministic hash of a string column, DuckDB-reproducible.

    ``seed`` namespaces hash families (MinHash needs k independent hashes).
    ``fast=True`` swaps in xxhash64 — NOT oracle-comparable, use only for
    engine-internal fingerprints where no DuckDB parity is needed.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(seed + "\x1f"), c)
    if fast:
        return F.xxhash64(c)
    return F.conv(F.substring(F.md5(c), 1, HEX_PREFIX_LEN), 16, 10).cast("long")


def portable_hash64_sql(expr: str, seed: str | None = None) -> str:
    """DuckDB SQL producing the same value as :func:`portable_hash64`."""
    if seed is not None:
        expr = f"(chr(31) || {expr})"
        expr = f"('{seed}' || {expr})"
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_PREFIX_LEN}) AS BIGINT)"


def canonical_col(col: str, dtype: str) -> Column:
    """One column rendered to a canonical string, identically in both engines.

    Mirrors the reference's ``COALESCE(CAST(c AS VARCHAR), '')``
    (duckdb_cdc.go:171) but pins formats where Spark/DuckDB defaults diverge:
    timestamps → explicit pattern, floats → fixed decimals, booleans → 0/1.
    """
    c = F.col(col)
    dl = dtype.lower()
    if dl.startswith("timestamp"):
        rendered = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSS")
    elif dl in ("double", "float") or dl.startswith("decimal"):
        rendered = F.format_string("%.6f", c.cast("double"))
    elif dl == "boolean":
        rendered = c.cast("int").cast("string")
    else:
        rendered = c.cast("string")
    return F.coalesce(rendered, F.lit(""))


def canonical_col_sql(col: str, dtype: str) -> str:
    """DuckDB SQL mirror of :func:`canonical_col`."""
    dl = dtype.lower()
    if dl.startswith("timestamp"):
        rendered = f"strftime({col}, '%Y-%m-%d %H:%M:%S.%g')"
    elif dl in ("double", "float") or dl.startswith("decimal"):
        rendered = f"printf('%.6f', CAST({col} AS DOUBLE))"
    elif dl == "boolean":
        rendered = f"CAST(CAST({col} AS INT) AS VARCHAR)"
    else:
        rendered = f"CAST({col} AS VARCHAR)"
    return f"COALESCE({rendered}, '')"


def canonical_row_string(cols_with_types: Sequence[tuple[str, str]]) -> Column:
    """All columns joined into one canonical row string (reference's checksum
    row-repr, duckdb_cdc.go:169-173: per-col canonical strings joined by ',')."""
    return F.concat_ws(",", *[canonical_col(c, t) for c, t in cols_with_types])


def canonical_row_sql(cols_with_types: Sequence[tuple[str, str]]) -> str:
    """DuckDB SQL mirror of :func:`canonical_row_string`."""
    parts = [canonical_col_sql(c, t) for c, t in cols_with_types]
    return "concat_ws(',', " + ", ".join(parts) + ")"
