"""Timestamp-encoding-agnostic time helpers.

The harness's ``events.parquet`` has shipped with three different physical
``ts`` encodings across data regenerations: ``timestamp[ns]`` (read as
nano-epoch bigint under ``nanosAsLong``), ``timestamp[us]`` with a UTC tz
(Spark ``TIMESTAMP``), and ``timestamp[us]`` with no tz (Spark
``TIMESTAMP_NTZ``).  ``sources.tables.load_table`` normalizes at the scan,
but any expression built directly against a user-supplied column must not
assume one encoding: ``F.unix_micros`` hard-fails on TIMESTAMP_NTZ and
DATE inputs with DATATYPE_MISMATCH.

``epoch_us`` is the one entry point queries should use.  The cast to
``timestamp`` is value-identity for NTZ under the engine's pinned-UTC
session timezone (sources/tables.py:ensure_session_confs), midnight-UTC
for DATE, and a no-op for TIMESTAMP — so the helper is safe to use
unconditionally.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the Unix epoch for TIMESTAMP, TIMESTAMP_NTZ, or
    DATE inputs (NTZ/DATE interpreted in the session timezone, pinned UTC)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_sec(col: Column | str) -> Column:
    """Whole seconds since the Unix epoch (floor), encoding-agnostic."""
    return F.floor(epoch_us(col) / 1_000_000)


def epoch_day(col: Column | str) -> Column:
    """Whole days since the Unix epoch (floor), encoding-agnostic."""
    return F.floor(epoch_us(col) / 86_400_000_000)
