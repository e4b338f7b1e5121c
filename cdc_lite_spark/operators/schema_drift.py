"""Schema-drift detection (the reference's emergent DDL behavior, made
explicit).

In the reference, columns are re-probed every poll and the checksum
expression is rebuilt from them (duckdb_cdc.go:146-159, :169-179), so a
pure DDL change (add/drop/retype a column) changes the fingerprint and
fires a capture — but the emitted records never SAY the schema changed;
the consumer has to infer it from record shapes.  Here the drift itself is
a first-class change record: ``operation='SCHEMA'`` rows whose ``data``
map carries {column, change, from_type, to_type}.

Scale note: schemas are metadata (a handful of entries per table), so
drift computation is pure driver-side dict comparison — never a Spark job.
The *detection* still rides the fingerprint (a schema change perturbs the
canonical row string, so the existing checksum short-circuit fires); this
module only classifies what changed.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def schema_map(df: DataFrame) -> dict[str, str]:
    """Column → simple type string, in column order (dict preserves it)."""
    return dict(df.dtypes)


def schema_json(df: DataFrame) -> str:
    """Canonical JSON rendering of :func:`schema_map` (sorted keys so two
    equal schemas always serialize identically)."""
    return json.dumps(schema_map(df), sort_keys=True)


def schema_drift(prev: dict[str, str], cur: dict[str, str]) -> list[dict[str, str]]:
    """Classify the drift between two schema maps.

    Returns one record per changed column:
    ``{"column", "change": ADD|DROP|RETYPE, "from_type", "to_type"}``
    (empty strings where a side does not exist).  Column *order* changes are
    not drift — the canonical JSON sorts keys, and the checksum's
    concat_ws row-repr is order-sensitive only through the column list the
    engine passes, which it always derives from the current DataFrame.
    """
    out: list[dict[str, str]] = []
    for c in cur:
        if c not in prev:
            out.append({"column": c, "change": "ADD", "from_type": "", "to_type": cur[c]})
        elif prev[c] != cur[c]:
            out.append(
                {"column": c, "change": "RETYPE", "from_type": prev[c], "to_type": cur[c]}
            )
    for c in prev:
        if c not in cur:
            out.append({"column": c, "change": "DROP", "from_type": prev[c], "to_type": ""})
    return out
