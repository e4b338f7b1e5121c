"""Recursive CTE (Spark 4): the depth-bounded path enumeration matches an
independent Python expansion, and the same SQL text runs on both engines
(the parity half is covered by test_oracle_parity / the driver)."""

from __future__ import annotations

import duckdb

from cdc_lite_spark.queries import _RECURSIVE_PATHS_SQL


def _expected_paths(edges: set[tuple[str, str]], max_depth: int = 3):
    out = set()
    frontier = [(1, a, b, f"{a}>{b}") for a, b in edges]
    while frontier:
        out.update(frontier)
        nxt = []
        for depth, start, end, path in frontier:
            if depth >= max_depth:
                continue
            for a, b in edges:
                if a == end:
                    nxt.append((depth + 1, start, b, f"{path}>{b}"))
        frontier = nxt
    return out


def test_recursive_paths_match_python_expansion(spark):
    rows = [
        (1, "u1", "a", 1),
        (2, "u1", "b", 2),
        (3, "u1", "c", 3),
        (4, "u2", "b", 1),
        (5, "u2", "a", 2),  # cycle in the TYPE graph: a->b and b->a
        (6, "u2", "b", 3),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts long"
    )
    ev.createOrReplaceTempView("__rcte_toy")
    got = {
        (r["depth"], r["start_type"], r["end_type"], r["path"])
        for r in spark.sql(_RECURSIVE_PATHS_SQL.format(table="__rcte_toy")).collect()
    }
    edges = {("a", "b"), ("b", "c"), ("b", "a")}
    assert got == _expected_paths(edges)
    # the cyclic type graph terminated because recursion is depth-bounded
    assert max(d for d, *_ in got) == 3


def test_recursive_sql_is_dialect_common(spark):
    """The registered oracle string must run verbatim in DuckDB too (on a
    toy relation) — the construct itself is the parity surface."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "(1, 'u', 'a', 1), (2, 'u', 'b', 2), (3, 'u', 'a', 3)"
        ") AS v(event_id, user_id, event_type, ts)"
    )
    rows = con.execute(_RECURSIVE_PATHS_SQL.format(table="t")).fetchall()
    edges = {("a", "b"), ("b", "a")}
    assert {(r[0], r[1], r[2], r[3]) for r in rows} == _expected_paths(edges)
