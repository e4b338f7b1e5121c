"""Every registered query must match its DuckDB oracle — the local mirror of
the driver's correctness gate (run at sf0.001 for speed; the driver runs
sf0.01)."""

from __future__ import annotations

import pytest

from cdc_lite_spark.oracle import compare_query, duck_connection
from cdc_lite_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY.keys()))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    ok, msg = compare_query(spark, duck, name, sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_has_entry_and_runs(spark, sf_dir):
    from cdc_lite_spark.queries import oracle_sql, queries

    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    # every query at least declares a description
    for name, qd in REGISTRY.items():
        assert qd.description, name


def test_registry_names_unique_and_oracles_parse(duck):
    """Every oracle SQL must at least plan in DuckDB (cheap syntax gate —
    the driver runs these verbatim)."""
    from cdc_lite_spark.queries import REGISTRY

    assert len(REGISTRY) == len(set(REGISTRY))
    for name, qd in REGISTRY.items():
        if qd.oracle is not None:
            duck.execute("EXPLAIN " + qd.oracle)
