"""The driver checks only the FIRST 50 queries() entries — the rotation
contract (never-driver-verified first, then least-recently-verified) is
what guarantees every query eventually earns a CORRECTNESS row.  Pin it.
"""

from __future__ import annotations

import glob
import json
import os

from cdc_lite_spark.queries import REGISTRY, _ordered_names, oracle_sql, queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_verified() -> set[str]:
    """EXACTLY the production verification rule — a green row, or a
    rows-only `no_oracle` row while the query still has no oracle.  Reuse
    `_verification_history()` so the two definitions can never diverge
    (they did in r4, when the first `no_oracle` rows landed)."""
    from cdc_lite_spark.queries import _verification_history

    return set(_verification_history())


def _green_rows() -> set[str]:
    seen = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                seen.add(name)
    return seen


def test_never_verified_queries_lead_the_window():
    names = _ordered_names()
    verified = _driver_verified() & set(REGISTRY)
    never = [n for n in names if n not in verified]
    # every never-verified query sorts before every verified one
    if never and len(never) < len(names):
        last_never = max(names.index(n) for n in never)
        first_verified = min(names.index(n) for n in names if n in verified)
        assert last_never < first_verified


def test_ordering_is_deterministic_and_complete():
    a, b = _ordered_names(), _ordered_names()
    assert a == b
    assert set(a) == set(REGISTRY)
    assert list(queries()) == a
    # oracle_sql preserves the same order for its subset
    osql = list(oracle_sql())
    assert osql == [n for n in a if REGISTRY[n].oracle is not None]


def test_driver_history_rounds_are_all_marked_seen():
    """Every query green in any CORRECTNESS_r*.json must be marked seen by
    the rotation bookkeeping (else the driver wastes window slots
    re-checking it while never-verified queries starve)."""
    from cdc_lite_spark.queries import _verification_history

    seen = _verification_history()
    for name in _green_rows() & set(REGISTRY):
        assert name in seen, name


def test_window_contains_every_unseen_query():
    """All never-driver-verified queries must fit inside (and lead) the
    driver's 50-query window so the next round actually checks them."""
    from cdc_lite_spark.queries import _verification_history

    seen = _verification_history()
    unseen = [n for n in REGISTRY if n not in seen]
    window = _ordered_names()[:50]
    overflow = [n for n in unseen if n not in window]
    assert not overflow, (len(unseen), overflow)


def test_window_is_overwhelmingly_oracle_checkable():
    """The driver's 50-query window should spend its slots on hash-checked
    verification.  Genuinely non-SQL-expressible queries (iterative BPE,
    mapInPandas multimodal) DO belong in the window exactly once — the
    rows-only driver row is the only driver check they can earn, and the
    rotation retires them once it lands — but they must stay a small
    minority and each must already be pinned by a dedicated test."""
    window = _ordered_names()[:50]
    rows_only = [n for n in window if REGISTRY[n].oracle is None]
    assert len(rows_only) <= 5, rows_only
    # every rows-only window entry carries an explanatory description
    for n in rows_only:
        assert REGISTRY[n].description, n
