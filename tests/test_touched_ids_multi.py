"""Focused tests for the r14 fused touched-bucket collect
(`streaming/bucketed.py touched_ids_multi`) and the `run_writes` ≤2-write
same-thread shortcut — the two tick-internals optimizations must be
observably equivalent to the per-replica / pooled paths they replace."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark.streaming._state import run_writes
from cdc_lite_spark.streaming.bucketed import BucketedReplica, touched_ids_multi


@pytest.fixture()
def breps(spark, tmp_path):
    f = BucketedReplica(
        spark, str(tmp_path / "f"), 4, ["k"], "k bigint, v string"
    )
    d = BucketedReplica(
        spark, str(tmp_path / "d"), 3, ["c"], "c bigint, m string"
    )
    p = BucketedReplica(
        spark, str(tmp_path / "p"), 5, ["fk"], "fk bigint, __fb int, __cnt bigint"
    )
    return f, d, p


def test_touched_ids_multi_matches_per_replica_touched_ids(spark, breps):
    f, d, p = breps
    fdf = spark.createDataFrame(
        [(i, f"v{i}") for i in range(17)], "k bigint, v string"
    )
    ddf = spark.createDataFrame(
        [(i * 3, f"m{i}") for i in range(6)], "c bigint, m string"
    )
    pdf = spark.createDataFrame(
        [(i * 7, i % 5, 1) for i in range(9)], "fk bigint, __fb int, __cnt bigint"
    )
    got = touched_ids_multi([("f", f, fdf), ("d", d, ddf), ("p", p, pdf)])
    assert got == {
        "f": f.touched_ids(fdf),
        "d": d.touched_ids(ddf),
        "p": p.touched_ids(pdf),
    }
    # ids sorted, complete, and within range — the contract the pruned
    # reads/writes depend on
    assert got["f"] == sorted(got["f"])
    assert all(0 <= b < 4 for b in got["f"])


def test_touched_ids_multi_empty_delta_yields_empty_list(spark, breps):
    f, d, _p = breps
    empty = spark.createDataFrame([], "c bigint, m string")
    fdf = spark.createDataFrame([(1, "a")], "k bigint, v string")
    got = touched_ids_multi([("f", f, fdf), ("d", d, empty)])
    assert got["d"] == []
    assert got["f"] == f.touched_ids(fdf)


def test_touched_ids_multi_null_key_components_match(spark, breps):
    f, _d, _p = breps
    fdf = spark.createDataFrame(
        [(None, "x"), (2, "y")], "k bigint, v string"
    )
    got = touched_ids_multi([("f", f, fdf)])
    assert got["f"] == f.touched_ids(fdf)


def test_run_writes_two_writes_pooled_results_complete():
    import threading

    calls: list[tuple[str, str]] = []

    def mk(label):
        def fn():
            calls.append((label, threading.current_thread().name))
            return f"ret-{label}"

        return fn

    # 2-write ticks stay POOLED (r14 A/B: the flat gate's agg write must
    # overlap the O(table) replica write; the same-thread shortcut cost
    # ~1.5 s/run) — results keyed by label, both writes run
    out = run_writes([("a", mk("a")), ("b", mk("b"))])
    assert out == {"a": "ret-a", "b": "ret-b"}
    assert sorted(c for c, _t in calls) == ["a", "b"]
    # only the trivial single-write tick runs on the calling thread
    calls.clear()
    out = run_writes([("solo", mk("solo"))])
    assert out == {"solo": "ret-solo"}
    assert calls[0][1] == threading.current_thread().name


def test_run_writes_three_writes_pool_propagates_failure():
    def ok():
        return 1

    def boom():
        raise RuntimeError("phase-1 write failed")

    with pytest.raises(RuntimeError, match="phase-1 write failed"):
        run_writes([("a", ok), ("b", boom), ("c", ok)])
