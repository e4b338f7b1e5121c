"""Mergeable HLL distinct-sketch state (operators/sketches.py).

Pins the three properties the 100 TB story rests on: lossless mergeability
(union of per-grain sketches == one global sketch), bounded state size, and
incremental maintenance folding a new batch in O(|state|).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.sketches import (
    DEFAULT_LGK,
    distinct_sketch_state,
    merge_states,
    rollup_estimates,
)
from cdc_lite_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    ev = load_table(spark, SF, "events")
    return ev.select(
        (F.year("ts") * 100 + F.month("ts")).cast("int").alias("period"), "user_id"
    )


def test_rollup_estimate_equals_from_scratch_estimate(spark):
    """Merging per-month sketches gives the SAME estimate as sketching the
    whole column at once — the register-max merge is lossless, so sketch
    state composes exactly, not approximately."""
    ev = _events(spark)
    state = distinct_sketch_state(ev, ["period"], "user_id")
    merged = rollup_estimates(state).collect()[0]
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(DEFAULT_LGK))
        ).alias("est")
    ).collect()[0]
    assert merged["distinct_estimate"] == direct["est"]


def test_estimates_within_tolerance_of_exact(spark):
    ev = _events(spark)
    state = distinct_sketch_state(ev, ["period"], "user_id")
    est = {r["period"]: r["distinct_estimate"] for r in rollup_estimates(state, ["period"]).collect()}
    exact = {
        r["period"]: r["n"]
        for r in ev.groupBy("period").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for p, n in exact.items():
        assert abs(est[p] - n) / n <= 0.05, (p, est[p], n)


def test_sketch_state_is_bounded(spark):
    """A sketch never exceeds ~2^lgk registers plus header, no matter how
    many rows it summarizes — the reason per-grain state stays KB-sized."""
    ev = _events(spark)
    state = distinct_sketch_state(ev, ["period"], "user_id")
    sizes = [len(r["sketch"]) for r in state.select("sketch").collect()]
    assert sizes and max(sizes) <= (1 << DEFAULT_LGK) + 64


def test_incremental_merge_matches_full_rebuild(spark):
    """Folding a new batch's state into existing state (merge_states) gives
    the same estimates as rebuilding state from all rows — per grain, for
    grains that overlap and grains unique to one side."""
    ev = _events(spark)
    old = ev.filter(F.col("user_id") % 3 != 0)
    new = ev.filter(F.col("user_id") % 3 == 0)  # overlaps every period
    folded = merge_states(
        distinct_sketch_state(old, ["period"], "user_id"),
        distinct_sketch_state(new, ["period"], "user_id"),
        ["period"],
    )
    a = {
        r["period"]: (r["distinct_estimate"], r["n_rows"])
        for r in rollup_estimates(folded, ["period"]).collect()
    }
    b = {
        r["period"]: (r["distinct_estimate"], r["n_rows"])
        for r in rollup_estimates(
            distinct_sketch_state(ev, ["period"], "user_id"), ["period"]
        ).collect()
    }
    assert a == b
