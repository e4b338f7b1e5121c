"""Maintained aggregate views in the engine loop: per-tick O(delta) folds
of registered aggregates, replay-idempotent and self-healing
(engine.py register_agg_view / view / _maintain_views)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine


def _engine(spark, tmp_path) -> CdcEngine:
    return CdcEngine(
        spark, output_dir=str(tmp_path / "changes"), state_dir=str(tmp_path / "state")
    )


def _orders(spark, tables):
    # DECIMAL values: the maintained sum must be bit-equal to a rescan
    return tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )


def _recompute(df):
    return {
        r["o_orderstatus"]: (r["s"], r["c"])
        for r in df.groupBy("o_orderstatus")
        .agg(F.sum("price").alias("s"), F.count("price").alias("c"))
        .collect()
    }


def _view_dict(vdf):
    return {
        r["o_orderstatus"]: (r["agg_sum"], r["agg_count"]) for r in vdf.collect()
    }


def test_view_maintained_across_ticks_equals_recompute(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("rev", "orders", ["o_orderstatus"], "price")
    base = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}

    eng.poll_once({"orders": base}, mode="diff", keys=keys)
    assert _view_dict(eng.view("rev")) == _recompute(base)

    k = F.col("o_orderkey")
    mutated = base.filter(k % 5 != 0).withColumn(
        "price", F.when(k % 3 == 0, F.col("price") * 2).otherwise(F.col("price"))
    )
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)
    assert _view_dict(eng.view("rev")) == _recompute(mutated)

    # unchanged tick: no capture, view state version stays committed
    assert eng.poll_once({"orders": mutated}, mode="diff", keys=keys) == []
    assert _view_dict(eng.view("rev")) == _recompute(mutated)


def test_late_registered_view_heals_from_snapshots(spark, tables, tmp_path):
    """A view registered AFTER ticks already ran initializes from the
    current snapshot on its first fold — no log replay required."""
    eng = _engine(spark, tmp_path)
    base = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": base}, mode="diff", keys=keys)

    eng.register_agg_view("late", "orders", ["o_orderstatus"], "price")
    mutated = base.filter(F.col("o_orderkey") % 7 != 0)
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)
    assert _view_dict(eng.view("late")) == _recompute(mutated)


def test_maintain_views_is_replay_idempotent(spark, tables, tmp_path):
    """Re-running the fold for an already-folded snapshot version is a
    no-op — the version-stamped state is the replay guard."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("rev", "orders", ["o_orderstatus"], "price")
    base = _orders(spark, tables)
    eng.poll_once({"orders": base}, mode="diff", keys={"orders": ["o_orderkey"]})
    before = _view_dict(eng.view("rev"))
    eng._maintain_views("orders", 1, ["o_orderkey"])  # replayed tick
    assert _view_dict(eng.view("rev")) == before


def test_histogram_view_counts_match_rebuild(spark, tables, tmp_path):
    from cdc_lite_spark.operators.histogram import histogram_state

    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "price_hist",
        "orders",
        ["o_orderstatus"],
        "price",
        kind="histogram",
        lo=0.0,
        hi=600000.0,
        bins=16,
    )
    base = _orders(spark, tables).withColumn(
        "price", F.col("price").cast("double")
    )
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": base}, mode="diff", keys=keys)
    mutated = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "price",
        F.when(F.col("o_orderkey") % 9 == 0, F.col("price") * 3).otherwise(
            F.col("price")
        ),
    )
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)

    got = {
        (r["o_orderstatus"], r["bucket"]): r["bkt_count"]
        for r in eng.view("price_hist").collect()
    }
    want = {
        (r["o_orderstatus"], r["bucket"]): r["bkt_count"]
        for r in histogram_state(
            mutated, ["o_orderstatus"], "price", 0.0, 600000.0, 16
        ).collect()
    }
    assert got == want


def test_view_registration_validation(spark, tmp_path):
    import pytest

    eng = _engine(spark, tmp_path)
    with pytest.raises(ValueError, match="kind"):
        eng.register_agg_view("x", "t", ["k"], "v", kind="median")
    with pytest.raises(ValueError, match="lo/hi"):
        eng.register_agg_view("x", "t", ["k"], "v", kind="histogram")
    with pytest.raises(ValueError, match="no registered view"):
        eng.view("nope")
    eng.register_agg_view("x2", "t", ["k"], "v")
    with pytest.raises(ValueError, match="no materialized state"):
        eng.view("x2")


def test_key_valued_view_survives_a_changing_tick(spark, tables, tmp_path):
    """The CLI-shaped view (aggregate the PK per group) must keep folding
    after a real change tick — the diff has no prev_ twin for keys, so the
    fold falls back to the coalesced key column (review finding: this
    crashed with UNRESOLVED_COLUMN on the second tick)."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("pk", "region", ["r_name"], "r_regionkey")
    keys = {"region": ["r_regionkey"]}
    eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys)
    mutated = tables["region"].filter(F.col("r_regionkey") != 2)
    eng.poll_once({"region": mutated}, mode="diff", keys=keys)
    got = {r["r_name"]: r["agg_rows"] for r in eng.view("pk").collect()}
    want = {
        r["r_name"]: r["c"]
        for r in mutated.groupBy("r_name").agg(F.count("*").alias("c")).collect()
    }
    assert got == want


def test_bad_view_is_isolated_from_capture_and_other_views(spark, tables, tmp_path, capsys):
    """A view whose spec cannot fold (group key missing from the table)
    logs per tick but never blocks the capture, the healthy views, or
    snapshot GC (review finding: the error used to abort the capture,
    leaving the checksum unrecorded and snapshots accumulating forever)."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("bad", "region", ["no_such_col"], "r_regionkey")
    eng.register_agg_view("good", "region", ["r_name"], "r_regionkey")
    keys = {"region": ["r_regionkey"]}

    assert eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys) == ["region"]
    assert "error maintaining view bad" in capsys.readouterr().out
    assert eng.view("good").count() == 5
    # capture committed: an unchanged tick short-circuits (checksum recorded)
    assert eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys) == []
    # snapshot GC still ran on later ticks: mutate twice, check version count
    m1 = tables["region"].filter(F.col("r_regionkey") != 0)
    m2 = m1.filter(F.col("r_regionkey") != 1)
    eng.poll_once({"region": m1}, mode="diff", keys=keys)
    eng.poll_once({"region": m2}, mode="diff", keys=keys)
    import os

    vdirs = [
        d for d in os.listdir(str(tmp_path / "state" / "snapshots" / "region"))
        if d.startswith("v=")
    ]
    assert len(vdirs) <= CdcEngine.SNAPSHOT_VERSIONS_KEPT
    assert eng.view("good").count() == 3


def test_view_quantiles_reads_spec_edges(spark, tables, tmp_path):
    """view_quantiles interpolates from the maintained histogram state
    using the edges stored in the registered spec, and matches the
    operator applied directly to the state."""
    import pytest

    from cdc_lite_spark.operators.histogram import quantiles_from_histogram

    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "ph", "orders", ["o_orderstatus"], "price",
        kind="histogram", lo=0.0, hi=600000.0, bins=16,
    )
    eng.register_agg_view("sc", "orders", ["o_orderstatus"], "price")
    base = _orders(spark, tables).withColumn("price", F.col("price").cast("double"))
    eng.poll_once({"orders": base}, mode="diff", keys={"orders": ["o_orderkey"]})

    got = {
        (r["o_orderstatus"], r["q"]): r["quantile_est"]
        for r in eng.view_quantiles("ph", [0.5, 0.9]).collect()
    }
    want = {
        (r["o_orderstatus"], r["q"]): r["quantile_est"]
        for r in quantiles_from_histogram(
            eng.view("ph"), ["o_orderstatus"], [0.5, 0.9], 0.0, 600000.0, 16
        ).collect()
    }
    assert got == want and got
    for (g, _), _ in got.items():
        assert got[(g, 0.5)] <= got[(g, 0.9)]
    with pytest.raises(ValueError, match="not histogram"):
        eng.view_quantiles("sc", [0.5])
    with pytest.raises(ValueError, match="no registered view"):
        eng.view_quantiles("absent", [0.5])


def test_respec_with_different_edges_is_refused(spark, tables, tmp_path):
    """The spec a view's persisted state was built with is pinned beside
    the state: re-registering the same name with different bucket edges
    (e.g. after a restart) must refuse instead of silently reinterpreting
    old counts under new edges."""
    import pytest

    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "ph", "region", ["r_name"], "r_regionkey",
        kind="histogram", lo=0.0, hi=10.0, bins=4,
    )
    keys = {"region": ["r_regionkey"]}
    eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys)
    assert eng.view("ph").count() > 0

    eng2 = _engine(spark, tmp_path)  # restart with drifted edges
    eng2.register_agg_view(
        "ph", "region", ["r_name"], "r_regionkey",
        kind="histogram", lo=0.0, hi=20.0, bins=4,
    )
    with pytest.raises(ValueError, match="built with spec"):
        eng2.view("ph")
    # the fold path refuses too (isolated: capture itself still works)
    mutated = tables["region"].filter(F.col("r_regionkey") != 4)
    assert eng2.poll_once({"region": mutated}, mode="diff", keys=keys) == ["region"]
    # matching re-registration reads fine
    eng3 = _engine(spark, tmp_path)
    eng3.register_agg_view(
        "ph", "region", ["r_name"], "r_regionkey",
        kind="histogram", lo=0.0, hi=10.0, bins=4,
    )
    assert eng3.view("ph").count() > 0


def test_lagging_view_retries_on_unchanged_tick(spark, tables, tmp_path):
    """A view that lags (here: registered after the capture) catches up on
    the NEXT tick even when the table is unchanged — the retry path for
    transiently failed folds on quiet tables."""
    eng = _engine(spark, tmp_path)
    keys = {"region": ["r_regionkey"]}
    eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys)

    eng.register_agg_view("lag", "region", ["r_name"], "r_regionkey")
    # unchanged tick: no capture, but the lagging view folds from the
    # current snapshot
    assert eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys) == []
    assert eng.view("lag").count() == 5


def test_failed_first_fold_does_not_pin_spec(spark, tables, tmp_path):
    """A registration whose fold never succeeded pins nothing: correcting
    the spec (fixing a typo'd column) must just work — only state that
    actually materialized locks its spec."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("v", "region", ["no_such_col"], "r_regionkey")
    keys = {"region": ["r_regionkey"]}
    eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys)

    eng2 = _engine(spark, tmp_path)  # corrected registration after restart
    eng2.register_agg_view("v", "region", ["r_name"], "r_regionkey")
    mutated = tables["region"].filter(F.col("r_regionkey") != 3)
    eng2.poll_once({"region": mutated}, mode="diff", keys=keys)
    assert eng2.view("v").count() == 4
    # ... and NOW the corrected spec is pinned
    import pytest

    eng3 = _engine(spark, tmp_path)
    eng3.register_agg_view("v", "region", ["r_comment"], "r_regionkey")
    with pytest.raises(ValueError, match="built with spec"):
        eng3.view("v")


def test_quiet_tick_retry_is_isolated_per_table(spark, tables, tmp_path):
    """A view on a table whose keys are missing from THIS poll call must
    not abort the tick for the other tables (H6 discipline on the retry
    path too)."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("rv", "region", ["r_name"], "r_regionkey")
    eng.poll_once(
        {"region": tables["region"]},
        mode="diff",
        keys={"region": ["r_regionkey"]},
    )
    # later poll spans both tables but carries keys only for nation:
    # region (unchanged, has a view, no keys entry) must not raise
    captured = eng.poll_once(
        {"region": tables["region"], "nation": tables["nation"]},
        mode="diff",
        keys={"nation": ["n_nationkey"]},
    )
    assert captured == ["nation"]
