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


# -- distinct_count views (HLL sketch state, merge-only folds) ---------------


def _exact_distinct(df, key, val):
    return {
        r[key]: (r["d"], r["n"])
        for r in df.groupBy(key)
        .agg(F.countDistinct(val).alias("d"), F.count("*").alias("n"))
        .collect()
    }


def _estimates(eng, name, key):
    return {
        r[key]: (r["distinct_estimate"], r["n_rows"])
        for r in eng.view_distinct_counts(name).collect()
    }


def _rebuild_estimates(spark, df, key, val, lgk=12):
    from cdc_lite_spark.operators.sketches import distinct_sketch_state

    state = distinct_sketch_state(df, [key], val, lgk)
    return {
        r[key]: (r["est"], r["n_rows"])
        for r in state.select(
            key, F.hll_sketch_estimate("sketch").alias("est"), "n_rows"
        ).collect()
    }


def test_distinct_view_insert_only_fold_equals_rebuild_exactly(spark, tables, tmp_path):
    """Insert-only ticks fold by LOSSLESS sketch merge: the maintained
    estimate must equal the from-scratch estimate EXACTLY (register-max
    union), pinned by spying that merge_states (not a rebuild) ran."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "du", "orders", ["o_orderstatus"], "o_custkey", kind="distinct_count"
    )
    orders = tables["orders"].select("o_orderkey", "o_orderstatus", "o_custkey")
    base = orders.filter(F.col("o_orderkey") % 3 == 0)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": base}, mode="diff", keys=keys)
    assert _estimates(eng, "du", "o_orderstatus") == _rebuild_estimates(
        spark, base, "o_orderstatus", "o_custkey"
    )

    grown = orders.filter(
        (F.col("o_orderkey") % 3 == 0) | (F.col("o_orderkey") % 5 == 0)
    )
    import cdc_lite_spark.operators.sketches as sk

    calls, orig = [], sk.merge_states

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    sk.merge_states = spy
    try:
        eng.poll_once({"orders": grown}, mode="diff", keys=keys)
    finally:
        sk.merge_states = orig
    assert calls, "insert-only tick must take the merge fold, not a rebuild"
    assert _estimates(eng, "du", "o_orderstatus") == _rebuild_estimates(
        spark, grown, "o_orderstatus", "o_custkey"
    )


def test_distinct_view_retraction_degrades_to_rebuild(spark, tables, tmp_path):
    """DELETEs (and group-moving or value-changing UPDATEs) cannot retract
    from an HLL — the fold degrades to a rebuild from the current snapshot
    and the result still matches a from-scratch build."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "du", "orders", ["o_orderstatus"], "o_custkey", kind="distinct_count"
    )
    orders = tables["orders"].select("o_orderkey", "o_orderstatus", "o_custkey")
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)

    import cdc_lite_spark.operators.sketches as sk

    calls, orig = [], sk.merge_states

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    shrunk = orders.filter(F.col("o_orderkey") % 7 != 0)
    sk.merge_states = spy
    try:
        eng.poll_once({"orders": shrunk}, mode="diff", keys=keys)
    finally:
        sk.merge_states = orig
    assert not calls, "a deleting tick must rebuild, not merge"
    assert _estimates(eng, "du", "o_orderstatus") == _rebuild_estimates(
        spark, shrunk, "o_orderstatus", "o_custkey"
    )
    # sanity: the estimate is near the exact count on this data
    exact = _exact_distinct(shrunk, "o_orderstatus", "o_custkey")
    for k, (est, n) in _estimates(eng, "du", "o_orderstatus").items():
        assert abs(est - exact[k][0]) <= 0.1 * exact[k][0]
        assert n == exact[k][1]


def test_distinct_view_group_moving_update_rebuilds(spark, tables, tmp_path):
    """An UPDATE that moves rows across GROUPS (value unchanged) is a
    retraction from the old group's sketch — must rebuild, and match."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "du", "nation", ["n_regionkey"], "n_name", kind="distinct_count"
    )
    keys = {"nation": ["n_nationkey"]}
    base = tables["nation"]
    eng.poll_once({"nation": base}, mode="diff", keys=keys)
    moved = base.withColumn(
        "n_regionkey",
        F.when(F.col("n_nationkey") % 6 == 1, F.lit(99)).otherwise(
            F.col("n_regionkey")
        ),
    )
    eng.poll_once({"nation": moved}, mode="diff", keys=keys)
    assert _estimates(eng, "du", "n_regionkey") == _rebuild_estimates(
        spark, moved, "n_regionkey", "n_name"
    )


def test_distinct_view_validation_and_spec(spark, tables, tmp_path):
    import pytest

    eng = _engine(spark, tmp_path)
    eng.register_agg_view("sc", "region", ["r_name"], "r_regionkey")
    with pytest.raises(ValueError, match="not distinct_count"):
        eng.view_distinct_counts("sc")
    with pytest.raises(ValueError, match="no registered view"):
        eng.view_distinct_counts("absent")

    # lgk is part of the pinned spec: a restart with a different lgk refuses
    eng.register_agg_view(
        "du", "region", ["r_name"], "r_regionkey", kind="distinct_count", lgk=12
    )
    keys = {"region": ["r_regionkey"]}
    eng.poll_once({"region": tables["region"]}, mode="diff", keys=keys)
    assert eng.view_distinct_counts("du").count() == 5

    eng2 = _engine(spark, tmp_path)
    eng2.register_agg_view(
        "du", "region", ["r_name"], "r_regionkey", kind="distinct_count", lgk=14
    )
    with pytest.raises(ValueError, match="built with spec"):
        eng2.view("du")


# -- min_max views (monotone-under-inserts extrema, rebuild on retract) ------


def _minmax_recompute(df, key, val):
    return {
        r[key]: (r["mn"], r["mx"], r["c"], r["n"])
        for r in df.groupBy(key)
        .agg(
            F.min(val).alias("mn"),
            F.max(val).alias("mx"),
            F.count(val).alias("c"),
            F.count("*").alias("n"),
        )
        .collect()
    }


def _minmax_view(eng, name, key):
    return {
        r[key]: (r["agg_min"], r["agg_max"], r["agg_count"], r["agg_rows"])
        for r in eng.view(name).collect()
    }


def test_minmax_view_insert_only_fold_is_exact(spark, tables, tmp_path):
    """min/max are monotone under inserts: an insert-only tick folds via
    apply_min_max_inserts (pinned by a spy) and the state equals a
    from-scratch rebuild exactly."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("mm", "orders", ["o_orderstatus"], "price", kind="min_max")
    orders = tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    base = orders.filter(F.col("o_orderkey") % 3 == 0)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": base}, mode="diff", keys=keys)
    assert _minmax_view(eng, "mm", "o_orderstatus") == _minmax_recompute(
        base, "o_orderstatus", "price"
    )

    import cdc_lite_spark.operators.incremental as inc

    calls, orig = [], inc.apply_min_max_inserts

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    grown = orders.filter(
        (F.col("o_orderkey") % 3 == 0) | (F.col("o_orderkey") % 5 == 0)
    )
    inc.apply_min_max_inserts = spy
    try:
        eng.poll_once({"orders": grown}, mode="diff", keys=keys)
    finally:
        inc.apply_min_max_inserts = orig
    assert calls, "insert-only tick must take the extrema fold, not a rebuild"
    assert _minmax_view(eng, "mm", "o_orderstatus") == _minmax_recompute(
        grown, "o_orderstatus", "price"
    )


def test_minmax_view_retraction_rebuilds_and_matches(spark, tables, tmp_path):
    """A DELETE may remove the current extremum — the fold degrades to a
    rebuild and the state still matches a recompute (including the case
    where the deleted rows WERE the min/max)."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("mm", "orders", ["o_orderstatus"], "price", kind="min_max")
    orders = tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)
    before = _minmax_view(eng, "mm", "o_orderstatus")

    # delete each group's current maximum rows: a fold that ignored the
    # retraction would keep the stale max
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus")
    shrunk = (
        orders.withColumn("__mx", F.max("price").over(w))
        .filter(F.col("price") != F.col("__mx"))
        .drop("__mx")
    )
    eng.poll_once({"orders": shrunk}, mode="diff", keys=keys)
    after = _minmax_view(eng, "mm", "o_orderstatus")
    assert after == _minmax_recompute(shrunk, "o_orderstatus", "price")
    for k in after:
        assert after[k][1] < before[k][1]  # the max actually came down


# -- maintained JOIN views (engine-loop form of operators/incremental.py) ----


def _join_db(tmp_path) -> str:
    """An operational DuckDB: orders fact → cust dim, with a dangling fact
    (o_ck=5 has no dim row) to exercise re-surfacing on dim INSERT."""
    import duckdb

    db = str(tmp_path / "ops.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE orders (o_id INTEGER, o_ck INTEGER, o_price DOUBLE)")
    con.execute("CREATE TABLE cust (c_ck INTEGER, c_seg VARCHAR, c_bal DOUBLE)")
    con.execute(
        "INSERT INTO orders VALUES (1,1,10.0),(2,1,20.0),(3,2,30.0),"
        "(4,3,40.0),(5,4,50.0),(6,5,60.0)"
    )
    con.execute(
        "INSERT INTO cust VALUES (1,'A',100.0),(2,'B',200.0),(3,'A',300.0),"
        "(4,'C',400.0)"
    )
    con.close()
    return db


def _join_recompute(db: str) -> dict:
    import duckdb

    con = duckdb.connect(db, read_only=True)
    rows = con.execute(
        "SELECT o_id, o_ck, o_price, c_ck, c_seg, c_bal "
        "FROM orders JOIN cust ON o_ck = c_ck"
    ).fetchall()
    con.close()
    return {r[0]: r[1:] for r in rows}


def _join_sources(spark, db):
    from cdc_lite_spark.sources.duckdb_source import ConsistentSnapshotSource

    # the multi-table source: ONE tick-consistent copy shared by both
    # tables (per-table read_duckdb_table factories would be per-SCAN
    # snapshots whose plan-copy GC races across tables of one file)
    return ConsistentSnapshotSource(spark, db).sources(["orders", "cust"])


_JOIN_KEYS = {"orders": ["o_id"], "cust": ["c_ck"]}


def _register_join(eng):
    eng.register_join_view(
        "om",
        fact_table="orders",
        dim_table="cust",
        fact_key="o_id",
        fact_dim_col="o_ck",
        dim_key="c_ck",
    )


def _view_join_dict(eng):
    return {
        r["o_id"]: (r["o_ck"], r["o_price"], r["c_ck"], r["c_seg"], r["c_bal"])
        for r in eng.view("om").collect()
    }


def test_join_view_e2e_external_writer_both_sides(spark, tmp_path):
    """r7 verdict ask #1 done-condition: an external DuckDB writer mutates
    fact AND dim between polls and the maintained join view equals the
    DuckDB recompute each tick — including fact I/U/D, dim attribute
    update, a dim DELETE dropping its facts, and a dim INSERT re-surfacing
    a previously-dangling fact.  The fold tick must take the INCREMENTAL
    path (pinned by wrapping maintain_join), not a silent rebuild."""
    import duckdb

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    srcs = _join_sources(spark, db)

    # tick 1: initial build (full join of first snapshots)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    assert _view_join_dict(eng) == _join_recompute(db)

    # external writer mutates BOTH tables
    con = duckdb.connect(db)
    con.execute("INSERT INTO orders VALUES (7,2,70.0)")      # fact INSERT
    con.execute("UPDATE orders SET o_price = 11.0 WHERE o_id = 1")  # fact UPDATE
    con.execute("DELETE FROM orders WHERE o_id = 3")          # fact DELETE
    con.execute("UPDATE cust SET c_bal = 999.0 WHERE c_ck = 1")  # dim UPDATE
    con.execute("DELETE FROM cust WHERE c_ck = 4")            # drops order 5
    con.execute("INSERT INTO cust VALUES (5,'D',500.0)")      # resurfaces order 6
    con.close()

    # tick 2: both deltas fold through the incremental path
    import cdc_lite_spark.operators.incremental as inc

    calls = []
    orig = inc.maintain_join_with_changes

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    inc.maintain_join_with_changes = spy
    try:
        eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    finally:
        inc.maintain_join_with_changes = orig
    assert calls, "fold tick must use the incremental fold, not a rebuild"
    want = _join_recompute(db)
    assert _view_join_dict(eng) == want
    assert 5 not in want and 6 in want  # dim delete dropped / insert resurfaced

    # tick 3 (quiet): idempotent, basis unchanged
    basis_before = eng._read_join_basis("om")
    assert eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS) == []
    assert eng._read_join_basis("om") == basis_before
    assert _view_join_dict(eng) == want


def test_join_view_single_side_tick_folds(spark, tmp_path):
    """A tick where only ONE side changed folds with an empty delta on the
    unchanged side (the common steady-state shape)."""
    import duckdb

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)

    con = duckdb.connect(db)
    con.execute("UPDATE orders SET o_price = o_price * 2 WHERE o_ck = 1")
    con.close()
    assert eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS) == ["orders"]
    assert _view_join_dict(eng) == _join_recompute(db)


def test_late_registered_join_view_builds_then_folds(spark, tmp_path):
    """A join view registered AFTER ticks already ran initializes from the
    current snapshots on the next tick (changed or quiet)."""
    import duckdb

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)

    _register_join(eng)
    # quiet tick: late view builds from current snapshots
    assert eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS) == []
    assert _view_join_dict(eng) == _join_recompute(db)

    con = duckdb.connect(db)
    con.execute("DELETE FROM orders WHERE o_id = 2")
    con.close()
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    assert _view_join_dict(eng) == _join_recompute(db)


def test_join_view_rebuilds_past_snapshot_retention(spark, tmp_path):
    """A join view that lagged past snapshot retention (its basis versions
    GC'd) REBUILDS from the current snapshots instead of failing or going
    silently stale."""
    import duckdb

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)

    # detach the view, run several changing ticks so v=1 snapshots are GC'd
    spec = eng._join_views.pop("om")
    for price in (101.0, 102.0, 103.0):
        con = duckdb.connect(db)
        con.execute(f"UPDATE orders SET o_price = {price} WHERE o_id = 4")
        con.close()
        eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    eng._join_views["om"] = spec
    assert eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS) == []
    assert _view_join_dict(eng) == _join_recompute(db)


def test_join_view_spec_pinned_and_respec_refused(spark, tmp_path):
    """The join spec pins beside the state after the first successful
    build; a restart that re-registers the same name with a different join
    shape must refuse instead of folding mixed definitions."""
    import pytest

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    assert eng.view("om").count() > 0

    eng2 = _engine(spark, tmp_path)  # restart with a drifted fact FK column
    eng2.register_join_view(
        "om",
        fact_table="orders",
        dim_table="cust",
        fact_key="o_id",
        fact_dim_col="o_price",  # drifted
        dim_key="c_ck",
    )
    with pytest.raises(ValueError, match="built with spec"):
        eng2.view("om")
    # the fold path refuses too, isolated: the capture itself still works
    con = __import__("duckdb").connect(db)
    con.execute("DELETE FROM orders WHERE o_id = 1")
    con.close()
    assert sorted(eng2.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)) == ["orders"]


def test_join_view_errors_are_isolated(spark, tables, tmp_path, capsys):
    """A join view whose tables collide on column names logs per tick and
    lags; captures and agg views proceed (H6 discipline)."""
    eng = _engine(spark, tmp_path)
    # nation and region BOTH after a rename collide on 'shared'
    nation = tables["nation"].select(
        "n_nationkey", F.col("n_regionkey").alias("fk"), F.col("n_name").alias("shared")
    )
    region = tables["region"].select(
        "r_regionkey", F.col("r_name").alias("shared")
    )
    eng.register_join_view(
        "bad",
        fact_table="nat",
        dim_table="reg",
        fact_key="n_nationkey",
        fact_dim_col="fk",
        dim_key="r_regionkey",
    )
    eng.register_agg_view("good", "reg", ["shared"], "r_regionkey")
    keys = {"nat": ["n_nationkey"], "reg": ["r_regionkey"]}
    captured = eng.poll_once({"nat": nation, "reg": region}, mode="diff", keys=keys)
    assert sorted(captured) == ["nat", "reg"]
    assert "error maintaining view bad" in capsys.readouterr().out
    assert eng.view("good").count() == 5
    import pytest

    with pytest.raises(ValueError, match="no materialized state"):
        eng.view("bad")


def test_tick_diff_computed_once_and_shared(spark, tables, tmp_path):
    """r8 review: the prev→cur snapshot diff is the dominant per-tick cost
    and used to be recomputed by the log write, each agg-view fold, and
    each join-view fold.  One changed table with an agg view AND a join
    view calls snapshot_diff exactly TWICE on the changing tick: the log's
    live diff (at-least-once ordering), and ONE snapshot-vs-snapshot diff
    shared by every view fold — deliberately not the same plan, because a
    persist() is a cache, not storage: a lost executor recomputing the
    live diff could fold rows the recorded snapshot version doesn't
    contain (r8 review round 2)."""
    import cdc_lite_spark.engine as eng_mod

    eng = _engine(spark, tmp_path)
    nation = tables["nation"]
    region = tables["region"]
    eng.register_agg_view("per_region", "nation", ["n_regionkey"], "n_nationkey")
    eng.register_join_view(
        "nr",
        fact_table="nation",
        dim_table="region",
        fact_key="n_nationkey",
        fact_dim_col="n_regionkey",
        dim_key="r_regionkey",
    )
    keys = {"nation": ["n_nationkey"], "region": ["r_regionkey"]}
    eng.poll_once({"nation": nation, "region": region}, mode="diff", keys=keys)

    calls, orig = [], eng_mod.snapshot_diff

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    mutated = nation.filter(F.col("n_nationkey") % 5 != 0)
    eng_mod.snapshot_diff = spy
    try:
        # only nation changes: the log's live diff + ONE shared
        # snapshot-vs-snapshot diff consumed by the agg fold AND the join
        # fold (region side is empty) — never one diff per consumer
        eng.poll_once({"nation": mutated, "region": region}, mode="diff", keys=keys)
    finally:
        eng_mod.snapshot_diff = orig
    assert len(calls) == 2
    # and the shared diff produced correct states everywhere
    got = {r["n_regionkey"]: r["agg_rows"] for r in eng.view("per_region").collect()}
    want = {
        r["n_regionkey"]: r["c"]
        for r in mutated.groupBy("n_regionkey").agg(F.count("*").alias("c")).collect()
    }
    assert got == want
    assert eng.view("nr").count() == mutated.count()
    # the tick-scoped cache was dropped at tick end
    assert eng._tick_diffs == {}


def _join_agg_recompute(db):
    import duckdb

    con = duckdb.connect(db, read_only=True)
    rows = con.execute(
        "SELECT c_seg, sum(o_price), count(o_price), count(*) "
        "FROM orders JOIN cust ON o_ck = c_ck GROUP BY c_seg"
    ).fetchall()
    con.close()
    return {r[0]: (r[1], r[2], r[3]) for r in rows}


def _join_agg_view(eng, name):
    return {
        r["c_seg"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in eng.view(name).collect()
    }


def test_join_agg_view_e2e_folds_in_o_delta(spark, tmp_path):
    """The capstone composition IN THE ENGINE LOOP: an aggregate over the
    join view maintained from both tables' changes via view-level I/D
    records — the fold tick must take apply_delta (pinned by a spy), never
    re-aggregating the view or re-joining the tables, and equal the DuckDB
    recompute each tick."""
    import duckdb

    import cdc_lite_spark.operators.incremental as inc

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    eng.register_join_agg_view("seg_rev", "om", ["c_seg"], "o_price")
    srcs = _join_sources(spark, db)

    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    assert _join_agg_view(eng, "seg_rev") == _join_agg_recompute(db)

    con = duckdb.connect(db)
    con.execute("INSERT INTO orders VALUES (8,2,80.0)")
    con.execute("UPDATE orders SET o_price = 99.0 WHERE o_id = 1")
    con.execute("DELETE FROM orders WHERE o_id = 4")
    con.execute("UPDATE cust SET c_seg = 'Z' WHERE c_ck = 2")  # group move
    con.execute("DELETE FROM cust WHERE c_ck = 4")
    con.close()

    calls, orig = [], inc.apply_delta

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    inc.apply_delta = spy
    try:
        eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    finally:
        inc.apply_delta = orig
    assert calls, "agg-over-join fold must use apply_delta, not a rebuild"
    assert _join_agg_view(eng, "seg_rev") == _join_agg_recompute(db)

    # quiet tick: idempotent
    assert eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS) == []
    assert _join_agg_view(eng, "seg_rev") == _join_agg_recompute(db)


def test_late_join_agg_view_heals_on_quiet_tick(spark, tmp_path):
    """An aggregate registered AFTER the join view already materialized
    builds from the join view's persisted state on the next (even quiet)
    tick — one aggregation over the view, never a re-join."""
    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)

    eng.register_join_agg_view("late_rev", "om", ["c_seg"], "o_price")
    assert eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS) == []
    assert _join_agg_view(eng, "late_rev") == _join_agg_recompute(db)


def test_join_agg_view_validation(spark, tmp_path):
    import pytest

    eng = _engine(spark, tmp_path)
    with pytest.raises(ValueError, match="not a registered join view"):
        eng.register_join_agg_view("a", "nope", ["k"], "v")
    eng.register_join_view("j", "f", "d", "fk", "fdc", "dk")
    eng.register_join_agg_view("a", "j", ["k"], "v")
    with pytest.raises(ValueError, match="already registered"):
        eng.register_agg_view("a", "t", ["k"], "v")
    with pytest.raises(ValueError, match="already registered"):
        eng.register_join_agg_view("j", "j", ["k"], "v")
    with pytest.raises(ValueError, match="no materialized state"):
        eng.view("a")


def test_null_group_key_stays_one_group_across_folds(spark, tmp_path):
    """r8 review: the state⊕delta merge join must be NULL-SAFE on group
    keys — a plain column-list full-outer never matches NULL==NULL, so a
    NULL-keyed group used to split into duplicate rows with divided
    totals after the first fold."""
    rows = [(1, None, 10.0), (2, None, 20.0), (3, "a", 30.0), (4, "a", 5.0)]
    base = spark.createDataFrame(rows, "id int, grp string, val double")
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("g", "t", ["grp"], "val")
    eng.register_agg_view(
        "gm", "t", ["grp"], "val", kind="min_max"
    )
    eng.register_agg_view(
        "gh", "t", ["grp"], "val", kind="histogram", lo=0.0, hi=100.0, bins=4
    )
    keys = {"t": ["id"]}
    eng.poll_once({"t": base}, mode="diff", keys=keys)
    # second tick touches the NULL group again (insert + update)
    grown = base.unionByName(
        spark.createDataFrame([(5, None, 40.0)], "id int, grp string, val double")
    ).withColumn(
        "val", F.when(F.col("id") == 1, F.lit(11.0)).otherwise(F.col("val"))
    )
    eng.poll_once({"t": grown}, mode="diff", keys=keys)

    sc = {r["grp"]: (r["agg_sum"], r["agg_rows"]) for r in eng.view("g").collect()}
    assert len(sc) == 2 and sc[None] == (71.0, 3)
    mm = {r["grp"]: (r["agg_min"], r["agg_max"]) for r in eng.view("gm").collect()}
    assert len(mm) == 2 and mm[None] == (11.0, 40.0)
    hist_null = [
        (r["bucket"], r["bkt_count"])
        for r in eng.view("gh").filter(F.col("grp").isNull()).collect()
    ]
    assert sorted(hist_null) == [(0, 2), (1, 1)]  # 11→b0, 20→b0, 40→b1


def test_orphaned_join_agg_state_is_overwritten_on_fold(spark, tmp_path):
    """r8 review: an agg v=K left by a crashed pre-basis-flip tick must
    never be trusted — the retried fold rewrites it unconditionally, and
    view() reads only the version the join's basis pointer commits."""
    import duckdb

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    eng.register_join_agg_view("seg_rev", "om", ["c_seg"], "o_price")
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)  # basis v=1

    # simulate the crash window: a bogus agg v=2 exists, basis still v=1
    bogus = spark.createDataFrame(
        [("XX", 1.0, 1, 1)], "c_seg string, agg_sum double, agg_count long, agg_rows long"
    )
    bogus.write.mode("overwrite").parquet(
        str(tmp_path / "state" / "views" / "seg_rev" / "v=2")
    )
    # view() must NOT serve the uncommitted v=2
    assert "XX" not in _join_agg_view(eng, "seg_rev")

    con = duckdb.connect(db)
    con.execute("UPDATE orders SET o_price = 77.0 WHERE o_id = 1")
    con.close()
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)  # fold writes v=2
    got = _join_agg_view(eng, "seg_rev")
    assert "XX" not in got
    assert got == _join_agg_recompute(db)


def test_join_view_maintained_by_monitor_loop(spark, tmp_path):
    """The PRODUCT loop form: a continuously-running monitor (rate source →
    foreachBatch poll ticks) keeps the join view current while an external
    DuckDB writer mutates BOTH tables mid-run — the full reference
    deployment scenario (duckdb_cdc.go StartMonitoring) with the r8 join
    view folded inside each tick."""
    import time

    import duckdb

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    srcs = _join_sources(spark, db)

    q = eng.monitor(srcs, interval_seconds=1.0, mode="diff", keys=_JOIN_KEYS)
    try:
        # wait for the initial build
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            try:
                if _view_join_dict(eng) == _join_recompute(db):
                    break
            except ValueError:
                pass  # no materialized state yet
            time.sleep(1.0)
        else:
            raise AssertionError("initial join-view build never appeared")

        # external writer mutates both sides while the monitor runs
        con = duckdb.connect(db)
        con.execute("UPDATE orders SET o_price = 123.0 WHERE o_id = 2")
        con.execute("DELETE FROM cust WHERE c_ck = 3")  # drops order 4
        con.close()
        want = _join_recompute(db)
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            if _view_join_dict(eng) == want:
                break
            time.sleep(1.0)
        else:
            raise AssertionError("monitor loop never folded the mutation")
    finally:
        q.stop()
        q.awaitTermination(60)
    assert _view_join_dict(eng) == want and 4 not in want


def test_view_name_collision_across_kinds_is_refused(spark, tmp_path):
    import pytest

    eng = _engine(spark, tmp_path)
    eng.register_agg_view("x", "t", ["k"], "v")
    with pytest.raises(ValueError, match="already registered as an agg view"):
        eng.register_join_view("x", "f", "d", "fk", "fdc", "dk")
    eng.register_join_view("j", "f", "d", "fk", "fdc", "dk")
    with pytest.raises(ValueError, match="already registered as a join view"):
        eng.register_agg_view("j", "t", ["k"], "v")


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


# -- maintained MOMENTS views (Σv / Σv² / count — exactly retractable) --------


def _moments_recompute(df, key, val):
    v = F.col(val)
    return {
        r[key]: (r["s"], r["s2"], r["c"], r["n"])
        for r in df.groupBy(key)
        .agg(
            F.sum(v).alias("s"),
            F.sum(v * v).alias("s2"),
            F.count(v).alias("c"),
            F.count("*").alias("n"),
        )
        .collect()
    }


def _moments_view(eng, name, key):
    return {
        r[key]: (r["agg_sum"], r["agg_sum2"], r["agg_count"], r["agg_rows"])
        for r in eng.view(name).collect()
    }


def test_moments_view_fold_is_total_and_exact(spark, tables, tmp_path):
    """Σv and Σv² are abelian-group aggregates: a tick with DELETEs,
    value UPDATEs, and group-moving UPDATEs still folds (pinned by a spy —
    never a rebuild) and the state equals a from-scratch recompute exactly
    (DECIMAL values: no float fold-order drift)."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("mom", "orders", ["o_orderstatus"], "price", kind="moments")
    orders = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)
    assert _moments_view(eng, "mom", "o_orderstatus") == _moments_recompute(
        orders, "o_orderstatus", "price"
    )

    import cdc_lite_spark.operators.incremental as inc

    calls, orig = [], inc.apply_moments_delta

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    k = F.col("o_orderkey")
    mutated = (
        orders.filter(k % 5 != 0)  # DELETEs
        .withColumn(
            "price",
            F.when(k % 3 == 0, F.col("price") * 2).otherwise(F.col("price")),
        )  # value UPDATEs
        .withColumn(
            "o_orderstatus",
            F.when(k % 17 == 0, F.lit("Z")).otherwise(F.col("o_orderstatus")),
        )  # group-moving UPDATEs
    )
    inc.apply_moments_delta = spy
    try:
        eng.poll_once({"orders": mutated}, mode="diff", keys=keys)
    finally:
        inc.apply_moments_delta = orig
    assert calls, "a retracting tick must still FOLD moments, never rebuild"
    assert _moments_view(eng, "mom", "o_orderstatus") == _moments_recompute(
        mutated, "o_orderstatus", "price"
    )


def test_view_moments_derives_mean_variance_from_state(spark, tables, tmp_path):
    """view_moments computes mean/variance/stddev from the state alone and
    matches a direct recompute over the table; kind validation enforced."""
    import math

    import pytest

    eng = _engine(spark, tmp_path)
    eng.register_agg_view("mom", "orders", ["o_orderstatus"], "price", kind="moments")
    eng.register_agg_view("sc", "orders", ["o_orderstatus"], "price")
    orders = _orders(spark, tables)
    eng.poll_once({"orders": orders}, mode="diff", keys={"orders": ["o_orderkey"]})

    got = {
        r["o_orderstatus"]: (r["mean"], r["variance"], r["stddev"], r["agg_count"])
        for r in eng.view_moments("mom").collect()
    }
    want = {
        r["o_orderstatus"]: (r["m"], r["v"], r["c"])
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.avg(F.col("price").cast("double")).alias("m"),
            F.var_pop(F.col("price").cast("double")).alias("v"),
            F.count("price").alias("c"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for key, (m, v, sd, c) in got.items():
        wm, wv, wc = want[key]
        assert c == wc
        assert math.isclose(m, wm, rel_tol=1e-9)
        # Σv²/n − mean² vs Spark's var_pop: same quantity, different
        # accumulation — binary64 round-off only
        assert math.isclose(v, wv, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(sd, math.sqrt(v), rel_tol=1e-12)
    with pytest.raises(ValueError, match="not moments"):
        eng.view_moments("sc")


def test_view_topk_ranks_maintained_state(spark, tables, tmp_path):
    """view_topk returns the k heaviest state rows per partition key from a
    maintained (status, priority)-grained sum_count view — ranking runs on
    the state table only."""
    import pytest

    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "by_prio", "orders", ["o_orderstatus", "o_orderpriority"], "price"
    )
    orders = tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    eng.poll_once({"orders": orders}, mode="diff", keys={"orders": ["o_orderkey"]})

    top2 = eng.view_topk("by_prio", 2, ["o_orderstatus"])
    got = {
        (r["o_orderstatus"], r["rank"]): r["o_orderpriority"]
        for r in top2.collect()
    }
    # recompute: per status, priorities by descending sum (ties by name)
    want = {}
    for r in (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.sum("price").alias("s"))
        .collect()
    ):
        want.setdefault(r["o_orderstatus"], []).append((r["s"], r["o_orderpriority"]))
    for status, rows in want.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        for i, (_, prio) in enumerate(rows[:2], start=1):
            assert got[(status, i)] == prio
    assert all(r["rank"] <= 2 for r in top2.collect())

    with pytest.raises(ValueError, match="not group keys"):
        eng.view_topk("by_prio", 2, ["nope"])
    with pytest.raises(ValueError, match="k must be positive"):
        eng.view_topk("by_prio", 0, ["o_orderstatus"])
    eng.register_agg_view(
        "h", "orders", ["o_orderstatus"], "price", kind="histogram", lo=0, hi=1e6
    )
    with pytest.raises(ValueError, match="top-k ranks"):
        eng.view_topk("h", 2, ["o_orderstatus"])


# -- maintained TERM_DF views (retrieval-index statistics in the loop) --------


def _dfreq_dict(df):
    return {r["term"]: (r["df_count"], r["n_docs"]) for r in df.collect()}


def test_term_df_view_fold_is_total_and_exact(spark, tables, tmp_path):
    """Document frequencies are abelian: a tick with doc DELETEs and
    text-changing UPDATEs folds via apply_text_delta (pinned by a spy —
    never a rebuild) and the maintained state equals dfreq_state over the
    final corpus exactly."""
    from cdc_lite_spark.operators.incremental import dfreq_state

    eng = _engine(spark, tmp_path)
    eng.register_agg_view("vocab", "docs", [], "text", kind="term_df")
    docs = tables["documents"].select("doc_id", "text")
    keys = {"docs": ["doc_id"]}
    eng.poll_once({"docs": docs}, mode="diff", keys=keys)
    assert _dfreq_dict(eng.view("vocab")) == _dfreq_dict(dfreq_state(docs))

    import cdc_lite_spark.operators.incremental as inc

    calls, orig = [], inc.apply_text_delta

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    k = F.col("doc_id")
    mutated = docs.filter(k % 5 != 0).withColumn(
        "text",
        F.when(
            k % 3 == 0, F.concat(F.col("text"), F.lit(" zzdriftterm"))
        ).otherwise(F.col("text")),
    )
    inc.apply_text_delta = spy
    try:
        eng.poll_once({"docs": mutated}, mode="diff", keys=keys)
    finally:
        inc.apply_text_delta = orig
    assert calls, "a retracting tick must still FOLD term_df, never rebuild"
    got = _dfreq_dict(eng.view("vocab"))
    assert got == _dfreq_dict(dfreq_state(mutated))
    assert "zzdriftterm" in got  # the updated texts actually moved terms


def test_term_df_registration_requires_empty_group_keys(spark, tmp_path):
    import pytest

    eng = _engine(spark, tmp_path)
    with pytest.raises(ValueError, match="group_keys"):
        eng.register_agg_view("v", "docs", ["lang"], "text", kind="term_df")
    eng.register_agg_view("v", "docs", [], "text", kind="term_df")


def test_view_status_reports_lag_and_health(spark, tables, tmp_path, capsys):
    """view_status: healthy views report state_version == table_version,
    a view whose fold fails every tick reports lagging=True, and join/
    join-agg rows carry their basis — FS listings only, no job run."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("ok_view", "orders", ["o_orderstatus"], "price")
    # a view over a column that does not exist: folds fail, view lags
    eng.register_agg_view("bad_view", "orders", ["o_orderstatus"], "nope")
    orders = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)
    capsys.readouterr()  # swallow the bad view's logged per-tick error

    st = {r["name"]: r for r in eng.view_status()}
    assert st["ok_view"]["lagging"] is False
    assert st["ok_view"]["state_version"] == st["ok_view"]["table_version"] == 1
    assert st["bad_view"]["lagging"] is True
    assert st["bad_view"]["state_version"] is None
    assert st["ok_view"]["tables"] == ["orders"]


def test_view_status_join_rows_carry_basis(spark, tmp_path):
    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    eng.register_join_agg_view("agg", "om", ["c_seg"], "o_price")
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)

    st = {r["name"]: r for r in eng.view_status()}
    j = st["om"]
    assert j["kind"] == "join" and j["lagging"] is False
    assert j["basis"] == {"fact_v": 1, "dim_v": 1} and j["state_version"] == 1
    a = st["agg"]
    assert a["kind"] == "join_agg" and a["lagging"] is False
    assert a["state_version"] == 1 and set(a["tables"]) == {"orders", "cust"}


# -- partition-granular maintained views (poll_partitions tier) ---------------


def _p_orders(spark, tables):
    return tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )


def _p_recompute(df):
    return {
        (r["o_orderpriority"],): (r["s"], r["c"], r["n"])
        for r in df.groupBy("o_orderpriority")
        .agg(
            F.sum("price").alias("s"),
            F.count("price").alias("c"),
            F.count("*").alias("n"),
        )
        .collect()
    }


def _p_merged(eng, name):
    return {
        (r["o_orderpriority"],): (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in eng.view_merged(name).collect()
    }


def test_partition_view_folds_only_drifted_partitions(spark, tables, tmp_path):
    """A tick re-aggregates ONLY the drifted partitions' rows (pinned by a
    spy counting what the fresh build scans), replaces their state rows,
    and the merged per-group answer equals a from-scratch recompute —
    dropped partitions disappear from the state wholesale."""
    eng = _engine(spark, tmp_path)
    eng.register_partition_agg_view(
        "pv", "orders", "o_orderstatus", ["o_orderpriority"], "price"
    )
    orders = _p_orders(spark, tables)
    eng.poll_partitions("orders", orders, "o_orderstatus")
    assert _p_merged(eng, "pv") == _p_recompute(orders)

    # tick 2: mutate rows of ONE partition (status F) only
    mutated = orders.withColumn(
        "price",
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 3 == 0),
            F.col("price") * 2,
        ).otherwise(F.col("price")),
    )
    fresh_counts, orig = [], eng._build_part_state

    def spy(s, rows):
        fresh_counts.append(rows.count())
        return orig(s, rows)

    eng._build_part_state = spy
    try:
        report = eng.poll_partitions("orders", mutated, "o_orderstatus")
    finally:
        eng._build_part_state = orig
    assert report["drifted"] == ["F"]
    f_rows = mutated.filter(F.col("o_orderstatus") == "F").count()
    assert fresh_counts == [f_rows], "fold must scan only the drifted partition"
    assert _p_merged(eng, "pv") == _p_recompute(mutated)

    # tick 3: a whole partition vanishes — its state rows drop out
    shrunk = mutated.filter(F.col("o_orderstatus") != "O")
    report = eng.poll_partitions("orders", shrunk, "o_orderstatus")
    assert report["dropped"] == ["O"]
    assert _p_merged(eng, "pv") == _p_recompute(shrunk)
    assert eng.view("pv").filter(F.col("__part") == "O").count() == 0

    # replay-shaped quiet tick: nothing changes, fold is a pointer compare
    report = eng.poll_partitions("orders", shrunk, "o_orderstatus")
    assert report["skipped"] is True
    assert _p_merged(eng, "pv") == _p_recompute(shrunk)


def test_partition_view_mergeable_kinds_and_validation(spark, tables, tmp_path):
    """min_max and distinct_count are TOTAL under partition replacement
    (no keyed-diff rebuild degradation): deleting a partition's extremum
    rows still folds, and the merged answers match recomputes.  Histogram
    states merge to the (group, bucket) grain quantiles read directly."""
    import pytest

    eng = _engine(spark, tmp_path)
    eng.register_partition_agg_view(
        "mm", "orders", "o_orderstatus", ["o_orderpriority"], "price", kind="min_max"
    )
    eng.register_partition_agg_view(
        "dc", "orders", "o_orderstatus", [], "o_custkey", kind="distinct_count"
    )
    eng.register_partition_agg_view(
        "h", "orders", "o_orderstatus", [], "price",
        kind="histogram", lo=0.0, hi=600000.0, bins=8,
    )
    orders = _p_orders(spark, tables).join(
        tables["orders"].select("o_orderkey", "o_custkey"), "o_orderkey"
    )
    eng.poll_partitions("orders", orders, "o_orderstatus")

    # delete each (status, priority) group's maximum-price rows: a keyed
    # min_max view would need a rebuild; partition replacement just folds
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus", "o_orderpriority")
    shrunk = (
        orders.withColumn("__mx", F.max("price").over(w))
        .filter(F.col("price") != F.col("__mx"))
        .drop("__mx")
    )
    eng.poll_partitions("orders", shrunk, "o_orderstatus")

    got_mm = {
        (r["o_orderpriority"],): (r["agg_min"], r["agg_max"], r["agg_rows"])
        for r in eng.view_merged("mm").collect()
    }
    want_mm = {
        (r["o_orderpriority"],): (r["mn"], r["mx"], r["n"])
        for r in shrunk.groupBy("o_orderpriority")
        .agg(
            F.min("price").alias("mn"),
            F.max("price").alias("mx"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got_mm == want_mm

    est = eng.view_merged("dc").collect()[0]
    exact = shrunk.select("o_custkey").distinct().count()
    assert abs(est["distinct_estimate"] - exact) <= 0.1 * exact
    assert est["n_rows"] == shrunk.count()

    from cdc_lite_spark.operators.histogram import quantiles_from_histogram

    q = quantiles_from_histogram(
        eng.view_merged("h"), [], [0.5], 0.0, 600000.0, 8
    ).collect()[0]["quantile_est"]
    assert 0.0 < q < 600000.0
    # view_quantiles routes partition histogram views through the merge
    assert eng.view_quantiles("h", [0.5]).collect()[0]["quantile_est"] == q

    with pytest.raises(ValueError, match="unknown partition view kind"):
        eng.register_partition_agg_view("x", "t", "p", [], "v", kind="term_df")
    with pytest.raises(ValueError, match="bucket edges"):
        eng.register_partition_agg_view("x", "t", "p", [], "v", kind="histogram")
    with pytest.raises(ValueError, match="already registered"):
        eng.register_agg_view("mm", "orders", ["k"], "v")
    # re-registering the SAME partition view stays possible (the typo-
    # correction path every view kind supports; fold-time spec pinning is
    # what refuses a conflicting respec)
    eng.register_partition_agg_view(
        "mm", "orders", "o_orderstatus", ["o_orderpriority"], "price", kind="min_max"
    )


def test_partition_view_part_col_mismatch_is_isolated(spark, tables, tmp_path, capsys):
    """Polling on a different partition column than the view was
    registered with logs and lags (per-view isolation) — the capture
    itself still commits, and view_status reports the lag."""
    eng = _engine(spark, tmp_path)
    eng.register_partition_agg_view(
        "pv", "orders", "o_orderstatus", [], "price"
    )
    orders = _p_orders(spark, tables)
    report = eng.poll_partitions("orders", orders, "o_orderpriority")
    assert report["drifted"]  # capture committed despite the view error
    assert "error maintaining view pv" in capsys.readouterr().out
    st = {r["name"]: r for r in eng.view_status()}
    assert st["pv"]["lagging"] is True and st["pv"]["kind"] == "partition_sum_count"


def test_partition_view_null_partition_survives_other_drift(spark, tmp_path):
    """r8 review: the kept-state branch negates an isin(), which is NULL
    (not false) for the NULL partition's state rows — they must survive a
    tick where only OTHER partitions drift."""
    rows = [(1, None, 10.0), (2, None, 20.0), (3, "a", 30.0), (4, "b", 40.0)]
    schema = "id long, part string, v double"
    eng = _engine(spark, tmp_path)
    eng.register_partition_agg_view("pv", "t", "part", [], "v")
    base = spark.createDataFrame(rows, schema)
    eng.poll_partitions("t", base, "part")
    assert {
        (r["agg_sum"], r["agg_rows"]) for r in eng.view_merged("pv").collect()
    } == {(100.0, 4)}

    # drift ONLY partition 'a' — the NULL partition's state must persist
    drifted = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 35.0), (4, "b", 40.0)],
        schema,
    )
    report = eng.poll_partitions("t", drifted, "part")
    assert report["drifted"] == ["a"]
    assert {
        (r["agg_sum"], r["agg_rows"]) for r in eng.view_merged("pv").collect()
    } == {(105.0, 4)}
    # and the NULL partition itself still folds when IT drifts
    null_drift = spark.createDataFrame(
        [(1, None, 15.0), (3, "a", 35.0), (4, "b", 40.0)], schema
    )
    eng.poll_partitions("t", null_drift, "part")
    assert {
        (r["agg_sum"], r["agg_rows"]) for r in eng.view_merged("pv").collect()
    } == {(90.0, 3)}


def test_global_agg_view_folds_across_ticks(spark, tables, tmp_path):
    """r8 review: group_keys=[] (one global group) used to crash the fold
    on reduce-of-empty in nullsafe_merge — a global sum and global moments
    view must fold across a mutating tick and match recomputes."""
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("total", "orders", [], "price")
    eng.register_agg_view("tmom", "orders", [], "price", kind="moments")
    orders = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)

    mutated = orders.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "price",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("price") + 5).otherwise(
            F.col("price")
        ),
    )
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)
    want = mutated.agg(
        F.sum("price").alias("s"), F.count("price").alias("c")
    ).collect()[0]
    got = eng.view("total").collect()[0]
    assert (got["agg_sum"], got["agg_count"]) == (want["s"], want["c"])
    gm = eng.view("tmom").collect()[0]
    want2 = mutated.agg(F.sum(F.col("price") * F.col("price")).alias("s2")).collect()[0]
    assert (gm["agg_sum"], gm["agg_sum2"]) == (want["s"], want2["s2"])


def test_term_df_empty_state_rebuilds_doc_count(spark, tmp_path):
    """r8 review: a state with zero term rows cannot carry n_docs — the
    engine must REBUILD (not fold) on the next tick, so the corpus doc
    count includes the termless documents instead of restarting from the
    tick's net inserts."""
    schema = "doc_id long, text string"
    eng = _engine(spark, tmp_path)
    eng.register_agg_view("vocab", "docs", [], "text", kind="term_df")
    keys = {"docs": ["doc_id"]}
    termless = spark.createDataFrame([(i, "") for i in range(100)], schema)
    eng.poll_once({"docs": termless}, mode="diff", keys=keys)
    assert eng.view("vocab").count() == 0  # no terms, hence no n_docs carrier

    grown = termless.unionByName(
        spark.createDataFrame([(100, "hello world")], schema)
    )
    eng.poll_once({"docs": grown}, mode="diff", keys=keys)
    got = {r["term"]: (r["df_count"], r["n_docs"]) for r in eng.view("vocab").collect()}
    assert got == {"hello": (1, 101), "world": (1, 101)}


def test_up_to_date_view_repins_lost_spec_on_quiet_tick(spark, tables, tmp_path):
    """r8 review: a crash between the state write and the spec pin left an
    up-to-date view unpinned until the table next changed — the quiet-tick
    retry path must re-pin without waiting for new data."""
    import shutil

    eng = _engine(spark, tmp_path)
    eng.register_agg_view("rev", "orders", ["o_orderstatus"], "price")
    orders = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)
    spec_dir = f"{eng._view_dir('rev')}/_spec"
    assert eng._read_view_spec("rev") is not None
    shutil.rmtree(spec_dir)  # simulate the crash window after the write
    assert eng._read_view_spec("rev") is None

    eng.poll_once({"orders": orders}, mode="diff", keys=keys)  # quiet tick
    assert eng._read_view_spec("rev") is not None


def test_diff_mode_missing_key_is_a_readable_isolated_error(
    spark, tables, tmp_path, capsys
):
    """r8 review: a CHANGED diff-mode table without a keys entry used to
    die on a bare KeyError ('error capturing table orders: ..orders..');
    it must log the actual problem and stay per-table isolated."""
    eng = _engine(spark, tmp_path)
    captured = eng.poll_once(
        {"orders": _orders(spark, tables), "region": tables["region"]},
        mode="diff",
        keys={"region": ["r_regionkey"]},
    )
    out = capsys.readouterr().out
    assert "diff mode needs a primary key for table 'orders'" in out
    assert captured == ["region"]  # the keyed table still captured


def test_join_agg_moments_view_folds_and_reads(spark, tmp_path):
    """agg_kind="moments" over a join view: maintained Σv/Σv² fold from
    view-level I/D records (pinned by a spy — never a re-aggregation on
    the fold tick) equals a from-scratch join recompute, and view_moments
    serves it."""
    import math

    import duckdb

    import cdc_lite_spark.operators.incremental as inc

    db = _join_db(tmp_path)
    eng = _engine(spark, tmp_path)
    _register_join(eng)
    eng.register_join_agg_view(
        "seg_mom", "om", ["c_seg"], "o_price", agg_kind="moments"
    )
    srcs = _join_sources(spark, db)
    eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)

    def _recompute(db):
        con = duckdb.connect(db, read_only=True)
        rows = con.execute(
            "SELECT c_seg, sum(o_price), sum(o_price * o_price), count(*) "
            "FROM orders JOIN cust ON o_ck = c_ck GROUP BY c_seg"
        ).fetchall()
        con.close()
        return {r[0]: (r[1], r[2], r[3]) for r in rows}

    def _view(eng):
        return {
            r["c_seg"]: (r["agg_sum"], r["agg_sum2"], r["agg_rows"])
            for r in eng.view("seg_mom").collect()
        }

    assert _view(eng) == _recompute(db)

    calls, orig = [], inc.apply_moments_delta

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    con = duckdb.connect(db)
    con.execute("INSERT INTO orders VALUES (9,2,90.0)")
    con.execute("UPDATE orders SET o_price = 99.0 WHERE o_id = 1")
    con.execute("DELETE FROM orders WHERE o_id = 4")
    con.execute("UPDATE cust SET c_seg = 'Z' WHERE c_ck = 2")  # group move
    con.close()
    inc.apply_moments_delta = spy
    try:
        eng.poll_once(srcs, mode="diff", keys=_JOIN_KEYS)
    finally:
        inc.apply_moments_delta = orig
    assert calls, "the fold tick must apply moments deltas, not re-aggregate"
    assert _view(eng) == _recompute(db)

    # derived statistics come from state alone
    got = {r["c_seg"]: r for r in eng.view_moments("seg_mom").collect()}
    want = _recompute(db)
    for seg, (s, s2, n) in want.items():
        assert math.isclose(got[seg]["mean"], s / n, rel_tol=1e-9)
        assert math.isclose(
            got[seg]["variance"], s2 / n - (s / n) ** 2, rel_tol=1e-9, abs_tol=1e-9
        )

    import pytest

    with pytest.raises(ValueError, match="unknown agg_kind"):
        eng.register_join_agg_view("x", "om", ["c_seg"], "o_price", agg_kind="nope")


def test_partition_sample_view_merges_to_global_bottom_k(spark, tables, tmp_path):
    """kind="sample" as a partition-view kind (r10): per-(partition, group)
    bottom-k states REPLACE under drift (total — no keyed-diff rebuild),
    and the merged read re-ranks them into the EXACT global bottom-k
    (membership is a pure function of the key hash, so the merge equals a
    from-scratch sample_state of the whole table).  view_sample serves
    partition views through the merged path."""
    from cdc_lite_spark.operators.incremental import sample_state

    K = 5
    eng = _engine(spark, tmp_path)
    eng.register_partition_agg_view(
        "ps", "orders", "o_orderstatus", ["o_orderpriority"], "price",
        kind="sample", k=K, pk_cols=["o_orderkey"],
    )
    orders = _p_orders(spark, tables)
    eng.poll_partitions("orders", orders, "o_orderstatus")

    def _want(df):
        return {
            tuple(r)
            for r in sample_state(
                df, ["o_orderpriority"], "price", ["o_orderkey"], K
            ).collect()
        }

    got = {
        tuple(r)
        for r in eng.view_merged("ps")
        .select("o_orderpriority", "__pk", "__h", "price")
        .collect()
    }
    assert got == _want(orders)
    # the reader projection
    vs = {tuple(r) for r in eng.view_sample("ps").collect()}
    assert vs == {(p, pk, v) for (p, pk, _h, v) in got}

    # drift ONE partition: its per-partition states replace; merged stays
    # the exact global bottom-k of the mutated table (deletes included —
    # no degradation under replacement semantics)
    mutated = orders.filter(
        ~((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 3 == 0))
    )
    report = eng.poll_partitions("orders", mutated, "o_orderstatus")
    assert report["drifted"] == ["F"]
    got = {
        tuple(r)
        for r in eng.view_merged("ps")
        .select("o_orderpriority", "__pk", "__h", "price")
        .collect()
    }
    assert got == _want(mutated)


def test_partition_sample_view_validation(spark, tables, tmp_path):
    import pytest

    eng = _engine(spark, tmp_path)
    with pytest.raises(ValueError, match="need pk_cols"):
        eng.register_partition_agg_view(
            "x", "orders", "o_orderstatus", ["o_orderpriority"], "price",
            kind="sample",
        )
    with pytest.raises(ValueError, match="must not be one of the group keys"):
        eng.register_partition_agg_view(
            "x", "orders", "o_orderstatus", ["price"], "price",
            kind="sample", pk_cols=["o_orderkey"],
        )
    with pytest.raises(ValueError, match="k > 0"):
        eng.register_partition_agg_view(
            "x", "orders", "o_orderstatus", [], "price",
            kind="sample", k=0, pk_cols=["o_orderkey"],
        )
