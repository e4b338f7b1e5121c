"""Incremental aggregate maintenance: applying deltas must equal full
recomputation (operators/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.diff import snapshot_diff
from cdc_lite_spark.operators.incremental import apply_delta, sum_count_state


def test_incremental_equals_recompute(spark, tables):
    orders = tables["orders"]
    prev = orders.filter(F.col("o_orderkey") % 4 != 0)
    cur = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    keys = ["o_custkey"]

    state = sum_count_state(prev, keys, "o_totalprice")
    changes = snapshot_diff(prev, cur, ["o_orderkey"], include_prev=True)
    maintained = apply_delta(state, changes, keys, "o_totalprice")
    recomputed = sum_count_state(cur, keys, "o_totalprice")

    m = {r["o_custkey"]: (r["agg_count"], round(r["agg_sum"], 4)) for r in maintained.collect()}
    r = {r["o_custkey"]: (r["agg_count"], round(r["agg_sum"], 4)) for r in recomputed.collect()}
    assert set(m) == set(r)
    for k in r:
        assert m[k][0] == r[k][0]          # counts exact
        assert abs(m[k][1] - r[k][1]) < 1e-4  # sums to float tolerance


def test_delta_only_touches_changed_groups(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "id long, g string, v double"
    )
    cur = spark.createDataFrame(
        [(1, "a", 15.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 5.0)],
        "id long, g string, v double",
    )
    state = sum_count_state(base, ["g"], "v")
    changes = snapshot_diff(base, cur, ["id"], include_prev=True)
    # only groups a (update) and c (insert) appear in the delta
    delta_groups = {r["g"] for r in changes.select("g").distinct().collect()}
    assert delta_groups == {"a", "c"}
    out = {r["g"]: (r["agg_sum"], r["agg_count"]) for r in apply_delta(state, changes, ["g"], "v").collect()}
    assert out == {"a": (35.0, 2), "b": (30.0, 1), "c": (5.0, 1)}


def test_update_moving_row_across_groups(spark):
    """An UPDATE that changes the GROUP key retracts from the old group and
    adds to the new one."""
    base = spark.createDataFrame([(1, "a", 10.0), (2, "b", 5.0)], "id long, g string, v double")
    cur = spark.createDataFrame([(1, "b", 10.0), (2, "b", 5.0)], "id long, g string, v double")
    state = sum_count_state(base, ["g"], "v")
    changes = snapshot_diff(base, cur, ["id"], include_prev=True)
    out = {
        r["g"]: (r["agg_sum"], r["agg_count"])
        for r in apply_delta(state, changes, ["g"], "v").collect()
    }
    assert out == {"b": (15.0, 2)}  # group a vanished, its mass moved to b


def test_null_values_maintained_correctly(spark):
    """ADVICE r01: null-valued change records must not drift agg_count
    (COUNT(col) skips nulls) nor kill keys whose values are all null."""
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, "b", None)], "id long, g string, v double"
    )
    # update 2: null->5.0; delete 3 (null value); insert 4 with null value
    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (4, "c", None)], "id long, g string, v double"
    )
    state = sum_count_state(base, ["g"], "v")
    changes = snapshot_diff(base, cur, ["id"], include_prev=True)
    maintained = apply_delta(state, changes, ["g"], "v")
    recomputed = sum_count_state(cur, ["g"], "v")
    m = {r["g"]: (r["agg_sum"], r["agg_count"], r["agg_rows"]) for r in maintained.collect()}
    r = {r["g"]: (r["agg_sum"], r["agg_count"], r["agg_rows"]) for r in recomputed.collect()}
    assert m == r
    assert m["c"] == (None, 0, 1)  # all-null key survives with count 0


def test_dfreq_maintained_equals_recomputed(spark):
    """Apply INSERT/UPDATE/DELETE document changes to the df/N state: the
    maintained statistics must equal dfreq_state over the final corpus —
    term-for-term, including the corpus doc count and zero-df eviction."""
    from cdc_lite_spark.operators.incremental import apply_text_delta, dfreq_state

    docs0 = spark.createDataFrame(
        [
            (1, "spark joins tables"),
            (2, "spark windows"),
            (3, "unique disappearing words"),
        ],
        "doc_id long, text string",
    )
    state = dfreq_state(docs0)

    changes = spark.createDataFrame(
        [
            ("INSERT", 4, "spark streams", None),
            ("UPDATE", 2, "spark aggregates", "spark windows"),
            ("DELETE", 3, None, "unique disappearing words"),
        ],
        "operation string, doc_id long, text string, prev_text string",
    )
    maintained = apply_text_delta(state, changes)

    docs1 = spark.createDataFrame(
        [
            (1, "spark joins tables"),
            (2, "spark aggregates"),
            (4, "spark streams"),
        ],
        "doc_id long, text string",
    )
    expect = dfreq_state(docs1)
    m = {(r["term"]): (r["df_count"], r["n_docs"]) for r in maintained.collect()}
    e = {(r["term"]): (r["df_count"], r["n_docs"]) for r in expect.collect()}
    assert m == e
    assert "windows" not in m and "unique" not in m  # zero-df evicted
    assert m["spark"] == (3, 3)


def test_dfreq_update_without_membership_change_is_noop(spark):
    """An UPDATE whose term set is unchanged must leave every df intact
    (the +1/-1 cancel in one delta aggregation)."""
    from cdc_lite_spark.operators.incremental import apply_text_delta, dfreq_state

    docs = spark.createDataFrame(
        [(1, "spark spark tables")], "doc_id long, text string"
    )
    state = dfreq_state(docs)
    changes = spark.createDataFrame(
        [("UPDATE", 1, "tables spark", "spark spark tables")],
        "operation string, doc_id long, text string, prev_text string",
    )
    out = {r["term"]: r["df_count"] for r in apply_text_delta(state, changes).collect()}
    assert out == {"spark": 1, "tables": 1}


def _mj_fixture(spark):
    from cdc_lite_spark.operators.incremental import maintain_join

    fact_prev = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 6.0), (3, 20, 7.0), (4, 30, 8.0), (9, 40, 1.0)],
        "fid long, did long, v double",
    )
    # fact tick: 1 updated, 2 deleted, 5 inserted, 9 references dim 40
    # which only EXISTS in the current dim snapshot (dangling re-entry)
    fact_cur = spark.createDataFrame(
        [(1, 10, 5.5), (3, 20, 7.0), (4, 30, 8.0), (5, 10, 2.0), (9, 40, 1.0)],
        "fid long, did long, v double",
    )
    # dim tick: 10 attribute-updated, 30 deleted (drops fact 4), 40 inserted
    dim_prev = spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "z")], "did long, attr string"
    )
    dim_cur = spark.createDataFrame(
        [(10, "X"), (20, "y"), (40, "w")], "did long, attr string"
    )
    m_old = fact_prev.join(dim_prev, "did", "inner").select(
        "fid", "did", "v", "attr"
    )
    fact_changes = snapshot_diff(fact_prev, fact_cur, ["fid"])
    dim_changes = snapshot_diff(dim_prev, dim_cur, ["did"])
    return maintain_join, m_old, fact_cur, dim_cur, fact_changes, dim_changes


def test_maintain_join_equals_recompute_all_change_classes(spark):
    """fact I/U/D + dim I/U/D (including a dim DELETE dropping its facts and
    a dim INSERT re-surfacing a previously-dangling fact) — the maintained
    view must equal the from-scratch inner join."""
    maintain_join, m_old, fact_cur, dim_cur, fc, dc = _mj_fixture(spark)
    out = maintain_join(
        m_old, fact_cur, dim_cur, fc, dc,
        fact_key="fid", fact_dim_col="did", dim_key="did",
    )
    expect = fact_cur.join(dim_cur, "did", "inner").select("fid", "did", "v", "attr")
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want
    # the dangling fact 9 re-entered via the dim-40 INSERT
    assert any(r[0] == 9 for r in got)
    # fact 4 left with its deleted dim 30
    assert not any(r[0] == 4 for r in got)


def test_maintain_join_fk_integrity_mode(spark):
    """assume_fk_integrity=True finds dim-affected facts in M_old (no fact
    scan) — equal to the recompute whenever no fact dangles."""
    from cdc_lite_spark.operators.incremental import maintain_join

    fact_prev = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 6.0)], "fid long, did long, v double"
    )
    fact_cur = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 6.5), (3, 10, 7.0)], "fid long, did long, v double"
    )
    dim_prev = spark.createDataFrame([(10, "x"), (20, "y")], "did long, attr string")
    dim_cur = spark.createDataFrame([(10, "X"), (20, "y")], "did long, attr string")
    m_old = fact_prev.join(dim_prev, "did", "inner").select("fid", "did", "v", "attr")
    out = maintain_join(
        m_old,
        fact_cur,
        dim_cur,
        snapshot_diff(fact_prev, fact_cur, ["fid"]),
        snapshot_diff(dim_prev, dim_cur, ["did"]),
        fact_key="fid",
        fact_dim_col="did",
        dim_key="did",
        assume_fk_integrity=True,
    )
    expect = fact_cur.join(dim_cur, "did", "inner").select("fid", "did", "v", "attr")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in expect.collect()}


def test_maintain_join_broadcasts_delta_sides(spark):
    """Scale contract: every join against the delta/affected set is a
    broadcast join — the view and the fact table are never shuffled.
    The inputs (stored view + change records, precomputed in production)
    are checkpointed so the plan under test is the maintenance path only."""
    maintain_join, m_old, fact_cur, dim_cur, fc, dc = _mj_fixture(spark)
    out = maintain_join(
        m_old.localCheckpoint(), fact_cur, dim_cur,
        fc.localCheckpoint(), dc.localCheckpoint(),
        fact_key="fid", fact_dim_col="did", dim_key="did",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere in the maintenance path
    assert "SortMergeJoin" not in plan


def test_maintain_join_hot_key_fallback_no_forced_broadcast(spark):
    """hint_broadcast=False (the hot-dim-key escape hatch) must drop every
    forced broadcast hint — |affected| is fan-out-bounded, and an 8 GB+
    affected set under a forced hint would abort the tick instead of
    degrading to a shuffle join — while producing the identical view."""
    maintain_join, m_old, fact_cur, dim_cur, fc, dc = _mj_fixture(spark)
    out = maintain_join(
        m_old, fact_cur, dim_cur, fc, dc,
        fact_key="fid", fact_dim_col="did", dim_key="did",
        hint_broadcast=False,
    )
    # the delta-bounded dim-key semi-joins keep their (always safe) hint;
    # every fan-out-bounded join — anything keyed on the fact key — must not
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    hinted = [l for l in plan.splitlines() if "strategy=broadcast" in l]
    assert all("LeftSemi, (did" in l for l in hinted), hinted
    expect = fact_cur.join(dim_cur, "did", "inner").select("fid", "did", "v", "attr")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in expect.collect()}


def test_join_view_changes_fold_equals_recompute(spark):
    """Capstone composition: aggregate over the join maintained purely from
    view-level change records — must equal the from-scratch join+group-by,
    including a dim attribute flip that MOVES facts across groups."""
    from cdc_lite_spark.operators.incremental import (
        apply_delta,
        join_view_changes,
        sum_count_state,
    )

    maintain_join, m_old, fact_cur, dim_cur, fc, dc = _mj_fixture(spark)
    changes = join_view_changes(
        m_old, fact_cur, dim_cur, fc, dc,
        fact_key="fid", fact_dim_col="did", dim_key="did",
    )
    state = sum_count_state(m_old, ["attr"], "v")
    out = apply_delta(state, changes, ["attr"], "v")
    expect = sum_count_state(
        fact_cur.join(dim_cur, "did", "inner").select("fid", "did", "v", "attr"),
        ["attr"],
        "v",
    )
    got = {r["attr"]: (r["agg_sum"], r["agg_count"], r["agg_rows"]) for r in out.collect()}
    want = {r["attr"]: (r["agg_sum"], r["agg_count"], r["agg_rows"]) for r in expect.collect()}
    assert got == want
    # the delta is view-level I/D records only, sized by the affected keys
    ops = {r["operation"] for r in changes.select("operation").distinct().collect()}
    assert ops <= {"INSERT", "DELETE"}


def test_maintain_join_composite_keys_broadcast_plan(spark):
    """Composite-key folds keep the scale contract: every join against the
    delta/affected set broadcasts (multi-column keys just widen the
    broadcast rows), the view and fact table never shuffle."""
    from cdc_lite_spark.operators.incremental import maintain_join

    fact_prev = spark.createDataFrame(
        [(1, 1, 10, 5.0), (1, 2, 10, 6.0), (2, 1, 20, 7.0)],
        "oid long, line long, did long, v double",
    )
    fact_cur = spark.createDataFrame(
        [(1, 1, 10, 5.5), (2, 1, 20, 7.0), (2, 2, 10, 2.0)],
        "oid long, line long, did long, v double",
    )
    dim_prev = spark.createDataFrame([(10, "x"), (20, "y")], "did long, attr string")
    dim_cur = spark.createDataFrame([(10, "X"), (20, "y")], "did long, attr string")
    m_old = fact_prev.join(dim_prev, "did", "inner").select(
        "oid", "line", "did", "v", "attr"
    )
    out = maintain_join(
        m_old.localCheckpoint(),
        fact_cur,
        dim_cur,
        snapshot_diff(fact_prev, fact_cur, ["oid", "line"]).localCheckpoint(),
        snapshot_diff(dim_prev, dim_cur, ["did"]).localCheckpoint(),
        fact_key=["oid", "line"],
        fact_dim_col="did",
        dim_key="did",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    expect = fact_cur.join(dim_cur, "did", "inner").select(
        "oid", "line", "did", "v", "attr"
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in expect.collect()}
