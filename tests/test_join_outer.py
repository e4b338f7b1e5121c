"""Left-outer maintained join views (r9 verdict ask #6): inner-join views
silently drop facts with dangling FKs; ``how="left_outer"`` carries them
with null dim payloads through the SAME affected-key fold algebra — a
dangling fact flips to a joined row when its dim key arrives and flips
back on dim delete.  Pinned at the operator level, in the engine loop,
and over the wire-driven changelog consumer, each against a from-scratch
left-join oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_lite_spark.engine import CdcEngine
from cdc_lite_spark.operators.diff import snapshot_diff
from cdc_lite_spark.operators.incremental import maintain_join


def _fixture(spark):
    fact_prev = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 6.0), (3, 20, 7.0), (4, 30, 8.0), (9, 40, 1.0)],
        "fid long, did long, v double",
    )
    # fact tick: 1 updated, 2 deleted, 5 inserted, 6 inserted DANGLING
    fact_cur = spark.createDataFrame(
        [(1, 10, 5.5), (3, 20, 7.0), (4, 30, 8.0), (5, 10, 2.0), (9, 40, 1.0),
         (6, 99, 3.0)],
        "fid long, did long, v double",
    )
    # dim tick: 10 attribute-updated, 30 DELETED (fact 4 null-extends),
    # 40 INSERTED (dangling fact 9 becomes joined)
    dim_prev = spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "z")], "did long, attr string"
    )
    dim_cur = spark.createDataFrame(
        [(10, "X"), (20, "y"), (40, "w")], "did long, attr string"
    )
    return fact_prev, fact_cur, dim_prev, dim_cur


def _left(fact, dim):
    return fact.join(dim, "did", "left_outer").select("fid", "did", "v", "attr")


def test_maintain_join_left_outer_equals_recompute(spark):
    """Every change class (fact I/U/D, dim I/U/D, dangling insert, dim
    delete null-extending its facts, dim insert joining a dangler) — the
    maintained left-outer view equals the from-scratch left join."""
    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    m_old = _left(fact_prev, dim_prev)
    out = maintain_join(
        m_old,
        fact_cur,
        dim_cur,
        snapshot_diff(fact_prev, fact_cur, ["fid"]),
        snapshot_diff(dim_prev, dim_cur, ["did"]),
        fact_key="fid",
        fact_dim_col="did",
        dim_key="did",
        how="left_outer",
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in _left(fact_cur, dim_cur).collect()}
    assert got == want
    by_fid = {r[0]: r for r in got}
    assert by_fid[4][3] is None  # dim 30 deleted: fact 4 null-extended
    assert by_fid[9][3] == "w"  # dangler joined when dim 40 arrived
    assert by_fid[6][3] is None  # fresh dangling insert carried


def test_maintain_join_rejects_bad_how(spark):
    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    with pytest.raises(ValueError, match="inner or left_outer"):
        maintain_join(
            _left(fact_prev, dim_prev),
            fact_cur,
            dim_cur,
            snapshot_diff(fact_prev, fact_cur, ["fid"]),
            snapshot_diff(dim_prev, dim_cur, ["did"]),
            fact_key="fid",
            fact_dim_col="did",
            dim_key="did",
            how="full_outer",
        )


def test_maintain_join_left_outer_broadcasts_delta_sides(spark):
    """The left-outer refresh keeps the inner path's scale contract: every
    join broadcasts a delta-bounded side and nothing sort-merges.  A
    direct outer refresh could NOT do this (BroadcastHashJoin LeftOuter
    builds its right side only, so the dim would shuffle) — the refresh
    is expressed as inner ∪ null-extended-unmatched instead, both legs
    delta-broadcast."""
    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    out = maintain_join(
        _left(fact_prev, dim_prev).localCheckpoint(),
        fact_cur,
        dim_cur,
        snapshot_diff(fact_prev, fact_cur, ["fid"]).localCheckpoint(),
        snapshot_diff(dim_prev, dim_cur, ["did"]).localCheckpoint(),
        fact_key="fid",
        fact_dim_col="did",
        dim_key="did",
        how="left_outer",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_engine_left_outer_join_view_across_ticks(spark, tmp_path):
    """Two real engine ticks: the left-outer view equals the from-scratch
    left join after each, carries danglers throughout, and the fold tick
    takes the incremental path (spy-pinned, no silent rebuild)."""
    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    # the engine's join views require distinct column names across sides
    dim_prev = dim_prev.select(F.col("did").alias("did2"), "attr")
    dim_cur = dim_cur.select(F.col("did").alias("did2"), "attr")
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "state"),
        emit_schema_changes=False,
    )
    eng.register_join_view(
        "lo",
        fact_table="f",
        dim_table="d",
        fact_key="fid",
        fact_dim_col="did",
        dim_key="did2",
        how="left_outer",
    )

    def _want(fact, dim):
        return {
            tuple(r)
            for r in fact.join(
                dim, fact["did"] == dim["did2"], "left_outer"
            ).collect()
        }

    keys = {"f": ["fid"], "d": ["did2"]}
    eng.poll_once({"f": fact_prev, "d": dim_prev}, mode="diff", keys=keys)
    got1 = {tuple(r) for r in eng.view("lo").collect()}
    assert got1 == _want(fact_prev, dim_prev)
    assert any(r[0] == 9 and r[4] is None for r in got1)  # dangler carried

    import cdc_lite_spark.operators.incremental as inc

    calls = []
    orig = inc.maintain_join_with_changes

    def spy(*a, **k):
        calls.append(k.get("how"))
        return orig(*a, **k)

    inc.maintain_join_with_changes = spy
    try:
        eng.poll_once({"f": fact_cur, "d": dim_cur}, mode="diff", keys=keys)
    finally:
        inc.maintain_join_with_changes = orig
    assert calls == ["left_outer"], "fold tick must take the incremental path"
    got2 = {tuple(r) for r in eng.view("lo").collect()}
    assert got2 == _want(fact_cur, dim_cur)


def test_engine_rejects_bad_how_and_pins_it(spark, tmp_path):
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "state"),
        emit_schema_changes=False,
    )
    with pytest.raises(ValueError, match="inner or left_outer"):
        eng.register_join_view(
            "bad", fact_table="f", dim_table="d",
            fact_key="fid", fact_dim_col="did", dim_key="did", how="right",
        )
    # how joins the pinned spec only when non-default: a left_outer spec
    # must round-trip through _stable_spec, an inner one must omit it
    eng.register_join_view(
        "lo", fact_table="f", dim_table="d",
        fact_key="fid", fact_dim_col="did", dim_key="did", how="left_outer",
    )
    eng.register_join_view(
        "io", fact_table="f", dim_table="d",
        fact_key="fid", fact_dim_col="did", dim_key="did",
    )
    assert eng._stable_spec(eng._join_views["lo"])["how"] == "left_outer"
    assert "how" not in eng._stable_spec(eng._join_views["io"])


def test_wire_left_outer_join_view_converges(spark, tmp_path):
    """The changelog consumer maintains the left-outer join from the wire
    alone: danglers carried with null dim payloads, flipping as their dim
    arrives/leaves — final state equals the left join of final tables."""
    from cdc_lite_spark.sources.changelog import stream_changes
    from cdc_lite_spark.streaming.view_stream import (
        init_changelog_join_view,
        read_changelog_join_view,
        start_changelog_join_view,
    )

    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    # join views require distinct column names across sides — monitor the
    # dim under "did2" so the wire records carry that name
    dim_prev = dim_prev.select(F.col("did").alias("did2"), "attr")
    dim_cur = dim_cur.select(F.col("did").alias("did2"), "attr")
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"),
        emit_schema_changes=False,
    )
    keys = {"f": ["fid"], "d": ["did2"]}
    eng.poll_once({"f": fact_prev, "d": dim_prev}, mode="diff", keys=keys)
    eng.poll_once({"f": fact_cur, "d": dim_cur}, mode="diff", keys=keys)

    fddl, dddl = "fid BIGINT, did BIGINT, v DOUBLE", "did2 BIGINT, attr STRING"
    state_dir = str(tmp_path / "vstate")
    init_changelog_join_view(
        spark, state_dir, "f", "d", fddl, dddl, ["fid"], ["did"], ["did2"],
        how="left_outer",
    )
    q = start_changelog_join_view(
        stream_changes(spark, str(tmp_path / "log"), max_files_per_trigger=2),
        "f", "d", fddl, dddl, ["fid"], ["did"], ["did2"],
        state_dir, str(tmp_path / "ckpt"),
        available_now=True, how="left_outer",
    )
    q.awaitTermination()
    got = {tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()}
    dim_final = dim_cur
    want = {
        tuple(r)
        for r in fact_cur.join(
            dim_final, fact_cur["did"] == dim_final["did2"], "left_outer"
        ).collect()
    }
    assert got == want


def test_engine_agg_over_left_outer_join_view(spark, tmp_path):
    """register_join_agg_view over a left-outer view: null-extended rows
    flow through the I/D fold — a sum over a DIM column skips danglers'
    nulls while agg_rows counts every fact; after the dim arrives the
    fold moves the fact's contribution in (retract null row / insert
    joined row), matching a from-scratch recompute."""
    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    dim_prev = dim_prev.select(
        F.col("did").alias("did2"), F.col("did").cast("double").alias("w")
    )
    dim_cur = dim_cur.select(
        F.col("did").alias("did2"), F.col("did").cast("double").alias("w")
    )
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "state"),
        emit_schema_changes=False,
    )
    eng.register_join_view(
        "lo", fact_table="f", dim_table="d",
        fact_key="fid", fact_dim_col="did", dim_key="did2", how="left_outer",
    )
    eng.register_join_agg_view("agg", "lo", ["did"], "w")
    keys = {"f": ["fid"], "d": ["did2"]}

    def _want(fact, dim):
        j = fact.join(dim, fact["did"] == dim["did2"], "left_outer")
        return {
            r["did"]: (r["s"], r["c"], r["n"])
            for r in j.groupBy("did")
            .agg(
                F.sum("w").alias("s"),
                F.count("w").alias("c"),
                F.count("*").alias("n"),
            )
            .collect()
        }

    for fact, dim in ((fact_prev, dim_prev), (fact_cur, dim_cur)):
        eng.poll_once({"f": fact, "d": dim}, mode="diff", keys=keys)
        got = {
            r["did"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
            for r in eng.view("agg").collect()
        }
        assert got == _want(fact, dim)
    # the dangling groups really are present with null-skipping counts
    assert got[99] == (None, 0, 1)  # fact 6: dim 99 never arrived


def test_left_outer_view_chains_as_snowflake_side(spark, tmp_path):
    """A left-outer view composes as the FACT of a downstream join view
    (snowflake chain): the chain folds the upstream's null-extended rows
    like any other state rows, and the final chain equals the
    from-scratch (f ⟕ d) ⋈ d2 across two mutating ticks."""
    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    dim_prev = dim_prev.select(F.col("did").alias("did2"), "attr")
    dim_cur = dim_cur.select(F.col("did").alias("did2"), "attr")
    # second dim keyed by the fact's own v-independent column: join on fid
    d2_prev = spark.createDataFrame(
        [(1, "p1"), (3, "p3"), (4, "p4"), (9, "p9")], "fid2 long, tag string"
    )
    d2_cur = spark.createDataFrame(
        [(1, "P1"), (3, "p3"), (5, "p5"), (9, "p9"), (6, "p6")],
        "fid2 long, tag string",
    )
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "state"),
        emit_schema_changes=False,
    )
    eng.register_join_view(
        "lo", fact_table="f", dim_table="d",
        fact_key="fid", fact_dim_col="did", dim_key="did2", how="left_outer",
    )
    eng.register_join_view(
        "chain", fact_table="lo", dim_table="d2",
        fact_key="fid", fact_dim_col="fid", dim_key="fid2",
    )
    keys = {"f": ["fid"], "d": ["did2"], "d2": ["fid2"]}

    def _want(fact, dim, d2):
        lo = fact.join(dim, fact["did"] == dim["did2"], "left_outer")
        return {
            tuple(r)
            for r in lo.join(d2, lo["fid"] == d2["fid2"], "inner").collect()
        }

    eng.poll_once(
        {"f": fact_prev, "d": dim_prev, "d2": d2_prev}, mode="diff", keys=keys
    )
    got = {tuple(r) for r in eng.view("chain").collect()}
    assert got == _want(fact_prev, dim_prev, d2_prev)
    eng.poll_once(
        {"f": fact_cur, "d": dim_cur, "d2": d2_cur}, mode="diff", keys=keys
    )
    got = {tuple(r) for r in eng.view("chain").collect()}
    assert got == _want(fact_cur, dim_cur, d2_cur)
    # the chain carries the upstream's null-extended rows (fact 6's dim 99
    # never arrived, but its d2 tag did)
    assert any(r[0] == 6 and r[4] is None and r[6] == "p6" for r in got)


def test_wire_left_outer_join_agg_composes(spark, tmp_path):
    """how="left_outer" + agg compose in the wire consumer: the agg folds
    I/D records that include null-extended rows — a sum over the dim
    column counts only joined facts while agg_rows counts every fact."""
    from cdc_lite_spark.sources.changelog import stream_changes
    from cdc_lite_spark.streaming.view_stream import (
        init_changelog_join_view,
        read_changelog_join_agg,
        start_changelog_join_view,
    )

    fact_prev, fact_cur, dim_prev, dim_cur = _fixture(spark)
    dim_prev = dim_prev.select(
        F.col("did").alias("did2"), F.col("did").cast("double").alias("w")
    )
    dim_cur = dim_cur.select(
        F.col("did").alias("did2"), F.col("did").cast("double").alias("w")
    )
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"),
        emit_schema_changes=False,
    )
    keys = {"f": ["fid"], "d": ["did2"]}
    eng.poll_once({"f": fact_prev, "d": dim_prev}, mode="diff", keys=keys)
    eng.poll_once({"f": fact_cur, "d": dim_cur}, mode="diff", keys=keys)

    fddl, dddl = "fid BIGINT, did BIGINT, v DOUBLE", "did2 BIGINT, w DOUBLE"
    agg = {"group_keys": ["did"], "value_col": "w"}
    state_dir = str(tmp_path / "vstate")
    init_changelog_join_view(
        spark, state_dir, "f", "d", fddl, dddl, ["fid"], ["did"], ["did2"],
        how="left_outer", agg=agg,
    )
    q = start_changelog_join_view(
        stream_changes(spark, str(tmp_path / "log"), max_files_per_trigger=2),
        "f", "d", fddl, dddl, ["fid"], ["did"], ["did2"],
        state_dir, str(tmp_path / "ckpt"),
        available_now=True, how="left_outer", agg=agg,
    )
    q.awaitTermination()
    got = {
        r["did"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in read_changelog_join_agg(spark, state_dir).collect()
    }
    j = fact_cur.join(dim_cur, fact_cur["did"] == dim_cur["did2"], "left_outer")
    want = {
        r["did"]: (r["s"], r["c"], r["n"])
        for r in j.groupBy("did")
        .agg(F.sum("w").alias("s"), F.count("w").alias("c"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert got[99] == (None, 0, 1)  # the dangling fact's group
