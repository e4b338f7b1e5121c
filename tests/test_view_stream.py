"""Changelog-driven view maintenance (streaming/view_stream.py — r8
verdict ask #6): a foreachBatch consumer of the A8 wire stream must
converge to the from-scratch aggregate over the final table state, across
REAL micro-batches, for every supported kind — the stream==batch
equivalence discipline of the other stream twins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_lite_spark.engine import CdcEngine
from cdc_lite_spark.sources.changelog import stream_changes
from cdc_lite_spark.streaming.view_stream import (
    init_changelog_view,
    read_changelog_replica,
    read_changelog_view,
    start_changelog_view,
)

_DDL = "id BIGINT, grp STRING, v DECIMAL(10,2)"


def _df(spark, rows):
    # python floats can't feed DecimalType directly — build DOUBLE and cast
    return spark.createDataFrame(
        rows, "id BIGINT, grp STRING, v DOUBLE"
    ).withColumn("v", F.col("v").cast("decimal(10,2)"))


_T1 = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)]
# tick 2: UPDATE value (1), UPDATE moving groups (2: a→b), DELETE (3), INSERT (5)
_T2 = [(1, "a", 11.0), (2, "b", 20.0), (4, "b", 40.0), (5, "c", 50.0)]
# tick 3: DELETE the last 'a' row, INSERT a null-valued row
_T3 = [(2, "b", 20.0), (4, "b", 41.0), (5, "c", 50.0), (6, "c", None)]


def _write_log(spark, tmp_path, ticks) -> str:
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"),
        emit_schema_changes=False,
    )
    for t in ticks:
        eng.poll_once({"t": _df(spark, t)}, mode="diff", keys={"t": ["id"]})
    return str(tmp_path / "log")


def _drain(spark, log_dir, tmp_path, kind, **kw):
    state_dir = str(tmp_path / f"vstate_{kind}")
    init_changelog_view(spark, state_dir, _DDL, ["grp"], "v", kind=kind, **kw)
    # start_changelog_view takes the table key positionally — init's
    # key_cols kw (sample kind) must not be passed twice
    start_kw = {k2: v for k2, v in kw.items() if k2 != "key_cols"}
    q = start_changelog_view(
        stream_changes(spark, log_dir, max_files_per_trigger=2),
        "t",
        _DDL,
        ["id"],
        ["grp"],
        "v",
        state_dir,
        str(tmp_path / f"ckpt_{kind}"),
        kind=kind,
        available_now=True,
        **start_kw,
    )
    q.awaitTermination()
    return state_dir


def test_changelog_sum_count_converges_across_batches(spark, tmp_path):
    """Empty-init consumer drains a 3-tick log in multiple micro-batches;
    the maintained state and the replica both equal the final table."""
    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])
    state_dir = _drain(spark, log, tmp_path, "sum_count")

    final = _df(spark, _T3)
    got = {
        r["grp"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["grp"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in final.groupBy("grp")
        .agg(
            F.sum("v").alias("agg_sum"),
            F.count("v").alias("agg_count"),
            F.count("*").alias("agg_rows"),
        )
        .collect()
    }
    assert got == want
    assert "a" not in got  # the group fully drained out

    rep = read_changelog_replica(spark, state_dir)
    assert {tuple(r) for r in rep.collect()} == {
        tuple(r) for r in final.collect()
    }


def test_changelog_moments_and_histogram_kinds(spark, tmp_path):
    """The moments and histogram folds converge identically (both TOTAL)."""
    from cdc_lite_spark.operators.histogram import histogram_state
    from cdc_lite_spark.operators.incremental import moments_state

    log = _write_log(spark, tmp_path, [_T1, _T2])
    final = _df(spark, _T2)

    sd = _drain(spark, log, tmp_path, "moments")
    got = {tuple(r) for r in read_changelog_view(spark, sd).collect()}
    want = {tuple(r) for r in moments_state(final, ["grp"], "v").collect()}
    assert got == want

    sd = _drain(spark, log, tmp_path, "histogram", lo=0.0, hi=60.0, bins=6)
    got = {tuple(r) for r in read_changelog_view(spark, sd).collect()}
    want = {
        tuple(r)
        for r in histogram_state(final, ["grp"], "v", 0.0, 60.0, 6).collect()
    }
    assert got == want


def test_changelog_view_history_init_and_validation(spark, tmp_path):
    """A consumer joining mid-stream seeds the replica/agg from history
    rows; bad kinds and missing histogram edges fail at init."""
    log = _write_log(spark, tmp_path, [_T1, _T2])
    state_dir = str(tmp_path / "vstate_hist_init")
    # seed from tick-1 state, then drain the WHOLE log: the first batch's
    # INSERT-everything records fold as value-preserving no-op UPDATEs
    # against the seeded replica, so convergence still holds.  The history
    # frame deliberately carries a DRIFTED-but-castable type (arithmetic
    # widens decimal(10,2) to (11,2)): init must conform it to the
    # declared DDL or the drain's schema-pinned replica read rejects the
    # v0 parquet (r12 _conform — FLBA vs INT64 decimal physical layouts)
    widened = _df(spark, _T1).withColumn("v", (F.col("v") + 1) - 1)
    assert dict(widened.dtypes)["v"] != "decimal(10,2)"
    init_changelog_view(
        spark, state_dir, _DDL, ["grp"], "v", history=widened
    )
    q = start_changelog_view(
        stream_changes(spark, log, max_files_per_trigger=2),
        "t", _DDL, ["id"], ["grp"], "v",
        state_dir, str(tmp_path / "ckpt_hist_init"), available_now=True,
    )
    q.awaitTermination()
    final = _df(spark, _T2)
    got = {
        r["grp"]: (r["agg_sum"], r["agg_rows"])
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["grp"]: (r["agg_sum"], r["agg_rows"])
        for r in final.groupBy("grp")
        .agg(F.sum("v").alias("agg_sum"), F.count("*").alias("agg_rows"))
        .collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="kind must be one of"):
        init_changelog_view(spark, str(tmp_path / "x"), _DDL, ["grp"], "v", kind="nope")
    with pytest.raises(ValueError, match="lo/hi"):
        init_changelog_view(
            spark, str(tmp_path / "y"), _DDL, ["grp"], "v", kind="histogram"
        )


def test_changelog_full_redrain_converges_to_same_state(spark, tmp_path):
    """Replay robustness: draining the SAME log a second time with a fresh
    checkpoint (every record reprocessed against the already-current
    state) converges to the identical state — enrichment derives net
    operations from the replica, so replayed INSERTs become
    value-preserving no-ops and replayed DELETEs retract nothing."""
    log = _write_log(spark, tmp_path, [_T1, _T2])
    state_dir = _drain(spark, log, tmp_path, "sum_count")
    first = {tuple(r) for r in read_changelog_view(spark, state_dir).collect()}

    q = start_changelog_view(
        stream_changes(spark, log, max_files_per_trigger=2),
        "t", _DDL, ["id"], ["grp"], "v",
        state_dir, str(tmp_path / "ckpt_redrain"),  # fresh checkpoint
        available_now=True,
    )
    q.awaitTermination()
    second = {tuple(r) for r in read_changelog_view(spark, state_dir).collect()}
    assert second == first
    rep = read_changelog_replica(spark, state_dir)
    assert {tuple(r) for r in rep.collect()} == {
        tuple(r) for r in _df(spark, _T2).collect()
    }


def test_stream_start_validates_edges_and_pinned_spec(spark, tmp_path):
    """r9 review: parameter mismatches fail at START, not mid-batch —
    histogram without edges, and a start whose kind/params mismatch what
    init pinned the state with."""
    log = _write_log(spark, tmp_path, [_T1])
    state_dir = str(tmp_path / "vstate_pin")
    init_changelog_view(spark, state_dir, _DDL, ["grp"], "v", kind="sum_count")

    def _start(**kw):
        return start_changelog_view(
            stream_changes(spark, log, max_files_per_trigger=2),
            "t", _DDL, ["id"], ["grp"], "v",
            state_dir, str(tmp_path / "ckpt_pin"), available_now=True, **kw,
        )

    with pytest.raises(ValueError, match="lo/hi"):
        _start(kind="histogram")
    with pytest.raises(ValueError, match="initialized with"):
        _start(kind="moments")
    with pytest.raises(ValueError, match="kind must be one of"):
        _start(kind="nope")
    # matching parameters attach fine
    q = _start(kind="sum_count")
    q.awaitTermination()
    assert read_changelog_view(spark, state_dir).count() > 0


def test_stream_start_requires_init(spark, tmp_path):
    log = _write_log(spark, tmp_path, [_T1])
    with pytest.raises(ValueError, match="call .*init_changelog_view"):
        start_changelog_view(
            stream_changes(spark, log),
            "t", _DDL, ["id"], ["grp"], "v",
            str(tmp_path / "nostate"), str(tmp_path / "ckpt_ni"),
            available_now=True,
        )


def test_changelog_continuous_trigger_tracks_live_writer(spark, tmp_path):
    """Production shape: a processing-time-trigger stream stays attached
    while the ENGINE keeps appending ticks to the log — after each new
    tick drains (processAllAvailable — deterministic, no sleeps), the
    maintained state equals the from-scratch aggregate of that tick's
    table state.  Five ticks exercise group births, drains, moves, and
    null values under continuous operation."""
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"),
        emit_schema_changes=False,
    )
    ticks = [
        _T1,
        _T2,
        _T3,
        [(2, "b", 21.0), (5, "a", 5.0), (6, "c", None), (7, "a", 1.0)],
        [(5, "a", 5.0), (7, "b", 2.0)],
    ]
    eng.poll_once({"t": _df(spark, ticks[0])}, mode="diff", keys={"t": ["id"]})

    state_dir = str(tmp_path / "vstate_live")
    init_changelog_view(spark, state_dir, _DDL, ["grp"], "v")
    q = start_changelog_view(
        stream_changes(spark, str(tmp_path / "log"), max_files_per_trigger=4),
        "t", _DDL, ["id"], ["grp"], "v",
        state_dir, str(tmp_path / "ckpt_live"), trigger_seconds=1,
    )
    try:
        for i, rows in enumerate(ticks):
            if i:  # tick 0 was captured before the stream attached
                eng.poll_once({"t": _df(spark, rows)}, mode="diff", keys={"t": ["id"]})
            q.processAllAvailable()
            got = {
                r["grp"]: (r["agg_sum"], r["agg_rows"])
                for r in read_changelog_view(spark, state_dir).collect()
            }
            want = {
                r["grp"]: (r["agg_sum"], r["agg_rows"])
                for r in _df(spark, rows)
                .groupBy("grp")
                .agg(F.sum("v").alias("agg_sum"), F.count("*").alias("agg_rows"))
                .collect()
            }
            assert got == want, f"tick {i}: {got} != {want}"
    finally:
        q.stop()


def test_changelog_filtered_view_converges(spark, tmp_path):
    """``where`` restricts the maintained aggregate to the predicate
    subset: across real micro-batches — with boundary-crossing updates, a
    group-moving update, deletes, and a NULL-valued insert (NULL predicate
    = false) — the state equals the filtered from-scratch aggregate."""
    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])
    state_dir = _drain(spark, log, tmp_path, "sum_count", where="v >= 20")

    final = _df(spark, _T3)
    got = {
        r["grp"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["grp"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in final.filter("v >= 20")
        .groupBy("grp")
        .agg(
            F.sum("v").alias("agg_sum"),
            F.count("v").alias("agg_count"),
            F.count("*").alias("agg_rows"),
        )
        .collect()
    }
    assert got == want
    # the replica stays UNFILTERED (it is the wire's latest-per-key table)
    rep = read_changelog_replica(spark, state_dir)
    assert rep.count() == len(_T3)


def test_changelog_where_is_spec_pinned(spark, tmp_path):
    """A stream started with a different ``where`` than the state was
    initialized with must fail at start, not silently mix definitions."""
    log = _write_log(spark, tmp_path, [_T1])
    state_dir = str(tmp_path / "vstate_pin")
    init_changelog_view(
        spark, state_dir, _DDL, ["grp"], "v", where="v >= 20"
    )
    with pytest.raises(ValueError, match="initialized with"):
        start_changelog_view(
            stream_changes(spark, log),
            "t",
            _DDL,
            ["id"],
            ["grp"],
            "v",
            state_dir,
            str(tmp_path / "ckpt_pin"),
            available_now=True,
        )


def test_changelog_minmax_converges_with_retractions(spark, tmp_path):
    """min_max over the wire: insert-only batches fold; the deleting /
    value-moving ticks rebuild from the advanced replica — final state
    equals the from-scratch extrema of the final table."""
    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])
    state_dir = _drain(spark, log, tmp_path, "min_max")
    final = _df(spark, _T3)
    got = {
        r["grp"]: (r["agg_min"], r["agg_max"], r["agg_count"], r["agg_rows"])
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["grp"]: (r["mn"], r["mx"], r["c"], r["n"])
        for r in final.groupBy("grp")
        .agg(
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.count("v").alias("c"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == want


def test_changelog_distinct_count_converges(spark, tmp_path):
    """HLL distinct over the wire: the estimate over the drained stream
    equals the estimate over the final table exactly (same lgk; retracting
    batches rebuilt from the replica)."""
    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])
    state_dir = _drain(spark, log, tmp_path, "distinct_count")
    got = {
        r["grp"]: r["est"]
        for r in read_changelog_view(spark, state_dir)
        .select("grp", F.hll_sketch_estimate("sketch").alias("est"))
        .collect()
    }
    from cdc_lite_spark.operators.sketches import distinct_sketch_state

    want = {
        r["grp"]: r["est"]
        for r in distinct_sketch_state(_df(spark, _T3), ["grp"], "v", 12)
        .select("grp", F.hll_sketch_estimate("sketch").alias("est"))
        .collect()
    }
    assert got == want


def test_changelog_freq_items_converges(spark, tmp_path):
    """Misra-Gries over the wire: after draining (with retracting batches
    rebuilding from the replica), every surviving item's bracket holds
    against the final table's true counts."""
    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])
    state_dir = _drain(spark, log, tmp_path, "freq_items", k=4)
    from cdc_lite_spark.operators.freq import heavy_hitters

    hh = heavy_hitters(read_changelog_view(spark, state_dir), ["grp"])
    truth = {
        (r["grp"], str(r["v"])): r["n"]
        for r in _df(spark, _T3).groupBy("grp", "v").agg(F.count("*").alias("n")).collect()
    }
    rows = hh.collect()
    assert rows, "summary must survive the drain"
    for r in rows:
        true_n = truth.get((r["grp"], str(r["item"])), 0)
        assert r["count_lo"] <= true_n <= r["count_hi"]


def test_changelog_sample_converges_with_retractions(spark, tmp_path):
    """Deterministic bottom-k sample over the wire (r10): retracting
    batches (deletes / group-moving updates) rebuild from the advanced
    replica, in-group updates patch payloads — the drained state equals
    the from-scratch bottom-k of the final table EXACTLY (membership is a
    pure function of the key hash)."""
    from cdc_lite_spark.operators.incremental import sample_state

    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])
    state_dir = _drain(spark, log, tmp_path, "sample", k=2, key_cols=["id"])
    got = {tuple(r) for r in read_changelog_view(spark, state_dir).collect()}
    want = {
        tuple(r) for r in sample_state(_df(spark, _T3), ["grp"], "v", ["id"], 2).collect()
    }
    assert got == want
    # the null-valued insert (id=6) must be able to appear with v=None
    assert any(pk == "6" for (_, pk, _h, _v) in got) == any(
        pk == "6" for (_, pk, _h, _v) in want
    )


def test_changelog_sample_insert_only_folds_and_update_patches(spark, tmp_path):
    """An insert-only then in-group-update log must FOLD (zero batch
    rebuilds beyond the init build) and still equal the rebuild — the
    payload patch path over the wire, including the engine-enriched
    UPDATE classification."""
    import cdc_lite_spark.streaming.view_stream as vs
    from cdc_lite_spark.operators.incremental import sample_state

    t2 = _T1 + [(9, "d", 90.0), (10, "d", 95.0)]
    # tick 3: in-group value updates only (no deletes, no group moves)
    t3 = [(i, g, v + 1 if i % 2 == 0 else v) for (i, g, v) in t2]
    log = _write_log(spark, tmp_path, [_T1, t2, t3])
    builds = []
    real = vs._build_state

    def spy(*a, **kw):
        builds.append(1)
        return real(*a, **kw)

    vs._build_state = spy
    try:
        state_dir = _drain(spark, log, tmp_path, "sample", k=3, key_cols=["id"])
    finally:
        vs._build_state = real
    assert sum(builds) == 1  # init only — every batch folded
    got = {tuple(r) for r in read_changelog_view(spark, state_dir).collect()}
    want = {
        tuple(r) for r in sample_state(_df(spark, t3), ["grp"], "v", ["id"], 3).collect()
    }
    assert got == want


def test_changelog_sample_requires_key_cols_and_pins_spec(spark, tmp_path):
    """Param validation + the spec pin: init without key_cols fails; a
    start whose k mismatches the pinned init spec fails fast."""
    state_dir = str(tmp_path / "vstate")
    with pytest.raises(ValueError, match="need key_cols"):
        init_changelog_view(spark, state_dir, _DDL, ["grp"], "v", kind="sample")
    init_changelog_view(
        spark, state_dir, _DDL, ["grp"], "v", kind="sample", k=2, key_cols=["id"]
    )
    (tmp_path / "nolog").mkdir()  # stream source needs the dir to exist
    with pytest.raises(ValueError, match="initialized with"):
        start_changelog_view(
            stream_changes(spark, str(tmp_path / "nolog")),
            "t",
            _DDL,
            ["id"],
            ["grp"],
            "v",
            state_dir,
            str(tmp_path / "ckpt"),
            kind="sample",
            k=5,
            available_now=True,
        )


def test_changelog_degrading_kind_folds_insert_only_batch(spark, tmp_path):
    """An insert-only log (single growing tick sequence) must FOLD, not
    rebuild: pin by spying on the rebuild builder."""
    import cdc_lite_spark.streaming.view_stream as vs

    t2_grow = _T1 + [(9, "d", 90.0), (10, "d", 95.0)]
    log = _write_log(spark, tmp_path, [_T1, t2_grow])
    builds = []
    real = vs._build_state

    def spy(*a, **kw):
        builds.append(1)
        return real(*a, **kw)

    vs._build_state = spy
    try:
        state_dir = _drain(spark, log, tmp_path, "min_max")
    finally:
        vs._build_state = real
    # one build at INIT (v0 from empty history) — zero batch rebuilds...
    # except the first batch folds onto EMPTY state where min_max's fold
    # is still exact (least/greatest of null state and delta)
    assert sum(builds) == 1
    got = {
        r["grp"]: (r["agg_min"], r["agg_max"])
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["grp"]: (r["mn"], r["mx"])
        for r in _df(spark, t2_grow)
        .groupBy("grp")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_changelog_derived_view_converges(spark, tmp_path):
    """derive= over the wire: a maintained sum of an EXPRESSION (v * 2)
    grouped by a derived bucket, across real micro-batches with deletes
    and group-moving updates, equals the filtered from-scratch aggregate."""
    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])
    state_dir = str(tmp_path / "vstate_derived")
    derive = {"bucket": "CAST(FLOOR(v / 25) AS INT)", "dbl": "v * 2"}
    init_changelog_view(
        spark, state_dir, _DDL, ["bucket"], "dbl", derive=derive
    )
    q = start_changelog_view(
        stream_changes(spark, log, max_files_per_trigger=2),
        "t", _DDL, ["id"], ["bucket"], "dbl",
        state_dir, str(tmp_path / "ckpt_derived"),
        available_now=True, derive=derive,
    )
    q.awaitTermination()
    final = _df(spark, _T3)
    got = {
        r["bucket"]: (r["agg_sum"], r["agg_rows"])
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["bucket"]: (r["s"], r["n"])
        for r in final.withColumn("bucket", F.expr("CAST(FLOOR(v / 25) AS INT)"))
        .withColumn("dbl", F.expr("v * 2"))
        .groupBy("bucket")
        .agg(F.sum("dbl").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want


# --- wire-driven JOIN views (r10) -------------------------------------------

from cdc_lite_spark.streaming.view_stream import (  # noqa: E402
    init_changelog_join_view,
    read_changelog_join_view,
    start_changelog_join_view,
)

_FACT_DDL = "fid BIGINT, fk BIGINT, amount DECIMAL(10,2)"
_DIM_DDL = "did BIGINT, label STRING"


def _fact(spark, rows):
    return spark.createDataFrame(
        rows, "fid BIGINT, fk BIGINT, amount DOUBLE"
    ).withColumn("amount", F.col("amount").cast("decimal(10,2)"))


def _dim(spark, rows):
    return spark.createDataFrame(rows, "did BIGINT, label STRING")


# tick 1: two dims, three facts, one DANGLING fact (fk=3 has no dim yet)
_F1 = [(1, 1, 10.0), (2, 1, 20.0), (3, 2, 30.0), (4, 3, 40.0)]
_D1 = [(1, "a"), (2, "b")]
# tick 2: dim 3 ARRIVES (dangling fact re-enters), dim 2 relabeled
# (fan-out into fact 3), fact 2 deleted, fact 5 inserted, fact 1 updated
_F2 = [(1, 1, 11.0), (3, 2, 30.0), (4, 3, 40.0), (5, 2, 50.0)]
_D2 = [(1, "a"), (2, "B"), (3, "c")]
# tick 3: dim 1 DELETED (its facts drop out of the inner join)
_F3 = [(1, 1, 11.0), (3, 2, 30.0), (4, 3, 40.0), (5, 2, 50.0)]
_D3 = [(2, "B"), (3, "c")]


def _write_join_log(spark, tmp_path, ticks) -> str:
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "jlog"),
        state_dir=str(tmp_path / "jestate"),
        emit_schema_changes=False,
    )
    for frows, drows in ticks:
        eng.poll_once(
            {"f": _fact(spark, frows), "d": _dim(spark, drows)},
            mode="diff",
            keys={"f": ["fid"], "d": ["did"]},
        )
    return str(tmp_path / "jlog")


def _drain_join(spark, log_dir, tmp_path, **kw):
    state_dir = str(tmp_path / "jvstate")
    init_changelog_join_view(
        spark, state_dir, "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
        **kw,
    )
    q = start_changelog_join_view(
        stream_changes(spark, log_dir, max_files_per_trigger=2),
        "f",
        "d",
        _FACT_DDL,
        _DIM_DDL,
        ["fid"],
        ["fk"],
        ["did"],
        state_dir,
        str(tmp_path / "jckpt"),
        available_now=True,
    )
    q.awaitTermination()
    return state_dir


def _expected_join(spark, frows, drows):
    f, d = _fact(spark, frows), _dim(spark, drows)
    return {
        tuple(r)
        for r in f.join(d, f["fk"] == d["did"], "inner").collect()
    }


def test_changelog_join_view_converges_across_batches(spark, tmp_path):
    """Wire-only fact⋈dim maintenance across real micro-batches: dangling
    facts re-enter when their dim arrives, dim relabels fan out, fact and
    dim deletes retract — the final join state equals the from-scratch
    join of the final tables."""
    log = _write_join_log(
        spark, tmp_path, [(_F1, _D1), (_F2, _D2), (_F3, _D3)]
    )
    state_dir = _drain_join(spark, log, tmp_path)
    got = {tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()}
    assert got == _expected_join(spark, _F3, _D3)
    # the dangling fact (fid=4) entered when dim 3 arrived and survived
    assert any(r[0] == 4 for r in got)
    # dim 1's facts dropped with its delete
    assert not any(r[1] == 1 for r in got)


def test_changelog_join_view_history_init_and_spec_pin(spark, tmp_path):
    """Mid-stream consumer: v0 built from history joins immediately; a
    restart with different keys fails against the pinned spec."""
    state_dir = str(tmp_path / "jvstate2")
    init_changelog_join_view(
        spark, state_dir, "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
        fact_history=_fact(spark, _F1),
        dim_history=_dim(spark, _D1),
    )
    got = {tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()}
    assert got == _expected_join(spark, _F1, _D1)
    (tmp_path / "jnolog").mkdir()
    with pytest.raises(ValueError, match="initialized with"):
        start_changelog_join_view(
            stream_changes(spark, str(tmp_path / "jnolog")),
            "f",
            "d",
            _FACT_DDL,
            _DIM_DDL,
            ["fid"],
            ["amount"],  # different FK than pinned
            ["did"],
            state_dir,
            str(tmp_path / "jckpt2"),
            available_now=True,
        )


def test_changelog_join_view_validates_params(spark, tmp_path):
    state_dir = str(tmp_path / "jvstate3")
    with pytest.raises(ValueError, match="pair positionally"):
        init_changelog_join_view(
            spark, state_dir, "f", "d", _FACT_DDL, _DIM_DDL,
            ["fid"], ["fk"], ["did", "label"],
        )
    with pytest.raises(ValueError, match="must not collide"):
        init_changelog_join_view(
            spark, state_dir, "f", "d", _FACT_DDL,
            "fid BIGINT, label STRING",  # fid collides with the fact side
            ["fid"], ["fk"], ["fid"],
        )
    with pytest.raises(ValueError, match="not in the declared schema"):
        init_changelog_join_view(
            spark, state_dir, "f", "d", _FACT_DDL, _DIM_DDL,
            ["fid"], ["nope"], ["did"],
        )
    with pytest.raises(ValueError, match="call\\s+init_changelog_join_view"):
        (tmp_path / "jnolog3").mkdir()
        start_changelog_join_view(
            stream_changes(spark, str(tmp_path / "jnolog3")),
            "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
            state_dir + "_missing",
            str(tmp_path / "jckpt3"),
            available_now=True,
        )


def test_changelog_join_redrain_converges_to_same_state(spark, tmp_path):
    """Exactly-once: a second consumer draining the same log from scratch
    lands on the identical join state (replay determinism)."""
    log = _write_join_log(spark, tmp_path, [(_F1, _D1), (_F2, _D2)])
    s1 = _drain_join(spark, log, tmp_path)
    got1 = {tuple(r) for r in read_changelog_join_view(spark, s1).collect()}

    state_dir2 = str(tmp_path / "jvstate_b")
    init_changelog_join_view(
        spark, state_dir2, "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"]
    )
    q = start_changelog_join_view(
        stream_changes(spark, log, max_files_per_trigger=1),  # different batching
        "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
        state_dir2,
        str(tmp_path / "jckpt_b"),
        available_now=True,
    )
    q.awaitTermination()
    got2 = {tuple(r) for r in read_changelog_join_view(spark, state_dir2).collect()}
    assert got1 == got2 == _expected_join(spark, _F2, _D2)


# --- bucketed replica layout (r10) ------------------------------------------


def test_bucketed_replica_parity_with_flat(spark, tmp_path):
    """The hash-bucketed replica layout is a pure layout change: draining
    the same log bucketed and flat lands on identical agg state AND
    identical replica contents — for an abelian kind and for a degrading
    kind whose retracting batches rebuild from the (bucketed) replica."""
    log = _write_log(spark, tmp_path, [_T1, _T2, _T3])

    # sample: the third retraction discipline (in-group updates patch,
    # deletes rebuild from the bucketed replica's full read)
    for kind in ("sum_count", "min_max", "sample"):
        kw = {"key_cols": ["id"]} if kind == "sample" else {}
        flat = _drain(spark, log, tmp_path, kind, **kw)
        bk_state = str(tmp_path / f"vstate_bkp_{kind}")
        init_changelog_view(
            spark, bk_state, _DDL, ["grp"], "v", kind=kind,
            key_cols=["id"], buckets=8,
        )
        q = start_changelog_view(
            stream_changes(spark, log, max_files_per_trigger=2),
            "t", _DDL, ["id"], ["grp"], "v",
            bk_state, str(tmp_path / f"ckpt_bkp_{kind}"),
            kind=kind, available_now=True, buckets=8,
        )
        q.awaitTermination()
        got = {tuple(r) for r in read_changelog_view(spark, bk_state).collect()}
        want = {tuple(r) for r in read_changelog_view(spark, flat).collect()}
        assert got == want, kind
        got_rep = {
            tuple(r) for r in read_changelog_replica(spark, bk_state).collect()
        }
        assert got_rep == {tuple(r) for r in _df(spark, _T3).collect()}, kind


def test_bucketed_epoch_writes_only_touched_buckets(spark, tmp_path):
    """The layout's point: an epoch whose batch touches few keys writes
    only those keys' buckets — untouched buckets carry forward their OLD
    epoch dir in the manifest, and the new epoch dir contains only the
    touched bucket subdirs."""
    import os

    from cdc_lite_spark.streaming.bucketed import BucketedReplica

    # tick 1: 40 keys across many buckets; tick 2: ONE key updated
    t1 = [(i, "g", float(i)) for i in range(40)]
    t2 = [(i, "g", float(i) if i != 7 else 700.0) for i in range(40)]
    log = _write_log(spark, tmp_path, [t1, t2])
    state_dir = str(tmp_path / "vstate_touch")
    init_changelog_view(
        spark, state_dir, _DDL, ["grp"], "v", key_cols=["id"], buckets=8
    )
    q = start_changelog_view(
        # one tick per micro-batch: the engine writes one file per tick
        stream_changes(spark, log, max_files_per_trigger=1),
        "t", _DDL, ["id"], ["grp"], "v",
        state_dir, str(tmp_path / "ckpt_touch"),
        available_now=True, buckets=8,
    )
    q.awaitTermination()

    brep = BucketedReplica(spark, state_dir + "/replica", 8, ["id"], _DDL)
    man = brep.current_manifest()
    # the single-key tick-2 batch touched exactly one bucket
    batch2 = spark.createDataFrame([(7,)], "id BIGINT")
    [touched_bucket] = brep.touched_ids(batch2)
    last_edir = man["buckets"][str(touched_bucket)]
    written = brep._written_buckets(last_edir)
    assert written == [touched_bucket], (
        "the final epoch dir must hold ONLY the touched bucket"
    )
    # untouched buckets reference an OLDER epoch dir
    other = [e for b, e in man["buckets"].items() if int(b) != touched_bucket]
    assert other and all(e != last_edir for e in other)
    # and the whole replica still reads correctly
    got = {tuple(r) for r in read_changelog_replica(spark, state_dir).collect()}
    assert got == {tuple(r) for r in _df(spark, t2).collect()}
    # convergence of the agg too
    agg = {
        r["grp"]: r["agg_sum"]
        for r in read_changelog_view(spark, state_dir).collect()
    }
    assert float(agg["g"]) == float(sum(v for _, _, v in t2))
    # layout observability (r11 verdict ask #6 bonus): the status reader
    # reports bucket count vs occupancy from the manifest alone
    st = changelog_view_status(spark, state_dir)
    occ = st["layout"]["replica"]
    assert occ["buckets"] == 8
    assert occ["occupied"] == len(man["buckets"])
    assert occ["gen"] == man["gen"]


def test_bucketed_redrain_fresh_checkpoint_converges(spark, tmp_path):
    """A second consumer run over the same log with a FRESH checkpoint
    (epochs restart at 0 over advanced state) must converge identically —
    the gen-named epoch dirs prevent aliasing a still-referenced dir."""
    log = _write_log(spark, tmp_path, [_T1, _T2])
    state_dir = str(tmp_path / "vstate_rd")
    init_changelog_view(
        spark, state_dir, _DDL, ["grp"], "v", key_cols=["id"], buckets=4
    )

    def _go(ck):
        q = start_changelog_view(
            stream_changes(spark, log, max_files_per_trigger=2),
            "t", _DDL, ["id"], ["grp"], "v",
            state_dir, str(tmp_path / ck), available_now=True, buckets=4,
        )
        q.awaitTermination()

    _go("ckpt_rd1")
    first = {tuple(r) for r in read_changelog_view(spark, state_dir).collect()}
    _go("ckpt_rd2")
    second = {tuple(r) for r in read_changelog_view(spark, state_dir).collect()}
    assert first == second
    rep = {tuple(r) for r in read_changelog_replica(spark, state_dir).collect()}
    assert rep == {tuple(r) for r in _df(spark, _T2).collect()}


def test_bucketed_validation_and_spec_pin(spark, tmp_path):
    state_dir = str(tmp_path / "vstate_val")
    with pytest.raises(ValueError, match="need key_cols"):
        init_changelog_view(
            spark, state_dir, _DDL, ["grp"], "v", buckets=8
        )
    with pytest.raises(ValueError, match="must be positive"):
        init_changelog_view(
            spark, state_dir, _DDL, ["grp"], "v", key_cols=["id"], buckets=0
        )
    init_changelog_view(
        spark, state_dir, _DDL, ["grp"], "v", key_cols=["id"], buckets=8
    )
    (tmp_path / "nolog_bk").mkdir()
    # starting FLAT against bucketed-pinned state must fail fast
    with pytest.raises(ValueError, match="initialized with"):
        start_changelog_view(
            stream_changes(spark, str(tmp_path / "nolog_bk")),
            "t", _DDL, ["id"], ["grp"], "v",
            state_dir, str(tmp_path / "ckpt_val"), available_now=True,
        )


# --- aggregates over wire-driven join views (r10) ----------------------------

from cdc_lite_spark.streaming.view_stream import (  # noqa: E402
    read_changelog_join_agg,
)


def _drain_join_agg(spark, log_dir, tmp_path, agg, tag):
    state_dir = str(tmp_path / f"jvagg_{tag}")
    init_changelog_join_view(
        spark, state_dir, "f", "d", _FACT_DDL, _DIM_DDL,
        ["fid"], ["fk"], ["did"], agg=agg,
    )
    q = start_changelog_join_view(
        stream_changes(spark, log_dir, max_files_per_trigger=2),
        "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
        state_dir, str(tmp_path / f"jvagg_ck_{tag}"),
        available_now=True, agg=agg,
    )
    q.awaitTermination()
    return state_dir


def test_wire_join_agg_sum_count_converges(spark, tmp_path):
    """A grouped sum over fact⋈dim maintained end-to-end from the wire:
    the agg folds the join fold's own I/D records — final state equals
    the from-scratch aggregate of the final join."""
    log = _write_join_log(spark, tmp_path, [(_F1, _D1), (_F2, _D2), (_F3, _D3)])
    agg = {"group_keys": ["label"], "value_col": "amount"}
    state_dir = _drain_join_agg(spark, log, tmp_path, agg, "sc")
    got = {
        r["label"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in read_changelog_join_agg(spark, state_dir).collect()
    }
    f, d = _fact(spark, _F3), _dim(spark, _D3)
    want = {
        r["label"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in f.join(d, f["fk"] == d["did"], "inner")
        .groupBy("label")
        .agg(
            F.sum("amount").alias("agg_sum"),
            F.count("amount").alias("agg_count"),
            F.count("*").alias("agg_rows"),
        )
        .collect()
    }
    assert got == want
    # and the join state itself still converged
    assert {
        tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()
    } == _expected_join(spark, _F3, _D3)


def test_wire_join_agg_minmax_degrades_to_view_rebuild(spark, tmp_path):
    """A degrading kind over the wire join: changed ticks carry DELETEs in
    the I/D encoding, so min_max rebuilds from the NEW join state (never a
    re-join) — final extrema equal the from-scratch recompute."""
    log = _write_join_log(spark, tmp_path, [(_F1, _D1), (_F2, _D2)])
    agg = {"group_keys": ["label"], "value_col": "amount", "kind": "min_max"}
    state_dir = _drain_join_agg(spark, log, tmp_path, agg, "mm")
    got = {
        r["label"]: (r["agg_min"], r["agg_max"])
        for r in read_changelog_join_agg(spark, state_dir).collect()
    }
    f, d = _fact(spark, _F2), _dim(spark, _D2)
    want = {
        r["label"]: (r["mn"], r["mx"])
        for r in f.join(d, f["fk"] == d["did"], "inner")
        .groupBy("label")
        .agg(F.min("amount").alias("mn"), F.max("amount").alias("mx"))
        .collect()
    }
    assert got == want


def test_wire_join_agg_validation_and_spec(spark, tmp_path):
    log = _write_join_log(spark, tmp_path, [(_F1, _D1)])
    with pytest.raises(ValueError, match="group_keys and value_col"):
        _drain_join_agg(spark, log, tmp_path, {"kind": "sum_count"}, "bad1")
    with pytest.raises(ValueError, match="not in the join view"):
        _drain_join_agg(
            spark, log, tmp_path,
            {"group_keys": ["nope"], "value_col": "amount"}, "bad2",
        )
    # agg is part of the pinned spec: restart without it must fail
    agg = {"group_keys": ["label"], "value_col": "amount"}
    state_dir = _drain_join_agg(spark, log, tmp_path, agg, "pin")
    (tmp_path / "nolog_ja").mkdir()
    with pytest.raises(ValueError, match="initialized with"):
        start_changelog_join_view(
            stream_changes(spark, str(tmp_path / "nolog_ja")),
            "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
            state_dir, str(tmp_path / "ck_ja_pin2"), available_now=True,
        )


def test_changelog_view_status_reports_pointers(spark, tmp_path):
    """The wire-consumer status helper: pinned spec + per-state committed
    pointer, for both the single-table and the join layout — FS reads
    only."""
    from cdc_lite_spark.streaming.view_stream import changelog_view_status

    log = _write_log(spark, tmp_path, [_T1, _T2])
    sd = _drain(spark, log, tmp_path, "sum_count")
    st = changelog_view_status(spark, sd)
    assert st["spec"]["kind"] == "sum_count"
    assert st["states"]["replica"] == st["states"]["agg"]  # same epoch chain
    assert st["states"]["agg"].startswith("v")

    jlog = _write_join_log(spark, tmp_path, [(_F1, _D1)])
    jsd = _drain_join_agg(
        spark, jlog, tmp_path,
        {"group_keys": ["label"], "value_col": "amount"}, "status",
    )
    jst = changelog_view_status(spark, jsd)
    assert jst["spec"]["kind"] == "join"
    assert set(jst["states"]) == {"fact_replica", "dim_replica", "join", "agg"}


def test_changelog_quantiles_and_heavy_hitters_readers(spark, tmp_path):
    """The wire twins of view_quantiles / view_heavy_hitters read their
    parameters from the pinned spec and only touch state; kind mismatch
    fails with a clear error."""
    from cdc_lite_spark.operators.histogram import (
        histogram_state,
        quantiles_from_histogram,
    )
    from cdc_lite_spark.streaming.view_stream import (
        changelog_heavy_hitters,
        changelog_view_quantiles,
    )

    log = _write_log(spark, tmp_path, [_T1, _T2])
    final = _df(spark, _T2)
    hd = _drain(spark, log, tmp_path, "histogram", lo=0.0, hi=60.0, bins=6)
    got = {
        tuple(r) for r in changelog_view_quantiles(spark, hd, [0.5, 0.9]).collect()
    }
    want = {
        tuple(r)
        for r in quantiles_from_histogram(
            histogram_state(final, ["grp"], "v", 0.0, 60.0, 6),
            ["grp"], [0.5, 0.9], 0.0, 60.0, 6,
        ).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="not freq_items"):
        changelog_heavy_hitters(spark, hd)

    fd = _drain(spark, log, tmp_path, "freq_items", k=4)
    hh = changelog_heavy_hitters(spark, fd)
    truth = {
        (r["grp"], str(r["v"])): r["n"]
        for r in final.groupBy("grp", "v").agg(F.count("*").alias("n")).collect()
    }
    rows = hh.collect()
    assert rows
    for r in rows:
        true_n = truth.get((r["grp"], str(r["item"])), 0)
        assert r["count_lo"] <= true_n <= r["count_hi"]
    with pytest.raises(ValueError, match="not histogram"):
        changelog_view_quantiles(spark, fd, [0.5])


def test_bucketed_commit_never_reuses_epoch_dir_names(spark, tmp_path):
    """Regression (r10 review): a fresh-checkpoint redrain's epoch 0 can
    find a surviving m0.json as its basis while _CURRENT references the
    dir that basis-derived naming would produce — commit must allocate a
    NEVER-USED epoch dir instead of overwriting a live-referenced one."""
    import os

    from cdc_lite_spark.streaming.bucketed import BucketedReplica

    root = str(tmp_path / "brep")
    ddl = "id BIGINT, v DOUBLE"
    brep = BucketedReplica(spark, root, 4, ["id"], ddl)
    rows = spark.createDataFrame([(i, float(i)) for i in range(20)], ddl)
    brep.init(rows)

    batch1 = spark.createDataFrame([(1, -1.0)], ddl)
    man0 = brep.manifest_for_epoch(0)
    t1 = brep.touched_ids(batch1)
    new1 = (
        brep.read(man0, t1)
        .join(batch1.select("id"), ["id"], "left_anti")
        .unionByName(batch1)
    )
    m1 = brep.commit(new1, t1, man0, 0)
    e1_dirs = {e for e in m1["buckets"].values()}
    assert "e1" in e1_dirs
    e1_files = sorted(os.listdir(f"{root}/e1"))

    # simulated fresh-checkpoint redrain: epoch 0 again, basis m0 again
    # (manifest_for_epoch(0) prefers the surviving m0.json), DIFFERENT batch
    batch2 = spark.createDataFrame([(2, -2.0)], ddl)
    man0_again = brep.manifest_for_epoch(0)
    t2 = brep.touched_ids(batch2)
    new2 = (
        brep.read(man0_again, t2)
        .join(batch2.select("id"), ["id"], "left_anti")
        .unionByName(batch2)
    )
    m1b = brep.commit(new2, t2, man0_again, 0)
    # the rewrite landed in a FRESH dir — never e1 (live-referenced) or e0
    new_dirs = {
        m1b["buckets"][str(b)] for b in t2 if str(b) in m1b["buckets"]
    }
    assert "e1" not in new_dirs and "e0" not in new_dirs
    # e1 itself was never opened for overwrite while referenced: its file
    # listing is intact for as long as it exists on disk
    if os.path.isdir(f"{root}/e1"):
        assert sorted(os.listdir(f"{root}/e1")) == e1_files


def test_key_cols_mismatch_fails_and_old_pins_upgrade(spark, tmp_path):
    """Regression (r10 review): key_cols is correctness-critical for every
    kind — a restart with different key_cols than the pinned ones must
    fail fast; a pre-key_cols pin (init never declared them) upgrades in
    place on the first start and enforces thereafter."""
    log = _write_log(spark, tmp_path, [_T1])
    state_dir = str(tmp_path / "vstate_kc")
    init_changelog_view(spark, state_dir, _DDL, ["grp"], "v")  # no key_cols pinned

    def _start(kc, ck):
        q = start_changelog_view(
            stream_changes(spark, log, max_files_per_trigger=2),
            "t", _DDL, kc, ["grp"], "v",
            state_dir, str(tmp_path / ck), available_now=True,
        )
        q.awaitTermination()

    _start(["id"], "ck_kc1")  # upgrades the pin with key_cols=["id"]
    with pytest.raises(ValueError, match="initialized with"):
        _start(["grp"], "ck_kc2")  # different identity key: refused
    _start(["id"], "ck_kc3")  # matching restart still fine


def test_wire_join_agg_where_and_derive_compose(spark, tmp_path):
    """where= and derive= ride the wire join agg like the engine's
    join-agg views: derive extends both row images of the view-level I/D
    records, where re-classifies boundary crossings — final state equals
    the from-scratch filtered/derived aggregate of the final join."""
    log = _write_join_log(spark, tmp_path, [(_F1, _D1), (_F2, _D2)])
    agg = {
        "group_keys": ["label"],
        "value_col": "net",
        "derive": {"net": "CAST(amount AS DOUBLE) * 0.5"},
        "where": "amount > 15",
    }
    state_dir = _drain_join_agg(spark, log, tmp_path, agg, "wd")
    got = {
        r["label"]: (r["agg_sum"], r["agg_rows"])
        for r in read_changelog_join_agg(spark, state_dir)
        .select("label", F.col("agg_sum").cast("double").alias("agg_sum"), "agg_rows")
        .collect()
    }
    f, d = _fact(spark, _F2), _dim(spark, _D2)
    j = (
        f.join(d, f["fk"] == d["did"], "inner")
        .withColumn("net", F.col("amount").cast("double") * 0.5)
        .filter("amount > 15")
    )
    want = {
        r["label"]: (r["s"], r["n"])
        for r in j.groupBy("label")
        .agg(
            F.sum("net").cast("double").alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == want


# --- r11: foreign / reordered wire-log guard ---------------------------------
#
# The consumers enforce per-key timestamp monotonicity (view_stream module
# docstring, "Ordering contract"): a replayed or reordered log's stale
# records are dropped before they can advance a replica or fold into any
# state, and the drops are counted (changelog_stale_dropped).

from cdc_lite_spark.streaming.view_stream import (  # noqa: E402
    changelog_stale_dropped,
    changelog_view_status,
)

_G1 = [(1, "a", 10.0), (2, "a", 20.0)]
# both tick-1 keys change (value / group), one new key — replaying tick 1's
# file afterwards must drop exactly the two changed keys' records
_G2 = [(1, "a", 11.0), (2, "b", 20.0), (3, "c", 5.0)]


def _json_parts(log_dir):
    import glob

    return sorted(glob.glob(str(log_dir) + "/part-*.json"))


def test_stale_replayed_file_is_dropped_and_counted(spark, tmp_path):
    """Replay an OLD log file after the drain (a foreign producer re-ships
    tick 1): the guard drops its records — view and replica stay at the
    converged state — and the per-table drop counter records them."""
    import shutil

    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"),
        emit_schema_changes=False,
    )
    eng.poll_once({"t": _df(spark, _G1)}, mode="diff", keys={"t": ["id"]})
    log = str(tmp_path / "log")
    tick1_files = _json_parts(log)
    eng.poll_once({"t": _df(spark, _G2)}, mode="diff", keys={"t": ["id"]})
    state_dir = _drain(spark, log, tmp_path, "sum_count")
    view0 = {tuple(r) for r in read_changelog_view(spark, state_dir).collect()}
    rep0 = {tuple(r) for r in read_changelog_replica(spark, state_dir).collect()}
    assert changelog_stale_dropped(spark, state_dir) == {}  # in-order so far

    for i, f in enumerate(tick1_files):
        shutil.copy(f, f"{log}/part-replayed-{i}.json")
    # resume the SAME checkpointed stream: only the replayed file is new
    q = start_changelog_view(
        stream_changes(spark, log, max_files_per_trigger=2),
        "t",
        _DDL,
        ["id"],
        ["grp"],
        "v",
        state_dir,
        str(tmp_path / "ckpt_sum_count"),
        kind="sum_count",
        available_now=True,
    )
    q.awaitTermination()

    assert {
        tuple(r) for r in read_changelog_view(spark, state_dir).collect()
    } == view0
    assert {
        tuple(r) for r in read_changelog_replica(spark, state_dir).collect()
    } == rep0
    st = changelog_stale_dropped(spark, state_dir)
    assert st["t"]["dropped"] == 2  # keys 1 and 2 — key 3 never had an old record
    # and the status reader surfaces the same counters
    assert changelog_view_status(spark, state_dir)["stale_dropped"] == st


def test_reordered_foreign_log_converges_newest_wins(spark, tmp_path):
    """Deliver a 2-tick log NEWEST FILE FIRST (a foreign producer with no
    ordering guarantee): the guard makes the fold converge to the newest-
    per-key state — identical to the in-order drain — instead of letting
    the late tick-1 file overwrite tick-2 values."""
    import os
    import shutil
    import time

    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "log0"),
        state_dir=str(tmp_path / "estate0"),
        emit_schema_changes=False,
    )
    eng.poll_once({"t": _df(spark, _G1)}, mode="diff", keys={"t": ["id"]})
    tick1_files = _json_parts(tmp_path / "log0")
    eng.poll_once({"t": _df(spark, _G2)}, mode="diff", keys={"t": ["id"]})
    tick2_files = [
        f for f in _json_parts(tmp_path / "log0") if f not in tick1_files
    ]

    # the foreign log: tick 2's file(s) listed/modified EARLIER than tick
    # 1's, so the file source's oldest-mtime-first order delivers them
    # reversed, in separate micro-batches (max_files_per_trigger=1)
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    now = time.time()
    for i, f in enumerate(tick2_files):
        dst = str(foreign / f"part-a{i}.json")
        shutil.copy(f, dst)
        os.utime(dst, (now - 120, now - 120))
    for i, f in enumerate(tick1_files):
        dst = str(foreign / f"part-b{i}.json")
        shutil.copy(f, dst)
        os.utime(dst, (now - 60, now - 60))

    state_dir = str(tmp_path / "vstate_foreign")
    init_changelog_view(spark, state_dir, _DDL, ["grp"], "v", kind="sum_count")
    q = start_changelog_view(
        stream_changes(spark, str(foreign), max_files_per_trigger=1),
        "t",
        _DDL,
        ["id"],
        ["grp"],
        "v",
        state_dir,
        str(tmp_path / "ckpt_foreign"),
        kind="sum_count",
        available_now=True,
    )
    q.awaitTermination()

    final = _df(spark, _G2)
    got = {
        r["grp"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["grp"]: (r["agg_sum"], r["agg_count"], r["agg_rows"])
        for r in final.groupBy("grp")
        .agg(
            F.sum("v").alias("agg_sum"),
            F.count("v").alias("agg_count"),
            F.count("*").alias("agg_rows"),
        )
        .collect()
    }
    assert got == want
    assert {
        tuple(r) for r in read_changelog_replica(spark, state_dir).collect()
    } == {tuple(r) for r in final.collect()}
    assert changelog_stale_dropped(spark, state_dir)["t"]["dropped"] == 2


# guard fixtures for the JOIN consumer: updates only (no deletes), so the
# replayed tick-1 records are all strictly stale for the keys tick 2
# touched — the delete-resurrection limit is documented, not tested here
_GJ_F1 = [(1, 1, 10.0), (2, 1, 20.0)]
_GJ_D1 = [(1, "a"), (2, "b")]
_GJ_F2 = [(1, 1, 12.0), (2, 2, 20.0)]  # value update + FK move
_GJ_D2 = [(1, "a2"), (2, "b")]  # dim 1 relabeled; dim 2 untouched


def test_join_consumer_drops_stale_replay_per_side(spark, tmp_path):
    """The two-replica join consumer applies the same guard per side: a
    replayed tick-1 file neither regresses the replicas nor perturbs the
    join state, and each table's drops are counted separately."""
    import shutil

    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "jlog"),
        state_dir=str(tmp_path / "jestate"),
        emit_schema_changes=False,
    )
    keys = {"f": ["fid"], "d": ["did"]}
    eng.poll_once(
        {"f": _fact(spark, _GJ_F1), "d": _dim(spark, _GJ_D1)},
        mode="diff", keys=keys,
    )
    log = str(tmp_path / "jlog")
    tick1_files = _json_parts(log)
    eng.poll_once(
        {"f": _fact(spark, _GJ_F2), "d": _dim(spark, _GJ_D2)},
        mode="diff", keys=keys,
    )
    state_dir = _drain_join(spark, log, tmp_path)
    join0 = {tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()}
    assert join0 == _expected_join(spark, _GJ_F2, _GJ_D2)

    for i, f in enumerate(tick1_files):
        shutil.copy(f, f"{log}/part-replayed-{i}.json")
    q = start_changelog_join_view(
        stream_changes(spark, log, max_files_per_trigger=2),
        "f",
        "d",
        _FACT_DDL,
        _DIM_DDL,
        ["fid"],
        ["fk"],
        ["did"],
        state_dir,
        str(tmp_path / "jckpt"),
        available_now=True,
    )
    q.awaitTermination()

    assert {
        tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()
    } == join0
    st = changelog_stale_dropped(spark, state_dir)
    assert st["f"]["dropped"] == 2  # both tick-1 facts changed in tick 2
    assert st["d"]["dropped"] == 1  # dim 1 changed; dim 2's replay is equal-ts


# --- r11: dual-indexed wire-join fact replica (PK buckets + FK posting) ------

from cdc_lite_spark.streaming.view_stream import (  # noqa: E402
    read_changelog_fact_posting,
)


def _drain_join_dual(spark, log_dir, tmp_path, tag="dual", **kw):
    state_dir = str(tmp_path / f"jvstate_{tag}")
    init_changelog_join_view(
        spark, state_dir, "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
        fact_buckets=4, fk_buckets=3, **kw,
    )
    q = start_changelog_join_view(
        stream_changes(spark, log_dir, max_files_per_trigger=2),
        "f",
        "d",
        _FACT_DDL,
        _DIM_DDL,
        ["fid"],
        ["fk"],
        ["did"],
        state_dir,
        str(tmp_path / f"jckpt_{tag}"),
        available_now=True,
        fact_buckets=4,
        fk_buckets=3,
        **kw,
    )
    q.awaitTermination()
    return state_dir


def test_dual_indexed_join_parity_with_flat(spark, tmp_path):
    """The dual-indexed layout (PK-bucketed fact replica + FK posting
    index) must produce EXACTLY the flat path's join state across a
    multi-batch drain with dangling facts, fk moves, and deletes on both
    sides — and its posting index must equal a from-scratch rebuild over
    the final fact table."""
    from cdc_lite_spark.streaming.bucketed import BucketedReplica
    from cdc_lite_spark.streaming.view_stream import (
        _posting_build,
        _rep_ddl,
    )

    log = _write_join_log(
        spark, tmp_path, [(_F1, _D1), (_F2, _D2), (_F3, _D3)]
    )
    flat_dir = _drain_join(spark, log, tmp_path)
    dual_dir = _drain_join_dual(spark, log, tmp_path)
    flat = {tuple(r) for r in read_changelog_join_view(spark, flat_dir).collect()}
    dual = {tuple(r) for r in read_changelog_join_view(spark, dual_dir).collect()}
    assert dual == flat == _expected_join(spark, _F3, _D3)

    # posting invariant: committed index == rebuild over the final facts
    f_brep = BucketedReplica(
        spark, dual_dir + "/fact_replica", 4, ["fid"], _rep_ddl(_FACT_DDL)
    )
    final_fact = _fact(spark, _F3)
    want = {
        tuple(r)
        for r in _posting_build(final_fact, f_brep, ["fk"]).collect()
    }
    got = {
        tuple(r)
        for r in read_changelog_fact_posting(spark, dual_dir).collect()
    }
    assert got == want
    # refcounts are all positive and fid-bucket fan-out is consistent
    assert all(r[-1] > 0 for r in got)


def test_dual_indexed_dim_only_epoch_uses_posted_buckets(spark, tmp_path):
    """A dim-only tick must still reinstate/retract the referencing facts
    through the posting lookup (the pruned path that replaced the flat
    fact scan): relabeling a dim fans out into its facts, deleting a dim
    retracts them."""
    f1 = [(1, 10, 1.0), (2, 20, 2.0), (3, 30, 3.0)]
    d1 = [(10, "x"), (20, "y"), (30, "z")]
    # tick 2 touches ONLY the dim table
    d2 = [(10, "X"), (30, "z")]  # relabel 10, delete 20
    eng = CdcEngine(
        spark,
        output_dir=str(tmp_path / "dlog"),
        state_dir=str(tmp_path / "destate"),
        emit_schema_changes=False,
    )
    keys = {"f": ["fid"], "d": ["did"]}
    eng.poll_once(
        {"f": _fact(spark, f1), "d": _dim(spark, d1)}, mode="diff", keys=keys
    )
    eng.poll_once(
        {"f": _fact(spark, f1), "d": _dim(spark, d2)}, mode="diff", keys=keys
    )
    state_dir = _drain_join_dual(spark, str(tmp_path / "dlog"), tmp_path, tag="dimonly")
    got = {tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()}
    assert got == _expected_join(spark, f1, d2)
    assert not any(r[1] == 20 for r in got)  # dim 20's fact retracted
    assert any(r[4] == "X" for r in got)  # relabel fanned out


def test_dual_indexed_validation_and_spec_pin(spark, tmp_path):
    """fact_buckets is pinned at init: a flat start on a dual state (and
    vice versa, and a mismatched bucket count) must fail fast."""
    log = _write_join_log(spark, tmp_path, [(_F1, _D1)])
    state_dir = _drain_join_dual(spark, log, tmp_path, tag="pin")

    def _start(**kw):
        return start_changelog_join_view(
            stream_changes(spark, log),
            "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
            state_dir, str(tmp_path / "jckpt_pin2"),
            available_now=True, **kw,
        )

    with pytest.raises(ValueError, match="initialized with"):
        _start()  # flat start on a dual-indexed state
    with pytest.raises(ValueError, match="initialized with"):
        _start(fact_buckets=8, fk_buckets=3)  # wrong bucket count
    with pytest.raises(ValueError, match="must be positive"):
        init_changelog_join_view(
            spark, str(tmp_path / "bad"), "f", "d", _FACT_DDL, _DIM_DDL,
            ["fid"], ["fk"], ["did"], fact_buckets=0,
        )


def test_dual_indexed_redrain_fresh_checkpoint_converges(spark, tmp_path):
    """Replay discipline carries over both structures: a fresh-checkpoint
    redrain over surviving state reconverges to the same join state and
    posting index."""
    log = _write_join_log(
        spark, tmp_path, [(_F1, _D1), (_F2, _D2), (_F3, _D3)]
    )
    state_dir = _drain_join_dual(spark, log, tmp_path, tag="redrain")
    want_join = {
        tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()
    }
    want_post = {
        tuple(r)
        for r in read_changelog_fact_posting(spark, state_dir).collect()
    }
    q = start_changelog_join_view(
        stream_changes(spark, log, max_files_per_trigger=2),
        "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
        state_dir, str(tmp_path / "jckpt_redrain_fresh"),
        available_now=True, fact_buckets=4, fk_buckets=3,
    )
    q.awaitTermination()
    assert {
        tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()
    } == want_join
    assert {
        tuple(r)
        for r in read_changelog_fact_posting(spark, state_dir).collect()
    } == want_post


def test_dim_bucketed_join_parity_and_validation(spark, tmp_path):
    """dim_buckets= prunes the dim replica too: full triple-bucketed
    layout (fact PK + FK posting + dim key) must still equal the flat
    join state across the same multi-batch drain — including the
    dangling-fact reinstatement, whose re-entering facts carry fks the
    dim batch itself names — and the parameter is init-pinned and
    requires fact_buckets."""
    log = _write_join_log(
        spark, tmp_path, [(_F1, _D1), (_F2, _D2), (_F3, _D3)]
    )
    state_dir = _drain_join_dual(
        spark, log, tmp_path, tag="dimbkt", dim_buckets=2
    )
    got = {tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()}
    assert got == _expected_join(spark, _F3, _D3)

    with pytest.raises(ValueError, match="requires fact_buckets"):
        init_changelog_join_view(
            spark, str(tmp_path / "bad_dim"), "f", "d", _FACT_DDL, _DIM_DDL,
            ["fid"], ["fk"], ["did"], dim_buckets=2,
        )
    with pytest.raises(ValueError, match="initialized with"):
        start_changelog_join_view(
            stream_changes(spark, log),
            "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
            state_dir, str(tmp_path / "jckpt_dimbkt2"),
            available_now=True, fact_buckets=4, fk_buckets=3,  # missing dim_buckets
        )


# --- r11: bounded delete-tombstone retention ---------------------------------

from cdc_lite_spark.streaming.view_stream import _tombs_dir  # noqa: E402
from cdc_lite_spark.streaming._state import read_current  # noqa: E402

_TB1 = [(1, "a", 10.0), (2, "a", 20.0)]
_TB2 = [(1, "a", 10.0)]  # tick 2 DELETEs key 2


def _drain_tombs(spark, log, tmp_path, tag, horizon):
    state_dir = str(tmp_path / f"vstate_{tag}")
    init_changelog_view(
        spark, state_dir, _DDL, ["grp"], "v", kind="sum_count",
        key_cols=["id"], tombstone_horizon_s=horizon,
    )
    q = start_changelog_view(
        stream_changes(spark, log, max_files_per_trigger=1),
        "t", _DDL, ["id"], ["grp"], "v",
        state_dir, str(tmp_path / f"ckpt_{tag}"),
        kind="sum_count", available_now=True,
        tombstone_horizon_s=horizon,
    )
    q.awaitTermination()
    return state_dir


def test_tombstones_block_replay_across_delete(spark, tmp_path):
    """The ordering contract's limit (2), bounded: with retention on, a
    replayed pre-delete file cannot resurrect the deleted key."""
    import shutil

    eng = CdcEngine(
        spark, output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"), emit_schema_changes=False,
    )
    eng.poll_once({"t": _df(spark, _TB1)}, mode="diff", keys={"t": ["id"]})
    log = str(tmp_path / "log")
    tick1_files = _json_parts(log)
    eng.poll_once({"t": _df(spark, _TB2)}, mode="diff", keys={"t": ["id"]})
    state_dir = _drain_tombs(spark, log, tmp_path, "replay", 3600.0)
    rep0 = {tuple(r) for r in read_changelog_replica(spark, state_dir).collect()}
    assert not any(r[0] == 2 for r in rep0)  # deleted

    for i, f in enumerate(tick1_files):
        shutil.copy(f, f"{log}/part-replayed-{i}.json")
    q = start_changelog_view(
        stream_changes(spark, log, max_files_per_trigger=1),
        "t", _DDL, ["id"], ["grp"], "v",
        state_dir, str(tmp_path / "ckpt_replay"),
        kind="sum_count", available_now=True, tombstone_horizon_s=3600.0,
    )
    q.awaitTermination()
    rep1 = {tuple(r) for r in read_changelog_replica(spark, state_dir).collect()}
    assert rep1 == rep0  # key 2 did NOT resurrect
    st = changelog_stale_dropped(spark, state_dir)
    assert st["t"]["dropped"] >= 1  # the replayed key-2 insert was dropped
    # spec pin: a start WITHOUT retention on a tombstoned state fails
    with pytest.raises(ValueError, match="initialized with"):
        start_changelog_view(
            stream_changes(spark, log), "t", _DDL, ["id"], ["grp"], "v",
            state_dir, str(tmp_path / "ckpt_replay2"),
            kind="sum_count", available_now=True,
        )


def test_tombstones_block_out_of_order_delete_before_insert(spark, tmp_path):
    """A DELETE arriving before its key's INSERT (reordered foreign log)
    tombstones the key even though the replica never had it — the late
    insert is dropped and the final state equals the in-order drain's."""
    import os
    import shutil
    import time

    eng = CdcEngine(
        spark, output_dir=str(tmp_path / "log0"),
        state_dir=str(tmp_path / "estate0"), emit_schema_changes=False,
    )
    eng.poll_once({"t": _df(spark, _TB1)}, mode="diff", keys={"t": ["id"]})
    tick1_files = _json_parts(tmp_path / "log0")
    eng.poll_once({"t": _df(spark, _TB2)}, mode="diff", keys={"t": ["id"]})
    tick2_files = [
        f for f in _json_parts(tmp_path / "log0") if f not in tick1_files
    ]
    foreign = tmp_path / "foreign_tomb"
    foreign.mkdir()
    now = time.time()
    for i, f in enumerate(tick2_files):  # the DELETE arrives first
        dst = str(foreign / f"part-a{i}.json")
        shutil.copy(f, dst)
        os.utime(dst, (now - 120, now - 120))
    for i, f in enumerate(tick1_files):  # the INSERTs arrive second
        dst = str(foreign / f"part-b{i}.json")
        shutil.copy(f, dst)
        os.utime(dst, (now - 60, now - 60))
    state_dir = _drain_tombs(spark, str(foreign), tmp_path, "ooo", 3600.0)
    rep = {r[0] for r in read_changelog_replica(spark, state_dir).collect()}
    assert rep == {1}  # key 2's late insert was tombstone-dropped
    got = {
        r["grp"]: r["agg_sum"]
        for r in read_changelog_view(spark, state_dir).collect()
    }
    want = {
        r["grp"]: r["agg_sum"]
        for r in _df(spark, _TB2)
        .groupBy("grp").agg(F.sum("v").alias("agg_sum")).collect()
    }
    assert got == want


def test_tombstones_expire_past_the_horizon(spark, tmp_path):
    """Retention is BOUNDED: once newer batch timestamps age a tombstone
    past the horizon it is pruned (state stays small), and the default
    resurrect-on-replay behavior honestly returns."""
    import shutil

    eng = CdcEngine(
        spark, output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"), emit_schema_changes=False,
    )
    eng.poll_once({"t": _df(spark, _TB1)}, mode="diff", keys={"t": ["id"]})
    log = str(tmp_path / "log")
    tick1_files = _json_parts(log)
    eng.poll_once({"t": _df(spark, _TB2)}, mode="diff", keys={"t": ["id"]})
    import time as _time

    _time.sleep(1.1)  # tick 3's capture ts must age tick 2's tombstone out
    eng.poll_once(
        {"t": _df(spark, [(1, "a", 11.0)])}, mode="diff", keys={"t": ["id"]}
    )
    state_dir = _drain_tombs(spark, log, tmp_path, "expire", 1.0)
    tombs = read_current(spark, _tombs_dir(state_dir)).collect()
    assert tombs == []  # pruned by tick 3's newer timestamps

    for i, f in enumerate(tick1_files):
        shutil.copy(f, f"{log}/part-replayed-{i}.json")
    q = start_changelog_view(
        stream_changes(spark, log, max_files_per_trigger=1),
        "t", _DDL, ["id"], ["grp"], "v",
        state_dir, str(tmp_path / "ckpt_expire"),
        kind="sum_count", available_now=True, tombstone_horizon_s=1.0,
    )
    q.awaitTermination()
    rep = {r[0] for r in read_changelog_replica(spark, state_dir).collect()}
    assert 2 in rep  # beyond the horizon: documented default returns


def test_join_consumer_tombstones_block_fact_resurrection(spark, tmp_path):
    """Per-side tombstones in the join consumer: a replayed pre-delete
    fact file cannot resurrect the deleted fact into the replica or the
    join state."""
    import shutil

    f1, d1 = [(1, 1, 10.0), (2, 1, 20.0)], [(1, "a")]
    f2, d2 = [(1, 1, 10.0)], [(1, "a")]  # fact 2 deleted
    eng = CdcEngine(
        spark, output_dir=str(tmp_path / "jlog"),
        state_dir=str(tmp_path / "jestate"), emit_schema_changes=False,
    )
    keys = {"f": ["fid"], "d": ["did"]}
    eng.poll_once(
        {"f": _fact(spark, f1), "d": _dim(spark, d1)}, mode="diff", keys=keys
    )
    log = str(tmp_path / "jlog")
    tick1_files = _json_parts(log)
    eng.poll_once(
        {"f": _fact(spark, f2), "d": _dim(spark, d2)}, mode="diff", keys=keys
    )

    state_dir = str(tmp_path / "jvstate_tomb")
    kw = dict(tombstone_horizon_s=3600.0)
    init_changelog_join_view(
        spark, state_dir, "f", "d", _FACT_DDL, _DIM_DDL,
        ["fid"], ["fk"], ["did"], **kw,
    )

    def _go(ck):
        q = start_changelog_join_view(
            stream_changes(spark, log, max_files_per_trigger=1),
            "f", "d", _FACT_DDL, _DIM_DDL, ["fid"], ["fk"], ["did"],
            state_dir, str(tmp_path / ck), available_now=True, **kw,
        )
        q.awaitTermination()

    _go("jck_tomb1")
    join0 = {tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()}
    assert join0 == _expected_join(spark, f2, d2)
    for i, f in enumerate(tick1_files):
        shutil.copy(f, f"{log}/part-replayed-{i}.json")
    _go("jck_tomb2")
    assert {
        tuple(r) for r in read_changelog_join_view(spark, state_dir).collect()
    } == join0
    st = changelog_stale_dropped(spark, state_dir)
    assert st["f"]["dropped"] >= 1
    # r11 verdict ask #7: per-side tombstone observability on a join state
    tb = changelog_view_status(spark, state_dir, with_tombstones=True)["tombstones"]
    assert tb["horizon_s"] == 3600.0
    assert tb["states"]["f"]["live"] >= 1  # fact 2's delete marker retained
    assert tb["states"]["f"]["watermark"]
    assert tb["states"]["d"]["live"] == 0  # dim never saw a delete
    assert tb["states"]["d"]["watermark"] is None


def test_tombstone_status_reader(spark, tmp_path):
    """changelog_view_status(with_tombstones=True) reports live delete
    markers and the horizon's watermark (r11 verdict ask #7); the default
    call stays FS-reads-only and a retention-off state reports horizon
    None with no states."""
    eng = CdcEngine(
        spark, output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"), emit_schema_changes=False,
    )
    eng.poll_once({"t": _df(spark, _TB1)}, mode="diff", keys={"t": ["id"]})
    eng.poll_once({"t": _df(spark, _TB2)}, mode="diff", keys={"t": ["id"]})
    state_dir = _drain_tombs(spark, str(tmp_path / "log"), tmp_path, "stat", 3600.0)
    st = changelog_view_status(spark, state_dir, with_tombstones=True)
    tb = st["tombstones"]
    assert tb["horizon_s"] == 3600.0
    rs = tb["states"]["replica"]
    assert rs["live"] == 1  # key 2's delete, still inside the horizon
    assert isinstance(rs["watermark"], str) and rs["watermark"]
    assert "tombstones" not in changelog_view_status(spark, state_dir)

    # retention-off state: horizon None, nothing to aggregate
    sd2 = str(tmp_path / "vstate_off")
    init_changelog_view(spark, sd2, _DDL, ["grp"], "v", kind="sum_count")
    tb2 = changelog_view_status(spark, sd2, with_tombstones=True)["tombstones"]
    assert tb2 == {"horizon_s": None, "states": {}}


def test_any_file_order_converges_with_tombstones(spark, tmp_path):
    """The full ordering contract, exhaustively at small scale: with the
    guard + tombstone retention on, EVERY delivery order of a 3-tick
    log's files (each file one micro-batch) converges to the in-order
    final state — inserts, value/group updates, a delete, and a
    re-insert all present in the history."""
    import os
    import shutil
    import time

    t1 = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)]
    t2 = [(1, "a", 11.0), (3, "c", 30.0)]  # upd 1, DELETE 2, move 3
    t3 = [(1, "a", 11.0), (2, "b", 25.0), (3, "c", 30.0)]  # re-insert 2
    eng = CdcEngine(
        spark, output_dir=str(tmp_path / "log"),
        state_dir=str(tmp_path / "estate"), emit_schema_changes=False,
    )
    files_by_tick = []
    seen: list = []
    for t in (t1, t2, t3):
        eng.poll_once({"t": _df(spark, t)}, mode="diff", keys={"t": ["id"]})
        cur = _json_parts(tmp_path / "log")
        files_by_tick.append([f for f in cur if f not in seen])
        seen = cur

    final = _df(spark, t3)
    want_rep = {tuple(r) for r in final.collect()}
    orders = [(0, 1, 2), (2, 1, 0), (1, 2, 0), (2, 0, 1)]
    for oi, order in enumerate(orders):
        foreign = tmp_path / f"perm{oi}"
        foreign.mkdir()
        now = time.time()
        k = 0
        for tick in order:
            for f in files_by_tick[tick]:
                dst = str(foreign / f"part-{k:03d}.json")
                shutil.copy(f, dst)
                os.utime(dst, (now - 600 + k * 10, now - 600 + k * 10))
                k += 1
        state_dir = str(tmp_path / f"vstate_perm{oi}")
        init_changelog_view(
            spark, state_dir, _DDL, ["grp"], "v", kind="sum_count",
            key_cols=["id"], tombstone_horizon_s=3600.0,
        )
        q = start_changelog_view(
            stream_changes(spark, str(foreign), max_files_per_trigger=1),
            "t", _DDL, ["id"], ["grp"], "v",
            state_dir, str(tmp_path / f"ckpt_perm{oi}"),
            kind="sum_count", available_now=True,
            tombstone_horizon_s=3600.0,
        )
        q.awaitTermination()
        got = {
            tuple(r)
            for r in read_changelog_replica(spark, state_dir).collect()
        }
        assert got == want_rep, f"order {order} diverged: {got}"
