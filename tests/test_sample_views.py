"""Maintained deterministic sample views (kind="sample"): per-group
bottom-k rows by primary-key hash — the KMV construction over row
identity.  Membership is a pure function of the key, so inserts fold
exactly, in-group updates patch the sampled payload in place, and
deletes / group-moving updates rebuild (the min_max degradation).
operators/incremental.py sample_state / apply_sample_delta; engine kind
dispatch + view_sample reader."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine
from cdc_lite_spark.operators.incremental import apply_sample_delta, sample_state

K = 7


def _engine(spark, tmp_path) -> CdcEngine:
    return CdcEngine(
        spark, output_dir=str(tmp_path / "changes"), state_dir=str(tmp_path / "state")
    )


def _orders(spark, tables):
    return tables["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )


def _sample_set(df):
    return {
        (r["o_orderstatus"], r["__pk"], str(r["price"])) for r in df.collect()
    }


# ------------------------------------------------------------- operator level


def test_sample_state_is_deterministic_bottom_k(spark, tables):
    """The state holds exactly min(k, |group|) rows per group, and two
    independent builds (different partitioning) agree exactly —
    membership is a pure function of the key."""
    orders = _orders(spark, tables)
    s1 = sample_state(orders, ["o_orderstatus"], "price", ["o_orderkey"], K)
    s2 = sample_state(
        orders.repartition(13), ["o_orderstatus"], "price", ["o_orderkey"], K
    )
    assert _sample_set(s1) == _sample_set(s2)
    sizes = {
        r["o_orderstatus"]: r["n"]
        for r in s1.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    groups = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {g: min(K, n) for g, n in groups.items()}


def test_sample_fold_equals_rebuild_on_inserts_and_updates(spark, tables):
    """Fold of an insert+in-group-update delta == from-scratch rebuild of
    the grown table, bit-exact: bottom-k is monotone under inserts and
    update payloads patch in place."""
    from cdc_lite_spark.operators.diff import snapshot_diff

    orders = _orders(spark, tables)
    k = F.col("o_orderkey")
    prev = orders.filter(k % 3 != 0)
    # grown = prev ∪ the %3 rows (inserts), with %5 prices doubled (updates)
    cur = orders.withColumn(
        "price",
        F.when((k % 3 != 0) & (k % 5 == 0), F.col("price") * 2).otherwise(
            F.col("price")
        ),
    )
    changes = snapshot_diff(prev, cur, ["o_orderkey"], include_prev=True)
    state = sample_state(prev, ["o_orderstatus"], "price", ["o_orderkey"], K)
    folded = apply_sample_delta(
        state, changes, ["o_orderstatus"], "price", ["o_orderkey"], K
    )
    rebuilt = sample_state(cur, ["o_orderstatus"], "price", ["o_orderkey"], K)
    assert _sample_set(folded) == _sample_set(rebuilt)


def test_sample_fold_patches_null_setting_updates(spark):
    """Regression (r9 ADVICE high): an in-group UPDATE that sets the value
    column to NULL must patch through to the sampled payload — a bare
    coalesce(new, old) would silently keep the stale value while a rebuild
    yields NULL, breaking fold==rebuild."""
    from cdc_lite_spark.operators.diff import snapshot_diff

    schema = "id int, grp string, v int"
    prev = spark.createDataFrame([(1, "a", 5), (2, "a", 7), (3, "b", 9)], schema)
    cur = spark.createDataFrame([(1, "a", None), (2, "a", 7), (3, "b", 9)], schema)
    changes = snapshot_diff(prev, cur, ["id"], include_prev=True)
    state = sample_state(prev, ["grp"], "v", ["id"], K)
    folded = apply_sample_delta(state, changes, ["grp"], "v", ["id"], K)
    rebuilt = sample_state(cur, ["grp"], "v", ["id"], K)
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(folded) == as_set(rebuilt)
    # the patched row really is NULL now
    assert {r["v"] for r in folded.filter(F.col("__pk") == "1").collect()} == {None}


def test_sample_state_rejects_value_col_in_keys(spark, tables):
    with pytest.raises(ValueError, match="must not be one of the group keys"):
        sample_state(
            _orders(spark, tables),
            ["o_orderstatus"],
            "o_orderstatus",
            ["o_orderkey"],
            K,
        )


# ----------------------------------------------------------------- engine e2e


def test_engine_sample_view_folds_and_rebuilds(spark, tables, tmp_path):
    """Across three real ticks — insert-only, in-group updates, then a
    deleting tick — the maintained sample always equals a from-scratch
    rebuild; the first two ticks FOLD (pinned by spy), the deleting tick
    rebuilds."""
    import cdc_lite_spark.operators.incremental as inc

    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "ex", "orders", ["o_orderstatus"], "price", kind="sample", k=K
    )
    orders = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    k = F.col("o_orderkey")

    base = orders.filter(k % 3 != 0)
    eng.poll_once({"orders": base}, mode="diff", keys=keys)

    calls = []
    real = inc.apply_sample_delta

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    inc.apply_sample_delta = spy
    try:
        # tick 2: inserts + in-group value updates — must FOLD
        grown = orders.withColumn(
            "price",
            F.when((k % 3 != 0) & (k % 5 == 0), F.col("price") * 2).otherwise(
                F.col("price")
            ),
        )
        eng.poll_once({"orders": grown}, mode="diff", keys=keys)
        assert len(calls) == 1
        want = sample_state(grown, ["o_orderstatus"], "price", ["o_orderkey"], K)
        assert _sample_set(eng.view("ex")) == _sample_set(want)

        # tick 3: deletes — must REBUILD (no fold call), still exact
        shrunk = grown.filter(k % 7 != 0)
        eng.poll_once({"orders": shrunk}, mode="diff", keys=keys)
        assert len(calls) == 1
        want = sample_state(shrunk, ["o_orderstatus"], "price", ["o_orderkey"], K)
        assert _sample_set(eng.view("ex")) == _sample_set(want)
    finally:
        inc.apply_sample_delta = real


def test_view_sample_reader_and_validation(spark, tables, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.register_agg_view(
        "ex", "orders", ["o_orderstatus"], "price", kind="sample", k=K
    )
    orders = _orders(spark, tables)
    eng.poll_once({"orders": orders}, mode="diff", keys={"orders": ["o_orderkey"]})
    out = eng.view_sample("ex")
    assert set(out.columns) == {"o_orderstatus", "pk", "price"}
    assert out.count() == out.select("pk").distinct().count()  # pk is identity

    eng.register_agg_view("sc", "orders", ["o_orderstatus"], "price")
    eng.poll_once({"orders": orders}, mode="diff", keys={"orders": ["o_orderkey"]})
    with pytest.raises(ValueError, match="not sample"):
        eng.view_sample("sc")
    with pytest.raises(ValueError, match="must not be one of the group keys"):
        eng.register_agg_view(
            "bad", "orders", ["o_orderstatus"], "o_orderstatus", kind="sample"
        )
    with pytest.raises(ValueError, match="positive"):
        eng.register_agg_view(
            "bad", "orders", ["o_orderstatus"], "price", kind="sample", k=0
        )
    # sample IS a partition-view kind since r10 — but row identity is
    # registration state there, so omitting pk_cols must fail fast
    with pytest.raises(ValueError, match="need pk_cols"):
        eng.register_partition_agg_view(
            "bad", "orders", "o_orderstatus", [], "price", kind="sample"
        )


def test_filtered_sample_view(spark, tables, tmp_path):
    """where= composes with the sample kind: the maintained sample is the
    bottom-k of the PREDICATE SUBSET, and an update crossing the predicate
    (a DELETE for the view's world) triggers the rebuild discipline."""
    eng = _engine(spark, tmp_path)
    pred = "price > 150000"
    eng.register_agg_view(
        "exf", "orders", ["o_orderstatus"], "price", kind="sample", k=K,
        where=pred,
    )
    orders = _orders(spark, tables)
    keys = {"orders": ["o_orderkey"]}
    eng.poll_once({"orders": orders}, mode="diff", keys=keys)

    k = F.col("o_orderkey")
    mutated = orders.withColumn(
        "price",
        F.when(k % 5 == 0, F.lit(1).cast("decimal(18,2)")).otherwise(
            F.col("price")
        ),
    )
    eng.poll_once({"orders": mutated}, mode="diff", keys=keys)
    want = sample_state(
        mutated.filter(pred), ["o_orderstatus"], "price", ["o_orderkey"], K
    )
    assert _sample_set(eng.view("exf")) == _sample_set(want)


def test_join_agg_sample_view(spark, tables, tmp_path):
    """agg_kind='sample' over a join view: the maintained per-segment
    example rows equal a from-scratch bottom-k over the joined relation
    (row identity = the fact key); an append-only tick folds, a tick
    touching existing rows rebuilds from the persisted view state."""
    eng = _engine(spark, tmp_path)
    orders = tables["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    cust = tables["customer"].select("c_custkey", "c_mktsegment")
    eng.register_join_view(
        "oc", fact_table="orders", dim_table="customer",
        fact_key="o_orderkey", fact_dim_col="o_custkey", dim_key="c_custkey",
    )
    eng.register_join_agg_view(
        "seg_examples", "oc", ["c_mktsegment"], "price", agg_kind="sample", k=K
    )
    keys = {"orders": ["o_orderkey"], "customer": ["c_custkey"]}

    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    eng.poll_once({"orders": base, "customer": cust}, mode="diff", keys=keys)

    def _want(fact):
        j = fact.join(cust, fact["o_custkey"] == cust["c_custkey"]).select(
            "o_orderkey", "c_mktsegment", "price"
        )
        return sample_state(j, ["c_mktsegment"], "price", ["o_orderkey"], K)

    def _got():
        return {
            (r["c_mktsegment"], r["__pk"], str(r["price"]))
            for r in eng.view("seg_examples").collect()
        }

    def _set(df):
        return {
            (r["c_mktsegment"], r["__pk"], str(r["price"])) for r in df.collect()
        }

    assert _got() == _set(_want(base))

    # append-only tick folds
    eng.poll_once({"orders": orders, "customer": cust}, mode="diff", keys=keys)
    assert _got() == _set(_want(orders))

    # deleting tick rebuilds (from persisted view state) — still exact
    shrunk = orders.filter(F.col("o_orderkey") % 7 != 0)
    eng.poll_once({"orders": shrunk, "customer": cust}, mode="diff", keys=keys)
    assert _got() == _set(_want(shrunk))

    with pytest.raises(ValueError, match="not sample"):
        eng.register_join_agg_view("bad", "oc", ["c_mktsegment"], "price")
        eng.view_sample("bad")
