"""Mergeable frequent-items summaries (operators/freq.py): the Misra-
Gries guarantees — presence of every true-heavy item, the
[wt, wt+deficit] count bracket, bounded deficit — over builds, merges,
and insert-only folds; exactness when k covers the domain."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_lite_spark.operators.freq import (
    fold_freq_inserts,
    freq_items_state,
    heavy_hitters,
    merge_freq_states,
)


def _exact(df, keys, item_col):
    rows = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(*keys, item_col)
        .count()
        .collect()
    )
    out: dict = {}
    for r in rows:
        g = tuple(r[c] for c in keys)
        out.setdefault(g, {})[r[item_col]] = r["count"]
    return out


def _summary(state, keys):
    return {
        tuple(r[c] for c in keys): (
            dict(zip(r["items"], r["wts"])),
            r["deficit"],
            r["n_rows"],
        )
        for r in state.collect()
    }


def _check_guarantees(exact: dict, summ: dict, k: int):
    """The deterministic MG contract, regardless of partitioning."""
    assert set(summ) >= set(exact)
    for g, true_counts in exact.items():
        counters, deficit, n = summ[g]
        assert n == sum(true_counts.values())
        assert deficit <= n // (k + 1) + (1 if n % (k + 1) else 0)
        assert len(counters) <= k
        for item, wt in counters.items():
            true = true_counts.get(item, 0)
            assert wt <= true <= wt + deficit, (g, item, wt, true, deficit)
        for item, true in true_counts.items():
            if true > n / (k + 1):
                assert item in counters, (g, item, true, n, k)


def test_exact_when_k_covers_domain(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"), ("b", None)],
        "g STRING, item STRING",
    ).repartition(4)
    state = freq_items_state(df, ["g"], "item", k=8)
    summ = _summary(state, ["g"])
    assert summ[("a",)] == ({"x": 2, "y": 1}, 0, 3)
    # null items don't enter the multiset; the group row still exists
    assert summ[("b",)] == ({"z": 1}, 0, 1)


def test_heavy_items_survive_small_k(spark):
    # one dominant item (60%) + a tail of singletons, shuffled over
    # partitions: k=4 must keep the dominant item with a sound bracket
    rows = [("g", "HOT")] * 60 + [("g", f"t{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "g STRING, item STRING").repartition(8)
    state = freq_items_state(df, ["g"], "item", k=4)
    summ = _summary(state, ["g"])
    _check_guarantees(_exact(df, ["g"], "item"), summ, 4)
    counters, deficit, n = summ[("g",)]
    assert "HOT" in counters and n == 100
    hh = heavy_hitters(state, ["g"], min_share=0.5).collect()
    assert [r["item"] for r in hh] == ["HOT"]
    assert hh[0]["count_lo"] <= 60 <= hh[0]["count_hi"]


def test_merge_equals_union_guarantees(spark):
    a_rows = [("g", "x")] * 30 + [("g", f"a{i}") for i in range(20)]
    b_rows = [("g", "x")] * 25 + [("g", f"b{i}") for i in range(25)]
    a = spark.createDataFrame(a_rows, "g STRING, item STRING").repartition(4)
    b = spark.createDataFrame(b_rows, "g STRING, item STRING").repartition(4)
    k = 5
    merged = merge_freq_states(
        freq_items_state(a, ["g"], "item", k),
        freq_items_state(b, ["g"], "item", k),
        ["g"],
        k,
    )
    _check_guarantees(_exact(a.unionByName(b), ["g"], "item"), _summary(merged, ["g"]), k)


def test_fold_inserts_keeps_guarantees(spark):
    base = spark.createDataFrame(
        [("g", "x")] * 10 + [("g", f"t{i}") for i in range(10)],
        "g STRING, item STRING",
    )
    batch = spark.createDataFrame(
        [("g", "x")] * 5 + [("h", "fresh")] * 3, "g STRING, item STRING"
    )
    k = 4
    state = freq_items_state(base, ["g"], "item", k)
    folded = fold_freq_inserts(state, batch, ["g"], "item", k)
    _check_guarantees(
        _exact(base.unionByName(batch), ["g"], "item"), _summary(folded, ["g"]), k
    )
    # a brand-new group from the batch materializes
    assert ("h",) in _summary(folded, ["g"])


def test_global_summary_no_keys(spark):
    df = spark.createDataFrame(
        [("x",)] * 7 + [("y",)] * 2 + [("z",)], "item STRING"
    ).repartition(3)
    state = freq_items_state(df, [], "item", k=2)
    rows = state.collect()
    assert len(rows) == 1
    counters = dict(zip(rows[0]["items"], rows[0]["wts"]))
    assert "x" in counters
    assert rows[0]["n_rows"] == 10
    assert counters["x"] <= 7 <= counters["x"] + rows[0]["deficit"]


def test_validation(spark):
    df = spark.createDataFrame([("a", "x")], "g STRING, item STRING")
    with pytest.raises(ValueError, match="k must be positive"):
        freq_items_state(df, ["g"], "item", k=0)
    with pytest.raises(ValueError, match="not in frame"):
        freq_items_state(df, ["g"], "nope")


ITEMS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                      # group
        st.integers(min_value=0, max_value=12),           # item id
    ),
    min_size=0,
    max_size=60,
)


@given(rows=ITEMS, k=st.integers(min_value=1, max_value=6))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_mg_guarantees_under_random_multisets(spark, rows, k):
    """For ANY multiset and any k: every true-heavy item present, every
    bracket contains its true count, deficit ≤ n/(k+1) — partitioning
    included (repartition(5) forces multi-source merges)."""
    if not rows:
        return
    df = spark.createDataFrame(
        [(g, f"i{v}") for g, v in rows], "g STRING, item STRING"
    ).repartition(5)
    state = freq_items_state(df, ["g"], "item", k)
    _check_guarantees(_exact(df, ["g"], "item"), _summary(state, ["g"]), k)


def test_partition_freq_items_view_merges_with_guarantees(spark, tables, tmp_path):
    """freq_items as a PARTITION-view kind (r9): per-partition summaries
    replace wholesale on drift; view_merged collapses them with the
    bracket guarantee, and with k >= |distinct items| the merged weights
    equal true counts exactly (deficit 0)."""
    from pyspark.sql import functions as F

    from cdc_lite_spark import CdcEngine

    eng = CdcEngine(
        spark, output_dir=str(tmp_path / "c"), state_dir=str(tmp_path / "s")
    )
    eng.register_partition_agg_view(
        "prio_status", "orders", "o_orderpriority", [], "o_orderstatus",
        kind="freq_items", k=16,
    )
    orders = tables["orders"].select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    eng.poll_partitions("orders", orders, "o_orderpriority")

    mutated = orders.filter(F.col("o_orderkey") % 4 != 1)
    eng.poll_partitions("orders", mutated, "o_orderpriority")

    hh = eng.view_heavy_hitters("prio_status")
    got = {r["item"]: (r["count_lo"], r["count_hi"]) for r in hh.collect()}
    want = {
        r["o_orderstatus"]: r["n"]
        for r in mutated.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # k=16 >= 3 distinct statuses: exact (deficit 0 in every partition)
    assert got == {item: (n, n) for item, n in want.items()}


@given(rows=ITEMS, k=st.integers(min_value=1, max_value=6),
       parts=st.integers(min_value=2, max_value=4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_nway_merge_guarantees_under_random_splits(spark, rows, k, parts):
    """merge_grouped_freq (r9, the partition-view merge): split ANY
    multiset into N parts, summarize each independently, merge — every
    true-heavy item of the UNION present, every bracket contains its true
    count, deficit ≤ n/(k+1)."""
    from cdc_lite_spark.operators.freq import merge_grouped_freq

    if not rows:
        return
    df = spark.createDataFrame(
        [(g, f"i{v}", i % parts) for i, (g, v) in enumerate(rows)],
        "g STRING, item STRING, part INT",
    )
    summaries = [
        freq_items_state(df.filter(F.col("part") == p).drop("part"), ["g"], "item", k)
        for p in range(parts)
    ]
    allp = summaries[0]
    for s in summaries[1:]:
        allp = allp.unionByName(s)
    merged = merge_grouped_freq(allp, ["g"], k)
    _check_guarantees(_exact(df.drop("part"), ["g"], "item"), _summary(merged, ["g"]), k)
