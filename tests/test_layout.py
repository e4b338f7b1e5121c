"""Partitioned/sorted output layout (operators/layout.py).

Pins the write-path claims: O(|values|) files (no small-files explosion),
directory pruning visible as PartitionFilters in the read plan, tight
per-file min/max on the sort column, and round-trip fidelity.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from cdc_lite_spark.operators.layout import (
    file_stats,
    read_partitioned,
    write_partitioned,
)
from cdc_lite_spark.plans.inspect import explain_str
from cdc_lite_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, **kw):
    ev = load_table(spark, SF, "events").withColumn(
        "value_l", F.col("value").cast("long")
    )
    out = str(tmp_path / "events_by_type")
    write_partitioned(
        ev, out, partition_by=["event_type"], sort_by=["value_l"], **kw
    )
    return ev, out


def test_one_file_per_partition_value(spark, tmp_path):
    ev, out = _write_events(spark, tmp_path)
    n_types = ev.select("event_type").distinct().count()
    files = glob.glob(f"{out}/event_type=*/*.parquet")
    dirs = glob.glob(f"{out}/event_type=*")
    assert len(dirs) == n_types
    assert len(files) == n_types  # repartition-by-key prevented tasks×values


def test_roundtrip_preserves_rows(spark, tmp_path):
    ev, out = _write_events(spark, tmp_path)
    back = read_partitioned(spark, out)
    assert back.count() == ev.count()
    a = ev.groupBy("event_type").count().collect()
    b = back.groupBy("event_type").count().collect()
    assert {(r["event_type"], r["count"]) for r in a} == {
        (r["event_type"], r["count"]) for r in b
    }


def test_partition_filter_prunes_directories(spark, tmp_path):
    _ev, out = _write_events(spark, tmp_path)
    one = read_partitioned(spark, out).filter(F.col("event_type") == "click")
    plan = explain_str(one)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf  # coarse predicate prunes whole directories
    # and the scan's file listing only covers the matching directory
    loc = next(l for l in plan.splitlines() if "Location" in l)
    assert "events_by_type" in loc


def test_sorted_row_groups_have_tight_stats(spark, tmp_path):
    """Within each file, the sort column's footer min/max must span (almost)
    exactly the rows it holds — the precondition for row-group skipping.
    With one sorted file per partition the file min/max equals the true
    per-partition min/max."""
    ev, out = _write_events(spark, tmp_path)
    truth = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value_l").alias("lo"), F.max("value_l").alias("hi"))
        .collect()
    }
    for st in file_stats(out, "value_l"):
        etype = next(
            seg.split("=", 1)[1]
            for seg in st["path"].split("/")
            if seg.startswith("event_type=")
        )
        assert (st["min"], st["max"]) == truth[etype], st


def test_files_per_partition_spreads_hot_values(spark, tmp_path):
    """The salt bounds files at ≤ files_per_partition per value while
    letting a hot value spread across that many tasks.  AQE's
    coalesce-small-partitions pass (correctly) merges the tiny test
    shuffle back into one task, which would hide the spread — disable just
    that pass so the salt's effect is observable at toy scale."""
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        ev, out = _write_events(spark, tmp_path, files_per_partition=3)
    finally:
        spark.conf.set(coalesce_key, prev)
    n_types = ev.select("event_type").distinct().count()
    files = glob.glob(f"{out}/event_type=*/*.parquet")
    assert n_types < len(files) <= 3 * n_types
    back = read_partitioned(spark, out)
    assert back.count() == ev.count()


def test_write_zordered_files_cover_tight_rectangles(spark, tmp_path):
    """Z-ordered output: per-file min/max ranges on EACH participating
    dimension are a small fraction of the global range — the property
    multi-dimensional skipping rests on (directory partitioning can only
    deliver this for one dimension)."""
    from cdc_lite_spark.operators.layout import write_zordered

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 2654435761) % 64).alias("y"),
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, ["x", "y"], num_files=16, bits=6)
    for col in ("x", "y"):
        spans = [
            (st["max"] - st["min"])
            for st in file_stats(out, col)
            if st["min"] is not None
        ]
        assert len(spans) >= 8
        # average per-file span well under the global span of 63
        assert sum(spans) / len(spans) < 32, (col, spans)
    back = spark.read.parquet(out)
    assert back.count() == n
    assert set(back.columns) == {"x", "y"}  # the layout key is not persisted


def test_files_per_partition_spreads_without_sort_by(spark, tmp_path):
    """files_per_partition>1 with sort_by=None must still spread a hot
    value: the salt derives from the full row when there are no sort
    columns (a constant-per-value salt would silently serialize the hot
    value through one task — r04 advice)."""
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        ev = load_table(spark, SF, "events")
        out = str(tmp_path / "events_nosort")
        write_partitioned(
            ev, out, partition_by=["event_type"], sort_by=None, files_per_partition=3
        )
    finally:
        spark.conf.set(coalesce_key, prev)
    n_types = ev.select("event_type").distinct().count()
    files = glob.glob(f"{out}/event_type=*/*.parquet")
    assert n_types < len(files) <= 3 * n_types
    assert read_partitioned(spark, out).count() == ev.count()


# --- bucketed tables: the exchange-free co-located join layout ------------


def _conf(spark, key, val):
    prev = spark.conf.get(key)  # no default arg: fetch the EFFECTIVE value
    spark.conf.set(key, val)
    return prev


def _write_bucketed_pair(spark, tmp_path):
    from cdc_lite_spark.operators.layout import write_bucketed

    ord_ = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(
        ord_, "t_orders_bkt", str(tmp_path / "orders_bkt"), ["o_orderkey"], 8
    )
    write_bucketed(
        li, "t_lineitem_bkt", str(tmp_path / "lineitem_bkt"), ["l_orderkey"], 8
    )
    return ord_, li


def test_bucketed_write_one_file_per_bucket(spark, tmp_path):
    _write_bucketed_pair(spark, tmp_path)
    files = glob.glob(str(tmp_path / "orders_bkt" / "*.parquet"))
    assert len(files) == 8  # repartition-by-bucket-key prevented tasks x buckets


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed fact-fact join: SortMergeJoin with ZERO shuffle — the
    network phase of the join was paid once at write time.  This is the
    layout a 100 TB deployment uses for every repeated join key."""
    ord_, li = _write_bucketed_pair(spark, tmp_path)
    prev = _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_bkt")
        b = spark.table("t_lineitem_bkt")
        j = a.join(b, a.o_orderkey == b.l_orderkey).select("o_orderkey", "l_quantity")
        plan = explain_str(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == ord_.join(li, ord_.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, tmp_path):
    _write_bucketed_pair(spark, tmp_path)
    t = spark.table("t_lineitem_bkt")
    g = t.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = explain_str(g)
    assert "Exchange" not in plan  # grouping key == bucket key: no shuffle
    truth = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, truth.collect()))


def test_bucket_pruning_selects_one_bucket(spark, tmp_path):
    """Equality on the bucket column reads 1/num_buckets of the files.
    autoBucketedScan turns bucketed reading off for scan-only queries (it
    exists to re-merge tiny buckets); disabling it re-enables pruning."""
    _write_bucketed_pair(spark, tmp_path)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = _conf(spark, key, "false")
    try:
        one = spark.table("t_orders_bkt").filter(F.col("o_orderkey") == 32)
        plan = explain_str(one)
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert one.count() == 1
    finally:
        spark.conf.set(key, prev)


def test_register_bucketed_reattaches_metadata(spark, tmp_path):
    """A fresh catalog (new session / metastore) re-attaches the bucket
    spec over the existing files and immediately regains the
    exchange-free join — the files never move."""
    from cdc_lite_spark.operators.layout import register_bucketed

    ord_, li = _write_bucketed_pair(spark, tmp_path)
    spark.sql("DROP TABLE t_orders_bkt")
    spark.sql("DROP TABLE t_lineitem_bkt")
    a = register_bucketed(
        spark, "t_orders_bkt", str(tmp_path / "orders_bkt"), ["o_orderkey"], 8
    )
    b = register_bucketed(
        spark, "t_lineitem_bkt", str(tmp_path / "lineitem_bkt"), ["l_orderkey"], 8
    )
    prev = _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = explain_str(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == ord_.join(li, ord_.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_validate_bucketed_accepts_true_spec_rejects_false(spark, tmp_path):
    """The validator is the guard against register_bucketed's failure mode:
    a mis-declared spec mis-co-locates the exchange-free join silently."""
    from cdc_lite_spark.operators.layout import register_bucketed, validate_bucketed

    _write_bucketed_pair(spark, tmp_path)
    out = str(tmp_path / "orders_bkt")
    assert validate_bucketed(spark, out, ["o_orderkey"], 8) == 0
    # wrong bucket count: most rows hash outside their stamped file
    assert validate_bucketed(spark, out, ["o_orderkey"], 4) > 0
    # wrong key column: same
    assert validate_bucketed(spark, out, ["o_custkey"], 8) > 0
    spark.sql("DROP TABLE t_orders_bkt")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="wrong bucket"):
        register_bucketed(spark, "t_orders_bkt", out, ["o_orderkey"], 4, validate=True)
    t = register_bucketed(spark, "t_orders_bkt", out, ["o_orderkey"], 8, validate=True)
    assert t.count() > 0


def test_validate_bucketed_counts_unstamped_files_as_bad(spark, tmp_path):
    """Plain (never-bucketed) parquet pointed at the validator — the exact
    misuse it exists to catch — must count as mismatched, not crash the
    ANSI cast on the empty stamp or null-skip the compare (review r7)."""
    from cdc_lite_spark.operators.layout import validate_bucketed

    out = str(tmp_path / "plain")
    load_table(spark, SF, "orders").write.parquet(out)
    n = load_table(spark, SF, "orders").count()
    assert validate_bucketed(spark, out, ["o_orderkey"], 8) == n
