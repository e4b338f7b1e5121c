"""Deterministic sampling / split operator semantics (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.sampling import dataset_split, hash_sample, stratified_cap


def test_hash_sample_deterministic_and_stable(tables):
    docs = tables["documents"]
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect()}
    assert a == b
    # monotone: a 20% sample contains the 10% sample (bucket prefix property)
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 20).select("doc_id").collect()}
    assert a <= c
    # roughly proportional
    assert 0.03 <= len(a) / docs.count() <= 0.2


def test_stratified_cap_limits_each_stratum(tables):
    docs = tables["documents"]
    capped = stratified_cap(docs, "lang", "doc_id", 7)
    per = {r["lang"]: r["n"] for r in capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(7, full[lang])


def test_dataset_split_partitions_everything_once(tables):
    docs = tables["documents"]
    split = dataset_split(docs, "doc_id")
    assert split.filter(F.col("split").isNull()).count() == 0
    assert split.count() == docs.count()
    by = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by) <= {"train", "val", "test"}
    assert by["train"] > by.get("val", 0) and by["train"] > by.get("test", 0)
    # stability: same key → same split on recompute
    again = dataset_split(docs, "doc_id")
    joined = split.select("doc_id", F.col("split").alias("s1")).join(
        again.select("doc_id", F.col("split").alias("s2")), "doc_id"
    )
    assert joined.filter(F.col("s1") != F.col("s2")).count() == 0


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Near-duplicate documents must land in the same split, whatever
    their individual ids hash to."""
    from cdc_lite_spark.operators.sampling import leakage_safe_split

    dup = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, dup + f" v{i % 2}") for i in range(20)]  # two near-dup groups
    rows += [(100 + i, f"unique doc {i} with its own words entirely w{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(docs).collect()
    by_key: dict[int, set] = {}
    for r in out:
        by_key.setdefault(r["split_key"], set()).add(r["split"])
    # every split_key (cluster or singleton) maps to exactly one split
    assert all(len(s) == 1 for s in by_key.values())
    # the 20 near-dups collapsed to far fewer split keys than docs
    dup_keys = {r["split_key"] for r in out if r["doc_id"] < 100}
    assert len(dup_keys) < 20
    assert len(out) == 30


# --- weighted sampling (Efraimidis-Spirakis) --------------------------------


def test_weighted_sample_is_deterministic_and_excludes_zero_weight(spark):
    from cdc_lite_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 10 if i % 2 else 0) for i in range(200)], "k long, w long"
    )
    a = sorted(r["k"] for r in weighted_sample(df, "k", "w", 20).collect())
    b = sorted(r["k"] for r in weighted_sample(df, "k", "w", 20).collect())
    assert a == b and len(a) == 20
    assert all(k % 2 == 1 for k in a)  # zero-weight rows never sampled


def test_weighted_sample_tracks_weights(spark):
    """Heavy rows (100× weight) must dominate the sample: with 50 heavy and
    950 light rows at 100:1 weights, a k=100 sample should contain nearly
    all heavy rows — far above the 5 expected under uniform sampling."""
    from cdc_lite_spark.operators.sampling import weighted_sample

    rows = [(i, 100 if i < 50 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, w long")
    got = [r["k"] for r in weighted_sample(df, "k", "w", 100).collect()]
    heavy = sum(1 for k in got if k < 50)
    assert heavy >= 35


def test_weighted_sample_stable_under_data_growth(spark):
    """A-ES race keys are per-row, so adding new rows only displaces the
    lowest-ranked survivors — existing rows' keys never change (unlike
    df.sample, whose RNG depends on partition layout)."""
    from cdc_lite_spark.operators.sampling import weighted_sample

    small = spark.createDataFrame([(i, 5) for i in range(100)], "k long, w long")
    grown = spark.createDataFrame([(i, 5) for i in range(130)], "k long, w long")
    a = {r["k"] for r in weighted_sample(small, "k", "w", 10).collect()}
    b = {r["k"] for r in weighted_sample(grown, "k", "w", 10).collect()}
    # the grown sample is drawn from a superset: any churn comes only from
    # new rows winning the race, never from old rows re-rolling
    new_winners = {k for k in b if k >= 100}
    assert b - new_winners <= a
