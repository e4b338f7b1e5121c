"""Bloom-filter join pre-filtering (operators/bloom.py).

The contract: ``bloom_prefilter_join(big, small, k)`` ≡ ``big ⋈ small``
exactly (no false negatives; the exact join removes false positives), and
the pre-filter measurably prunes the big side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter_join,
    might_contain,
)
from cdc_lite_spark.sources.tables import load_table


def test_bloom_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 1)
        .select("c_custkey", "c_name")
    )
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    bloomed = bloom_prefilter_join(orders, cust, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_custkey"
    )
    assert plain.exceptAll(bloomed).count() == 0
    assert bloomed.exceptAll(plain).count() == 0


def test_no_false_negatives_every_member_passes(spark):
    keys = spark.range(0, 500).withColumnRenamed("id", "k")
    bloom = bloom_build(keys, "k")
    passed = (
        keys.crossJoin(F.broadcast(bloom))
        .filter(might_contain(F.col("k")))
        .count()
    )
    assert passed == 500  # a bloom filter NEVER drops a real member


def test_prefilter_actually_prunes(spark):
    """Non-members should mostly fail the filter (FP rate ~1% at this
    geometry) — the point of the operator is shuffle reduction."""
    members = spark.range(0, 1000).withColumnRenamed("id", "k")
    bloom = bloom_build(members, "k")
    strangers = spark.range(1_000_000, 1_020_000).withColumnRenamed("id", "k")
    survivors = (
        strangers.crossJoin(F.broadcast(bloom))
        .filter(might_contain(F.col("k")))
        .count()
    )
    # 20k strangers, m=2^16 bits / k=4 hashes / 1k keys -> expect ~0.2% FPs
    assert survivors < 1000


def test_bloom_build_is_one_tiny_row(spark):
    bloom = bloom_build(spark.range(0, 100).withColumnRenamed("id", "k"), "k")
    rows = bloom.collect()
    assert len(rows) == 1
    words = rows[0]["words"]
    # at most k*n words are touched; the map stays proportional to set bits
    assert 0 < len(words) <= 400


def test_prefilter_codegen_compiles(spark):
    """The r02 regression: a shift-ladder mask nested CASE WHENs
    exponentially, blew the 64 KB JVM method limit, and silently fell back
    to interpreted mode.  With fallback disabled, any codegen compile
    failure becomes a hard error."""
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        big = spark.range(0, 10_000).withColumnRenamed("id", "k")
        small = spark.range(0, 50).withColumnRenamed("id", "k2")
        assert bloom_prefilter_join(big, small, "k", "k2").count() == 50
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
