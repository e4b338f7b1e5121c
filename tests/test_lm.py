"""Unigram-LM scoring, bigram collocations, shuffle-sharding, robust stats —
semantic unit tests (oracle parity is covered by test_oracle_parity)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_lite_spark.operators.lm import bigram_counts, unigram_logprob


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_common_tokens_score_higher(spark):
    # "the cat" uses frequent corpus tokens; "zyx qwv" are singletons
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows += [(100, "zyx qwv")]
    out = unigram_logprob(_docs(spark, rows)).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].avg_logprob > by_id[100].avg_logprob
    assert by_id[0].n_tokens == 6


def test_unigram_empty_doc_drops_out(spark):
    out = unigram_logprob(_docs(spark, [(1, "a b"), (2, "")])).collect()
    assert {r.doc_id for r in out} == {1}


def test_unigram_sum_is_tokenwise(spark):
    # one-token docs: sum == avg
    out = unigram_logprob(_docs(spark, [(1, "x"), (2, "x")])).collect()
    for r in out:
        assert r.sum_logprob == pytest.approx(r.avg_logprob)
        assert r.n_tokens == 1


def test_bigram_counts_adjacent_pairs_only(spark):
    df = _docs(spark, [(1, "a b c"), (2, "b c")])
    got = {(r.bigram, r.n) for r in bigram_counts(df).collect()}
    assert got == {("a b", 1), ("b c", 2)}


def test_bigram_single_token_doc_contributes_nothing(spark):
    df = _docs(spark, [(1, "solo"), (2, "")])
    assert bigram_counts(df).count() == 0


def test_shuffle_shards_is_deterministic_partition(spark):
    from cdc_lite_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    a = REGISTRY["shuffle_shards"].builder(spark, sf).collect()
    b = REGISTRY["shuffle_shards"].builder(spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every shard's positions are 1..k with no gaps
    from collections import defaultdict

    shards = defaultdict(list)
    for r in a:
        shards[r.shard].append(r.pos_in_shard)
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_percentile_disc_picks_actual_values(spark):
    from cdc_lite_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["percentile_disc_suite"].builder(spark, sf).collect()
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    for r in rows:
        prices = {
            x.o_totalprice
            for x in orders.filter(F.col("o_orderstatus") == r.o_orderstatus)
            .select("o_totalprice")
            .collect()
        }
        assert r.p25_disc in prices and r.p50_disc in prices and r.p75_disc in prices
        assert r.p25_disc <= r.p50_disc <= r.p75_disc


def test_chunk_dedup_flags_shared_chunks_only(spark):
    from cdc_lite_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["chunk_dedup"].builder(spark, sf).collect()
    for r in out:
        assert r.n_docs > 1
        assert r.n_occurrences >= r.n_docs
        assert r.first_doc is not None


def test_label_centroids_shape_and_mean(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    # drive the same arithmetic the registered query uses, on a tiny frame
    v6 = F.round(F.col("val").cast("double") * 1_000_000, 0).cast("bigint")
    got = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .select("label", "dim", v6.alias("v6"))
        .groupBy("label", "dim")
        .agg((F.sum("v6").cast("double") / (F.count("*") * 1_000_000.0)).alias("m"))
        .collect()
    )
    vals = {(r.label, r.dim): r.m for r in got}
    assert vals[(0, 0)] == pytest.approx(2.0)
    assert vals[(0, 1)] == pytest.approx(3.0)
    assert vals[(1, 0)] == pytest.approx(10.0)


# --- DSIR importance resampling ---------------------------------------------


def test_dsir_weights_rank_target_like_docs_highest(spark):
    from cdc_lite_spark.operators.lm import dsir_log_weights

    de = "der hund und die katze laufen durch das haus und der garten"
    en = "the dog and the cat run through the house and the garden here"
    rows = [(i, de + f" w{i}", "de") for i in range(10)] + [
        (100 + i, en + f" w{i}", "en") for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = docs.filter("lang = 'de'")
    w = dsir_log_weights(docs, target)
    ranked = [
        r["doc_id"]
        for r in w.orderBy(w.log_weight.desc(), "doc_id").limit(10).collect()
    ]
    # the ten most target-like docs are exactly the German ones
    assert all(d < 100 for d in ranked)


def test_dsir_sample_is_deterministic_and_skews_to_target(spark):
    from cdc_lite_spark.operators.lm import dsir_sample
    from cdc_lite_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    target = docs.filter("lang = 'de'")
    a = {r["doc_id"] for r in dsir_sample(docs, target, 10).collect()}
    b = {r["doc_id"] for r in dsir_sample(docs, target, 10).collect()}
    assert a == b and len(a) == 10
    # NOTE: the synthetic corpus draws every language's text from the same
    # vocabulary pool (the lang column is a label, not a property of the
    # words), so there is no target signal to skew toward here — selectivity
    # is asserted on constructed bilingual data in the test above; this test
    # pins determinism and k on real table plumbing.


def test_bigram_logprob_hand_computed(spark):
    """Two-doc toy corpus, add-one smoothed conditionals checked by hand."""
    import math

    from cdc_lite_spark.operators.lm import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # pair counts: (a,b)=3  (b,a)=1  (b,c)=1 ; ctx: a=3, b=2 ; V=3
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    lp_ab = round(math.log((3 + 1) / (3 + 3)), 6)
    lp_ba = round(math.log((1 + 1) / (2 + 3)), 6)
    lp_bc = round(math.log((1 + 1) / (2 + 3)), 6)
    exp1 = (lp_ab + lp_ba + lp_ab) / 3
    exp2 = (lp_ab + lp_bc) / 2
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 2
    assert abs(out[1]["avg_logprob"] - exp1) < 1e-9
    assert abs(out[2]["avg_logprob"] - exp2) < 1e-9
    assert abs(out[1]["perplexity"] - round(math.exp(-exp1), 6)) < 1e-9


def test_bigram_logprob_short_docs_drop(spark):
    from cdc_lite_spark.operators.lm import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, "a a")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in bigram_logprob(docs).collect()}
    assert got == {3}  # <2 tokens -> no bigrams -> dropped
