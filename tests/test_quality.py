"""Corpus-quality operators (operators/quality.py): repetition stats,
boilerplate filtering, contamination, sequence packing — known-answer tests
on handcrafted docs (the registry parity test covers the DuckDB twins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.quality import (
    boilerplate_filter,
    contamination_check,
    pack_sequences,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_stats_known_answer(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a b", "s"),  # 6 tokens: a×3 b×3; bigrams all "a b"/"b a"
            (2, "w x y z", "s"),  # no repetition
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["n_tokens"] == 6
    assert out[1]["top_word_ratio"] == 0.5
    # bigrams of doc1: [a b, b a, a b, b a, a b] → 5 total, 2 distinct
    assert out[1]["dup_bigram_frac"] == 0.6
    assert out[1]["top_bigram_ratio"] == 0.6
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["top_word_ratio"] == 0.25


def test_boilerplate_filter_reasons(spark):
    # long, diverse vocabulary, a sprinkle of stopwords
    long_doc = " ".join(f"w{i}" for i in range(30)) + " the of and is in"
    docs = _docs(
        spark,
        [
            (1, "tiny doc", "s"),
            (2, " ".join(["spam"] * 40), "s"),
            (3, long_doc, "s"),
        ],
    )
    out = {r["doc_id"]: r["verdict"] for r in boilerplate_filter(docs).collect()}
    assert out[1] == "drop:too_short"
    assert out[2] == "drop:repetitive"
    assert out[3] == "keep"


def test_contamination_known_overlap(spark):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta", "s"),  # contains holdout 3-gram
            (2, "one two three four", "s"),  # disjoint
        ],
    )
    holdout = _docs(spark, [(100, "alpha beta gamma zzz", "s")])
    out = {r["doc_id"]: r for r in contamination_check(corpus, holdout, n=3).collect()}
    # doc1 3-grams: {alpha beta gamma, beta gamma delta} → 1 of 2 contaminated
    assert (out[1]["n_grams"], out[1]["n_contaminated"]) == (2, 1)
    assert out[1]["contamination_ratio"] == 0.5
    assert out[2]["n_contaminated"] == 0


def test_contamination_short_docs_yield_zero_grams(spark):
    """r7 review: Spark's sequence(1, 0) steps BACKWARDS (unlike DuckDB's
    empty range), so documents shorter than n tokens crashed element_at
    with an out-of-range index.  Short docs must yield 0 grams / 0.0
    ratio, matching the DuckDB oracle's graceful empty-list path."""
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta", "s"),
            (2, "two words", "s"),  # shorter than n=3
            (3, "one", "s"),  # single token
        ],
    )
    holdout = _docs(spark, [(100, "alpha beta gamma zzz", "s")])
    out = {r["doc_id"]: r for r in contamination_check(corpus, holdout, n=3).collect()}
    assert (out[1]["n_grams"], out[1]["n_contaminated"]) == (2, 1)
    for short_id in (2, 3):
        assert (out[short_id]["n_grams"], out[short_id]["n_contaminated"]) == (0, 0)
        assert out[short_id]["contamination_ratio"] == 0.0


def test_repetition_stats_single_token_doc(spark):
    """Same backwards-sequence clamp for _bigrams (<2 tokens)."""
    docs = _docs(spark, [(1, "solo", "s"), (2, "a b a b", "s")])
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["dup_bigram_frac"] == 0.0
    assert out[2]["n_tokens"] == 4


def test_pack_sequences_budget_invariant(spark, tables):
    packed = pack_sequences(tables["documents"], budget=256)
    batches = packed.groupBy("shard", "batch_id").agg(
        F.sum("n_tokens").alias("batch_tokens"), F.max("n_tokens").alias("max_doc")
    )
    # every batch except possibly the last per shard holds <= budget + one
    # document overshoot (greedy contiguous packing semantics)
    bad = batches.filter(F.col("batch_tokens") > 256 + F.col("max_doc")).count()
    assert bad == 0
    # batch ids are dense from 0 per shard
    firsts = packed.groupBy("shard").agg(F.min("batch_id").alias("b0")).collect()
    assert all(r["b0"] == 0 for r in firsts)
    # deterministic across runs
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, pack_sequences(tables["documents"], budget=256).collect()))
    assert a == b
