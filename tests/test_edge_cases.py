"""Degenerate-input robustness: empty tables, null/empty text, singleton
corpora.  Every operator a pipeline composes must return a well-formed
(possibly empty) result — not throw — on the inputs real corpora contain.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_dedup_chain_on_empty_corpus(spark):
    from cdc_lite_spark.operators.dedup import (
        dedup_clusters,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs(spark, [])
    sig = minhash_signatures(docs)
    cands = lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
    pairs = jaccard_verify(docs, cands, threshold=0.5)
    assert dedup_clusters(pairs).count() == 0


def test_dedup_chain_on_null_and_empty_text(spark):
    from cdc_lite_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs(
        spark,
        [
            (1, None, "en", "s", 0),
            (2, "", "en", "s", 0),
            (3, "   ", "en", "s", 3),
            (4, "real text here", "en", "s", 14),
        ],
    )
    sig = minhash_signatures(docs)
    cands = lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
    # must not throw; null/empty docs must not pair with the real one
    verified = jaccard_verify(docs, cands, threshold=0.5).collect()
    assert all({r["id_a"], r["id_b"]} != {1, 4} for r in verified)


def test_text_suite_on_nulls(spark):
    from cdc_lite_spark.operators.text import text_stats, token_counts

    docs = _docs(spark, [(1, None, None, "s", 0), (2, "", "en", "s", 0)])
    got = token_counts(docs).collect()
    assert len(got) == 2  # rows survive, counts are 0/null — no crash
    assert text_stats(docs).count() == 2


def test_checksum_of_empty_table_is_stable(spark):
    from cdc_lite_spark.operators.checksum import table_checksum_value

    empty = _docs(spark, [])
    a = table_checksum_value(empty)
    b = table_checksum_value(_docs(spark, []))
    assert a == b  # deterministic fingerprint for "no rows"


def test_snapshot_diff_empty_vs_nonempty(spark):
    from cdc_lite_spark.operators.diff import snapshot_diff

    prev = _docs(spark, [])
    cur = _docs(spark, [(1, "a", "en", "s", 1)])
    ops = {r["operation"] for r in snapshot_diff(prev, cur, ["doc_id"]).collect()}
    assert ops == {"INSERT"}
    ops2 = {r["operation"] for r in snapshot_diff(cur, prev, ["doc_id"]).collect()}
    assert ops2 == {"DELETE"}


def test_similarity_on_singleton_corpus(spark):
    from cdc_lite_spark.operators.similarity import brute_force_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") == 1)
    got = brute_force_topk(emb, queries, k=5, query_id_col="vec_id").collect()
    assert len(got) == 2  # k larger than corpus: self excluded, rest returned


def test_bloom_on_empty_small_side(spark):
    from cdc_lite_spark.operators.bloom import bloom_prefilter_join

    big = spark.range(0, 100).withColumnRenamed("id", "k")
    small = spark.range(0, 0).withColumnRenamed("id", "k2")
    assert bloom_prefilter_join(big, small, "k", "k2").count() == 0


def test_quota_sample_single_domain(spark):
    from cdc_lite_spark.queries import REGISTRY  # noqa: F401 (registry import side effect)

    docs = _docs(spark, [(i, f"t{i}", "en", "only", 2) for i in range(30)])
    from pyspark.sql import Window as W

    from cdc_lite_spark.functions.hashes import portable_hash64

    h = portable_hash64(F.col("doc_id").cast("string"), seed="quota")
    by_src = W.partitionBy("source")
    n_d = F.count("*").over(by_src)
    quota = F.least(n_d, F.ceil(F.sqrt(n_d.cast("double")) * 4)).cast("bigint")
    rk = F.row_number().over(by_src.orderBy(h.asc(), F.col("doc_id").asc()))
    kept = docs.select("doc_id", rk.alias("rk"), quota.alias("q")).filter(
        F.col("rk") <= F.col("q")
    )
    assert kept.count() == 22  # min(30, ceil(sqrt(30)*4)) = 22
