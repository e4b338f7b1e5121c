"""Dedup operator semantics (SURVEY.md §2j X1/X2) — tested on planted
duplicates, since the synthetic corpus has none."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.dedup import (
    exact_dedup,
    hamming64,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_col,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different words entirely unrelated text here"),
        (5, "spark engine batch stream query plan optimizer join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), ["text"], "doc_id")
    rows = {r["canonical_id"]: r["n_copies"] for r in out.collect()}
    assert rows[1] == 2  # docs 1+2 collapse, min id wins
    assert rows[3] == 1 and rows[4] == 1 and rows[5] == 1
    assert 2 not in rows


def test_minhash_identical_docs_identical_sigs(spark):
    sig = {r["doc_id"]: r["minhash"] for r in minhash_signatures(_docs(spark)).collect()}
    assert sig[1] == sig[2]
    # near-dup shares most minhashes; unrelated shares few
    shared_near = sum(a == b for a, b in zip(sig[1], sig[3]))
    shared_far = sum(a == b for a, b in zip(sig[1], sig[4]))
    assert shared_near > shared_far


def test_lsh_pipeline_finds_near_dups(spark):
    docs = _docs(spark)
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
    verified = jaccard_verify(docs, pairs, threshold=0.5)
    found = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (1, 2) in found  # exact dup certainly caught
    assert all(a < b for a, b in found)
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert jac[(1, 2)] == 1.0


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    # 60 identical docs → one bucket of 60 > max_bucket=50 → dropped
    rows = [(i, "same text everywhere always") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(docs)
    assert lsh_candidate_pairs(sig, max_bucket=50).count() == 0
    assert lsh_candidate_pairs(sig, max_bucket=100).count() == 60 * 59 // 2


def test_simhash_hamming_tracks_similarity(spark):
    df = _docs(spark).select("doc_id", simhash_col("text").alias("sh"))
    sh = {r["doc_id"]: r["sh"] for r in df.collect()}
    assert sh[1] == sh[2]
    near = _docs(spark).select(
        hamming64(F.lit(sh[1]), F.lit(sh[3])).alias("d")
    ).first()["d"]
    far = _docs(spark).select(
        hamming64(F.lit(sh[1]), F.lit(sh[4])).alias("d")
    ).first()["d"]
    assert near < far


def test_dedup_clusters_connected_components(spark):
    """Known graph: {1-2, 2-3} one component, {7-8} another, 9-9 none."""
    from cdc_lite_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 8), (30, 10), (20, 30)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 20: 10, 30: 10}


def test_lsh_pairs_between_never_pairs_corpus_with_itself(spark):
    from cdc_lite_spark.operators.dedup import lsh_pairs_between, minhash_signatures

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, dup),  # corpus
            (2, dup),  # corpus duplicate of 1 — must NOT re-pair old-old
            (3, "totally different words here with no overlap at all"),
            (100, dup),  # incoming batch duplicate of 1 and 2
        ],
        "doc_id long, text string",
    )
    new = docs.filter("doc_id >= 100")
    old = docs.filter("doc_id < 100")
    pairs = lsh_pairs_between(minhash_signatures(new), minhash_signatures(old)).collect()
    got = {(r.id_new, r.id_old) for r in pairs}
    assert got == {(100, 1), (100, 2)}


def test_containment_catches_subset_duplication(spark):
    """A short doc fully quoted inside a long one: low Jaccard (misses the
    0.5 gate) but containment 1.0 — and the contained side is the short
    doc.  This asymmetry is the operator's whole reason to exist."""
    from cdc_lite_spark.operators.dedup import containment_verify, jaccard_verify

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = (
        "filler alpha beta gamma delta epsilon zeta eta theta iota kappa "
        + quote
        + " more filler lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    cont = containment_verify(docs, pairs, threshold=0.6).collect()
    assert len(cont) == 1
    assert cont[0]["containment"] == 1.0
    assert cont[0]["contained_id"] == 1
    jac = jaccard_verify(docs, pairs, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses exactly this case


def test_dedup_clusters_local_and_iterative_paths_agree(spark):
    """The size-gated union-find fast path and the Pregel loop must label
    identically (local_threshold=0 forces the distributed path)."""
    from cdc_lite_spark.operators.dedup import dedup_clusters

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 7)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, local_threshold=0).collect()
    }
    assert local == dist
    assert local[7] == 1 and local[11] == 10 and local[23] == 20
    assert set(local) == {1, 2, 3, 7, 10, 11, 20, 21, 22, 23}


def test_dup_ngram_coverage_planted_duplication(spark):
    """Docs 1+2 are identical → every shingle duplicated (fraction 1.0);
    docs 4+5 share nothing with anything → fraction 0.0."""
    from cdc_lite_spark.operators.dedup import dup_ngram_coverage

    out = {r["doc_id"]: r for r in dup_ngram_coverage(_docs(spark)).collect()}
    assert out[1]["dup_fraction"] == 1.0 and out[2]["dup_fraction"] == 1.0
    assert out[4]["dup_fraction"] == 0.0 and out[5]["dup_fraction"] == 0.0
    # doc 3 shares its prefix shingles with 1/2 but not the final-word ones
    assert 0.0 < out[3]["dup_fraction"] < 1.0
    # n_grams counts DISTINCT shingles per doc
    assert out[1]["n_grams"] == out[1]["n_dup_grams"]


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing's selection guarantee (Schleimer et al. §3): two documents
    sharing a token run of length >= w + n - 1 share at least one selected
    fingerprint."""
    from cdc_lite_spark.operators.dedup import (
        SHINGLE,
        WINNOW_W,
        staged_shingles,
        winnow_fingerprints_col,
    )
    from pyspark.sql import functions as F

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + n - 1
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"nine eight {shared} seven ten eleven twelve"),
        (3, "totally disjoint content with no overlap at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    staged = staged_shingles(docs)
    fp = {
        r["doc_id"]: set(r["fp"])
        for r in staged.select(
            "doc_id", winnow_fingerprints_col(F.col("__sh")).alias("fp")
        ).collect()
    }
    assert WINNOW_W + SHINGLE - 1 == 6
    assert fp[1] & fp[2], "shared run must share a fingerprint"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])


def test_winnowing_summary_density(spark):
    """Expected fingerprint density ~ 2/(w+1); assert the sketch is
    strictly smaller than the full shingle set on real-length docs and the
    checksum only matches for identical selections."""
    from cdc_lite_spark.operators.dedup import winnowing_summary

    rows = [
        (1, " ".join(f"tok{i % 37}" for i in range(200))),
        (2, " ".join(f"tok{i % 37}" for i in range(200))),  # identical
        (3, " ".join(f"word{i % 53}" for i in range(200))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in winnowing_summary(docs).collect()}
    assert out[1]["n_fingerprints"] < out[1]["n_shingles"]
    assert out[1]["fp_checksum"] == out[2]["fp_checksum"]
    assert out[1]["fp_checksum"] != out[3]["fp_checksum"]
    assert 0 < out[1]["density"] < 1


def test_gram_novelty_incremental_matches_semantics(spark):
    """A batch doc identical to corpus content scores novelty 0; wholly
    new text scores 1; updating the state absorbs the batch."""
    from cdc_lite_spark.operators.dedup import (
        batch_gram_novelty,
        gram_frequency_state,
        update_gram_frequencies,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # exact copy of 1
            (11, "totally novel words never seen before"),
            (12, "alpha beta gamma nine ten eleven"),  # partial overlap
        ],
        "doc_id long, text string",
    )
    state = gram_frequency_state(corpus)
    out = {r["doc_id"]: r for r in batch_gram_novelty(batch, state).collect()}
    assert out[10]["novelty"] == 0.0
    assert out[11]["novelty"] == 1.0
    assert 0.0 < out[12]["novelty"] < 1.0

    # folding the batch in makes a re-scored copy fully known
    state2 = update_gram_frequencies(state, batch)
    re_batch = spark.createDataFrame(
        [(20, "totally novel words never seen before")], "doc_id long, text string"
    )
    re_out = batch_gram_novelty(re_batch, state2).collect()[0]
    assert re_out["novelty"] == 0.0

    # state update is count-correct: a gram in both corpus and batch sums
    merged = {r["gram"]: r["doc_freq"] for r in state2.collect()}
    base = {r["gram"]: r["doc_freq"] for r in state.collect()}
    assert all(merged[g] >= base[g] for g in base)


def test_winnow_overlap_detects_shared_passage(spark):
    from cdc_lite_spark.operators.dedup import winnow_overlap_pairs

    passage = " ".join(f"shared{i}" for i in range(30))
    rows = [
        (1, f"{passage} tail one two three"),
        (2, f"intro words here {passage}"),
        (3, " ".join(f"solo{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r for r in winnow_overlap_pairs(docs).collect()}
    assert (1, 2) in out
    assert out[(1, 2)]["overlap"] >= 0.4
    assert all(3 not in pair for pair in out)


def test_dup_span_stats_merges_islands(spark):
    """Planted duplication: docs 1 and 2 share one contiguous passage;
    its overlapping 3-gram covers must merge into ONE span covering
    exactly the shared tokens, and the all-unique doc 3 emits no row."""
    from cdc_lite_spark.operators.dedup import dup_span_stats

    shared = " ".join(f"dup{i}" for i in range(10))  # 10 shared tokens
    rows = [
        (1, f"{shared} u1a u1b u1c u1d u1e"),
        (2, f"v1a v1b v1c v1d v1e {shared}"),
        (3, " ".join(f"solo{i}" for i in range(15))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_stats(docs).collect()}
    assert 3 not in out
    for d in (1, 2):
        assert out[d]["n_tokens"] == 15
        assert out[d]["n_dup_spans"] == 1  # overlapping covers merged
        assert out[d]["dup_tokens"] == 10  # exactly the shared passage
        assert abs(out[d]["dup_token_fraction"] - 10 / 15) < 1e-6


def test_dup_span_stats_separate_islands_stay_separate(spark):
    """Two duplicated passages split by enough unique tokens are TWO
    spans; a single-gap adjacency merges."""
    from cdc_lite_spark.operators.dedup import dup_span_stats

    a = " ".join(f"a{i}" for i in range(5))
    b = " ".join(f"b{i}" for i in range(5))
    rows = [
        (1, f"{a} x0 x1 x2 x3 {b}"),   # 4 unique tokens between passages
        (2, f"{a} other stuff"),
        (3, f"{b} more words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_stats(docs).collect()}
    assert out[1]["n_dup_spans"] == 2
    assert out[1]["dup_tokens"] == 10
