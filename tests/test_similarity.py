"""Similarity-search operator semantics (SURVEY.md §2j X3)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_lite_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    cosine,
    embedding_near_dup_pairs,
)


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_expression(spark):
    df = spark.createDataFrame([([1.0, 2.0], [2.0, 3.0])], "a array<double>, b array<double>")
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    expect = (1 * 2 + 2 * 3) / (math.sqrt(5) * math.sqrt(13))
    assert abs(got - expect) < 1e-12


def test_brute_force_topk_ordering(spark):
    vecs = _vecs(spark)
    q = vecs.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(vecs, q, k=4).collect()
    order = [r["nbr_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order[0] == 1          # closest
    assert order[-1] == 3         # opposite direction ranks last
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4]


def test_ann_results_subset_of_exact(tables):
    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {
        (r["query_id"], r["nbr_id"])
        for r in brute_force_topk(emb, q, k=20).collect()
    }
    approx = ann_topk(emb, q, k=5)
    got = approx.collect()
    assert len(got) > 0
    # every ANN hit must be a genuine corpus neighbor of its query with the
    # same cosine the exact path computes (spot integrity, not recall)
    exact_cos = {
        (r["query_id"], r["nbr_id"]): r["cos_sim"]
        for r in brute_force_topk(emb, q, k=10**6).collect()
    }
    for r in got:
        assert exact_cos[(r["query_id"], r["nbr_id"])] == r["cos_sim"]
    _ = exact


def test_near_dup_pairs_symmetric_bounded(spark):
    vecs = _vecs(spark)
    pairs = embedding_near_dup_pairs(vecs, threshold=0.95)
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] > 0.99
    assert all(a < b for a, b in got)
    # opposite vectors are never near-dups
    assert (0, 3) not in got


def test_kmeans_refine_moves_centroids_toward_clusters(spark):
    from cdc_lite_spark.operators.similarity import kmeans_refine

    # two obvious clusters around (1,0) and (0,1)
    rows = [
        (0, [1.0, 0.1]), (1, [0.9, 0.0]), (2, [1.1, -0.1]),
        (3, [0.1, 1.0]), (4, [0.0, 0.9]), (5, [-0.1, 1.1]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "centroid_id long, embedding array<float>"
    )
    refined = {
        r["centroid_id"]: r["embedding"]
        for r in kmeans_refine(corpus, seeds, iterations=2).collect()
    }
    assert len(refined) == 2
    c0, c1 = refined[0], refined[1]
    assert abs(c0[0] - 1.0) < 0.15 and abs(c0[1]) < 0.15      # mean of cluster A
    assert abs(c1[0]) < 0.15 and abs(c1[1] - 1.0) < 0.15      # mean of cluster B


def test_dim_stats_matches_numpy(spark):
    import numpy as np

    from cdc_lite_spark.operators.similarity import dim_stats

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(50, 4)).astype("float32")
    rows = [(i, [float(x) for x in mat[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["dim"]: r for r in dim_stats(df).collect()}
    q = np.round(mat.astype("float64") * 1e6) / 1e6  # the fixed-point grid
    for d in range(4):
        assert out[d]["n_vecs"] == 50
        assert abs(out[d]["dim_mean"] - q[:, d].mean()) < 2e-6
        assert abs(out[d]["dim_std"] - q[:, d].std()) < 2e-6
        assert abs(out[d]["dim_min"] - q[:, d].min()) < 2e-6
        assert abs(out[d]["dim_max"] - q[:, d].max()) < 2e-6


def test_semdedup_keeps_one_representative_per_cluster(spark):
    """Within each label, the pruned set is exactly (rows above threshold)
    minus one kept representative — and the kept one has the max sim."""
    from cdc_lite_spark.operators.similarity import semdedup_prune

    rows = [
        # label 0: three near-identical vectors + one outlier
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.99, 0.01, 0.0, 0.0], 0),
        (3, [0.98, 0.02, 0.0, 0.0], 0),
        (4, [-1.0, 0.5, 0.5, 0.0], 0),
        # label 1: two opposite vectors — neither near the centroid
        (5, [0.0, 1.0, 0.0, 0.0], 1),
        (6, [0.0, -1.0, 0.0, 0.001], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = semdedup_prune(df, threshold=0.9).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    l0 = {r["vec_id"]: r for r in by_label[0]}
    # 1..3 are all >= 0.9 sim to the label-0 centroid; exactly one kept
    core = [r for r in by_label[0] if r["centroid_sim"] >= 0.9]
    assert len(core) == 3
    assert sum(not r["prune"] for r in core) == 1
    kept = next(r for r in core if not r["prune"])
    assert kept["centroid_sim"] == max(r["centroid_sim"] for r in core)
    assert not l0[4]["prune"]  # outlier never pruned
    # label 1: nothing above threshold, nothing pruned
    assert all(not r["prune"] for r in by_label[1])


def test_pq_encode_structure_and_error(spark):
    """Codebook seed vectors must encode to themselves with zero error;
    codes index the per-subspace codebook; errors are non-negative."""
    from cdc_lite_spark.operators.similarity import (
        PQ_CODEBOOK_K,
        PQ_SUBSPACES,
        pq_encode,
    )

    import numpy as np

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(40, 16)).astype("float32")
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in pq_encode(df, m=4, k=8).collect()}
    assert set(out) == set(range(40))
    for i in range(8):  # the seed vectors ARE centroids → zero error
        assert out[i]["quant_error"] == 0.0
        assert out[i]["codes"] == [i, i, i, i]
    for r in out.values():
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])
        assert r["quant_error"] >= 0.0
    # defaults exist and divide the testdata dims
    assert 64 % PQ_SUBSPACES == 0 and PQ_CODEBOOK_K <= 2000


def test_standardize_zero_mean_unit_std(spark):
    import numpy as np

    from cdc_lite_spark.operators.similarity import standardize

    rng = np.random.default_rng(11)
    mat = rng.normal(loc=2.0, scale=3.0, size=(60, 3)).astype("float32")
    rows = [(i, [float(x) for x in mat[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = standardize(df).toPandas()
    for d in range(3):
        z = out[out["dim"] == d]["z"]
        assert abs(z.mean()) < 1e-3
        assert abs(z.std(ddof=0) - 1.0) < 1e-3
    # constant dimension → z = 0, not NaN
    const = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, 2.0])], "vec_id long, embedding array<float>"
    )
    z0 = standardize(const).filter("dim = 0").toPandas()["z"]
    assert (z0 == 0.0).all()


def test_pq_adc_topk_structure(spark):
    """k results per query, ascending approximate distance, deterministic
    tie-break, never the query itself; an exact-duplicate vector is the
    unbeatable rank-1 (ADC distance equals its own code distance)."""
    import numpy as np

    from cdc_lite_spark.operators.similarity import pq_adc_topk

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(40, 16)).astype("float32")
    mat[30] = mat[20]  # planted duplicate
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter("vec_id = 20").selectExpr("vec_id as query_id", "embedding")
    out = pq_adc_topk(df, qs, k=3, m=4, kk=8).orderBy("rank").collect()
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert all(r["nbr_id"] != 20 for r in out)
    dists = [r["adc_dist"] for r in out]
    assert dists == sorted(dists)
    assert out[0]["nbr_id"] == 30  # the duplicate shares the codes exactly


def test_pq_refine_reduces_quantization_error(spark):
    """One Lloyd iteration must not increase total quantization error,
    and typically reduces it on spread data."""
    import numpy as np

    from cdc_lite_spark.operators.similarity import (
        pq_codebook,
        pq_refine_codebook,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(80, 16)).astype("float32")
    rows = [(i, [float(x) for x in mat[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def total_error(cb):
        from cdc_lite_spark.operators.similarity import _to_double

        sub_len = 4
        subs = df.select(
            "vec_id",
            _to_double(F.col("embedding")).alias("__v"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("sub"),
        ).select(
            "vec_id", "sub", F.slice("__v", F.col("sub") * sub_len + 1, sub_len).alias("sv")
        )
        d = F.aggregate(
            F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            subs.join(cb, "sub")
            .select("vec_id", "sub", d.alias("d"))
            .groupBy("vec_id", "sub")
            .agg(F.min("d").alias("md"))
            .agg(F.sum("md"))
            .collect()[0][0]
        )

    cb0 = pq_codebook(df, m=4, k=8)
    e0 = total_error(cb0)
    cb1 = pq_refine_codebook(df, cb0, iterations=1, m=4)
    e1 = total_error(cb1)
    cb2 = pq_refine_codebook(df, cb1, iterations=1, m=4)
    e2 = total_error(cb2)
    assert e1 <= e0 + 1e-9
    assert e2 <= e1 + 1e-9
    assert e1 < e0  # random seeds are far from means: strict improvement


def test_multiprobe_recall_dominates_single_probe(tables):
    """Multi-probe candidates are a superset of single-probe candidates,
    so per-query recall@k can never decrease (a true top-k neighbor in any
    candidate set always survives the top-k cut — fewer than k vectors
    score higher globally)."""
    from cdc_lite_spark.operators.similarity import (
        DEFAULT_BUCKET_DIMS,
        ann_topk,
        brute_force_topk,
    )
    from pyspark.sql import functions as F

    emb = tables["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["nbr_id"])
        for r in brute_force_topk(emb, qs, k=5).collect()
    }
    single = {
        (r["query_id"], r["nbr_id"]) for r in ann_topk(emb, qs, k=5).collect()
    }
    multi = {
        (r["query_id"], r["nbr_id"])
        for r in ann_topk(
            emb, qs, k=5, probe_flips=len(DEFAULT_BUCKET_DIMS)
        ).collect()
    }
    assert len(truth & multi) >= len(truth & single)
    # multi-probe returns at least as many candidates overall
    assert len(multi) >= len(single)


def test_psi_detects_planted_shift(spark):
    """Identical populations → PSI ≈ 0; a mean-shifted dimension → large
    PSI flagged as drifted."""
    import numpy as np

    from cdc_lite_spark.operators.similarity import embedding_drift_psi

    rng = np.random.default_rng(13)
    ref = rng.normal(0, 0.15, size=(300, 4)).astype("float32")
    cur = ref.copy()
    cur[:, 2] += 0.3  # planted drift in dim 2
    mk = lambda m: spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(len(m))],
        "vec_id long, embedding array<float>",
    )
    out = {r["dim"]: r for r in embedding_drift_psi(mk(ref), mk(cur)).collect()}
    assert out[2]["drifted"] and out[2]["psi"] > 0.25
    for d in (0, 1, 3):  # identical populations: smoothing-only noise
        assert not out[d]["drifted"]
        assert out[d]["psi"] < 0.01


def test_prefix_dim_recall_full_width_is_one(spark, tables):
    """Truncating to the full vector width must reproduce the truth set
    exactly (recall 1.0 for every probe); a 1-dim prefix must lose some."""
    from cdc_lite_spark.operators.similarity import prefix_dim_recall

    emb = tables["embeddings"]
    out = prefix_dim_recall(emb, k=3, n_queries=3, prefix_dims=(64, 1)).collect()
    assert len(out) == 3
    for r in out:
        assert r["recall_d64"] == 1.0
        assert 0.0 <= r["recall_d1"] <= 1.0
    assert any(r["recall_d1"] < 1.0 for r in out)


def test_pairwise_angle_histogram_covers_sample(spark, tables):
    """Every sampled pair lands in exactly one bin; bins tile [-1, 1]."""
    from cdc_lite_spark.operators.similarity import pairwise_angle_histogram

    emb = tables["embeddings"]
    n = emb.count()
    out = pairwise_angle_histogram(emb).collect()
    assert sum(r["n_pairs"] for r in out) <= n  # one partner per vector
    assert sum(r["n_pairs"] for r in out) >= n - 1  # minus self-pairs only
    for r in out:
        assert -1.0 <= r["lo"] < r["hi"] <= 1.0
        assert 0 <= r["bin"] < 20


def test_feature_hash_embed_integer_exact_and_deterministic(spark):
    """Hashing-trick vectors: integer counts, sign from the hash bit, a
    repeated token accumulates, two runs identical."""
    from cdc_lite_spark.operators.similarity import chunk_docs, feature_hash_embed

    docs = spark.createDataFrame(
        [(1, "alpha alpha"), (2, "alpha")], "doc_id long, text string"
    )
    sp = feature_hash_embed(chunk_docs(docs))
    a = {(r["doc_id"], r["chunk_idx"], r["idx"]): r["val"] for r in sp.collect()}
    b = {(r["doc_id"], r["chunk_idx"], r["idx"]): r["val"] for r in sp.collect()}
    assert a == b and len(a) > 0
    # a repeated token accumulates: doc1's single dimension holds exactly
    # 2x doc2's, with |sign contribution| = 1 per occurrence
    d1 = {k[2]: v for k, v in a.items() if k[0] == 1}
    d2 = {k[2]: v for k, v in a.items() if k[0] == 2}
    (alpha_idx, alpha_val), = d2.items()
    assert abs(alpha_val) == 1
    assert d1 == {alpha_idx: 2 * alpha_val}


def test_rag_chunk_topk_identical_doc_ranks_first(spark):
    """A doc sharing its full text with a probe doc must surface as that
    probe's top neighbor with cosine 1.0."""
    from cdc_lite_spark.operators.similarity import rag_chunk_topk

    base = "spark rows tables joins windows shuffles aggregates scans " * 2
    docs = spark.createDataFrame(
        [(0, base), (5, base), (6, "utterly different words entirely here")],
        "doc_id long, text string",
    )
    out = [r for r in rag_chunk_topk(docs, n_query_docs=1, k=3).collect()]
    top = next(r for r in out if r["rank"] == 1)
    assert top["q_doc"] == 0 and top["nbr_doc"] == 5
    assert top["cos_sim"] == 1.0
