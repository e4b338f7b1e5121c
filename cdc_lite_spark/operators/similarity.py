"""Vector similarity search over embedding columns (SURVEY.md §2j X3).

Two tiers:

- **brute-force cosine top-k** — the correctness baseline: query set ×
  corpus, dot products via array expressions (JVM-side, codegen).  Cost
  O(|Q|·n); right answer, only viable when |Q| is small or n is bounded.
- **sign-LSH bucketed ANN** — the scale path: hash every vector to a bucket
  from the sign bits of selected dimensions (a random-hyperplane LSH with
  axis-aligned planes — deterministic, engine-portable), then search only
  within the query's bucket.  One shuffle on the bucket key; each bucket is
  n/2^b vectors in expectation, so a 1000-executor cluster searches 100 TB
  of embeddings with per-task working sets that fit in memory.  Recall is
  tunable via ``probe_flips`` (multi-probe: also search buckets at hamming
  distance 1).

Everything is exact double arithmetic in array order, so DuckDB reproduces
results after round(…, 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_DIMS = (0, 8, 16, 24, 32, 40, 48, 56)


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (both engines accumulate left-to-right)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), (acc, x) -> acc + x)"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"


def _sided(df: DataFrame, id_col: str, vec_col: str, side: str) -> DataFrame:
    """Project (id, vec, norm) for one join side — norms are computed ONCE
    per vector here, not per pair (higher-order array functions are
    interpreted, so per-pair norm recomputation triples the hot-path cost)."""
    v = _to_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(f"{side}_id"), v.alias(f"{side}_vec")
    ).withColumn(f"{side}_norm", norm(F.col(f"{side}_vec")))


def _pair_cosine() -> Column:
    return F.round(
        dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm")), 6
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query.  The corpus side never shuffles until the final
    per-query top-k (WindowGroupLimit keeps only k rows per partition
    before the shuffle)."""
    c = _sided(corpus, id_col, vec_col, "n")
    q = _sided(queries, query_id_col, vec_col, "q")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("nbr_id"),
            _pair_cosine().alias("cos_sim"),
        )
    )
    from cdc_lite_spark.operators.topk import top_k_per_group

    return top_k_per_group(scored, ["query_id"], ["cos_sim", "nbr_id"], k=k).select(
        "query_id", "nbr_id", "cos_sim", F.col("rn").cast("long").alias("rank")
    )


def sign_lsh_bucket(
    vec: Column, dims: tuple[int, ...] = DEFAULT_BUCKET_DIMS
) -> Column:
    """Bucket id from sign bits of the selected dimensions — an
    axis-aligned random-hyperplane LSH for cosine similarity (deterministic
    across engines; no runtime randomness, SURVEY.md §7.4)."""
    out: Column = F.lit(0).cast("long")
    for j, d in enumerate(dims):
        # try_element_at: dims beyond the vector length contribute a 0 bit,
        # matching DuckDB's NULL-on-out-of-bounds list indexing
        bit = F.when(
            F.try_element_at(vec, F.lit(d + 1)) >= 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        out = out + bit
    return out


def sign_lsh_bucket_sql(vec_expr: str, dims: tuple[int, ...] = DEFAULT_BUCKET_DIMS) -> str:
    terms = [
        f"CASE WHEN ({vec_expr})[{d + 1}] >= 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j, d in enumerate(dims)
    ]
    return "(" + " + ".join(terms) + ")"


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: tuple[int, ...] = DEFAULT_BUCKET_DIMS,
    probe_flips: int = 0,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by sign-LSH, equi-join
    on the bucket, rank within.  The equi-join replaces the cross join —
    the step that makes 100 TB feasible.

    ``probe_flips`` enables multi-probe: the QUERY side also probes the
    buckets at hamming distance 1 in the first ``probe_flips`` bits
    (1 + probe_flips buckets per query).  Recall rises steeply — each flip
    recovers the neighbors split by one near-zero dimension — while the
    corpus side stays single-bucketed, so cost grows only with |Q|.  A
    (query, corpus) pair can meet in at most one probe bucket (the corpus
    vector has exactly one bucket), so no dedup is needed.  Measured by
    the ``ann_recall_report`` query."""
    c = _sided(corpus, id_col, vec_col, "n").withColumn(
        "bucket", sign_lsh_bucket(F.col("n_vec"), dims)
    )
    q = _sided(queries, query_id_col, vec_col, "q").withColumn(
        "bucket", sign_lsh_bucket(F.col("q_vec"), dims)
    )
    if probe_flips:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j).cast("long"))
                for j in range(probe_flips)
            ],
        )
        q = q.select(
            "q_id", "q_vec", "q_norm", F.explode(probes).alias("bucket")
        )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("nbr_id"),
            _pair_cosine().alias("cos_sim"),
        )
    )
    from cdc_lite_spark.operators.topk import top_k_per_group

    return top_k_per_group(scored, ["query_id"], ["cos_sim", "nbr_id"], k=k).select(
        "query_id", "nbr_id", "cos_sim", F.col("rn").cast("long").alias("rank")
    )


def _centroid_array(
    centroids: DataFrame, centroid_id_col: str, vec_col: str
) -> DataFrame:
    """One-row frame carrying ALL centroids as ``__cents``:
    array<struct<c_id, c_vec, c_norm>> — the broadcastable closed form of
    the (small) centroid set.  collect_list order is nondeterministic, but
    every consumer reduces it with an order-insensitive max."""
    c = _sided(centroids, centroid_id_col, vec_col, "c")
    return c.agg(
        F.collect_list(F.struct("c_id", "c_vec", "c_norm")).alias("__cents")
    )


def _with_centroid(sided: DataFrame, cents: DataFrame, side: str) -> DataFrame:
    """Attach ``centroid_id`` (nearest centroid by cosine, centroid id as
    deterministic tie-break) to a ``_sided`` frame ENTIRELY map-side: the
    one-row centroid array broadcasts, each row reduces it with
    ``array_max`` over ``struct(sim, cid)`` — the same (sim, id) ordering
    as a max_by, with each dot product computed exactly once.  No shuffle,
    no join back on the vector id: at 100 TB this replaces two
    corpus-wide exchanges (assignment agg + id re-join) with zero.
    Rows with no assignable centroid (empty centroid set) drop, matching
    the join semantics this replaces."""
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda x: F.struct(
                F.round(
                    dot(F.col(f"{side}_vec"), x["c_vec"])
                    / (F.col(f"{side}_norm") * x["c_norm"]),
                    6,
                ).alias("sim"),
                x["c_id"].alias("cid"),
            ),
        )
    )
    return (
        sided.join(F.broadcast(cents), F.lit(True), "cross")
        .withColumn("centroid_id", best["cid"])
        .drop("__cents")
        .filter(F.col("centroid_id").isNotNull())
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF list assignment: each vector gets its nearest centroid (max
    cosine, centroid id as deterministic tie-break).  Centroids broadcast
    as a one-row array (they are few); one scan of the corpus, ZERO
    shuffles — the per-row argmax folds the broadcast array map-side, so
    the assignment can be written alongside the vectors and reused by
    every subsequent search."""
    v = _sided(corpus, id_col, vec_col, "v")
    cents = _centroid_array(centroids, centroid_id_col, vec_col)
    return _with_centroid(v, cents, "v").select(
        F.col("v_id").alias(id_col), "centroid_id"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: assign corpus and queries to centroid lists map-side
    (:func:`_with_centroid` — no assignment shuffle, no id re-join), then
    rank only within the query's list (single-probe; recall rises with
    more probes).  The corpus never shuffles: candidates come from the
    broadcast-query equi-join on centroid_id, so the only exchange in the
    whole search is the candidate-sized top-k."""
    cents = _centroid_array(centroids, "centroid_id", vec_col)
    c = _with_centroid(_sided(corpus, id_col, vec_col, "n"), cents, "n")
    q = _with_centroid(_sided(queries, query_id_col, vec_col, "q"), cents, "q")
    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("nbr_id"),
            _pair_cosine().alias("cos_sim"),
        )
    )
    from cdc_lite_spark.operators.topk import top_k_per_group

    return top_k_per_group(scored, ["query_id"], ["cos_sim", "nbr_id"], k=k).select(
        "query_id", "nbr_id", "cos_sim", F.col("rn").cast("long").alias("rank")
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Lloyd iterations refining IVF centroids: assign → elementwise mean
    per cluster → new centroids.  Deterministic (assignment ties break on
    centroid id; means are exact per-dimension averages).

    Scale shape per iteration: one broadcast-assign scan of the corpus +
    one hash aggregation keyed by (centroid, dim) after posexplode.  The
    posexplode multiplies rows by the dimension count, but the aggregate is
    partial-aggregable, so the shuffle carries |clusters|·dims partial rows
    per partition — iterative ML on plain DataFrame primitives, no MLlib.
    Each iteration's centroids are localCheckpoint-ed (they are tiny —
    |clusters| rows): without it the lazy plan re-derives every previous
    iteration from the raw corpus, growing the plan (and the number of
    corpus scans) multiplicatively per iteration.
    """
    from cdc_lite_spark.operators._iterative import free_new_checkpoints, persistent_rdd_ids

    spark = corpus.sparkSession
    before = persistent_rdd_ids(spark)
    current = centroids
    for _ in range(iterations):
        # assignment attaches map-side (no assignment shuffle, no id
        # re-join) — the sided frame already carries the double vector
        cents = _centroid_array(current, centroid_id_col, vec_col)
        attached = _with_centroid(_sided(corpus, id_col, vec_col, "v"), cents, "v")
        per_dim = (
            attached.select("centroid_id", F.posexplode("v_vec").alias("dim", "val"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("mean"))
        )
        current = (
            per_dim.groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("mean")))
                ).alias("dm")
            )
            .select(
                F.col("centroid_id").alias(centroid_id_col),
                F.transform(F.col("dm"), lambda x: x["mean"].cast("float")).alias(vec_col),
            )
        )
        current = current.localCheckpoint(eager=True)
    # release superseded per-iteration checkpoints; keep the final centroids
    free_new_checkpoints(spark, before, keep_latest=1)
    return current


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = DEFAULT_BUCKET_DIMS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join:
    candidates only form inside a bucket (2^|dims| buckets bound pair
    counts), then the exact cosine filters.  Same recall caveat as any
    single-probe LSH — raise by shrinking ``dims`` or multi-probing."""
    v = _sided(corpus, id_col, vec_col, "v").withColumn(
        "bucket", sign_lsh_bucket(F.col("v_vec"), dims)
    )
    a = v.select(
        "bucket",
        F.col("v_id").alias("id_a"),
        F.col("v_vec").alias("vec_a"),
        F.col("v_norm").alias("norm_a"),
    )
    b = v.select(
        "bucket",
        F.col("v_id").alias("id_b"),
        F.col("v_vec").alias("vec_b"),
        F.col("v_norm").alias("norm_b"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def normalize_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding post-processing for training/serving pipelines: the L2 norm
    plus symmetric int8 quantization (per-vector max-abs scale), exploded to
    (vec_id, dim, q8) rows.

    All arithmetic is exact-order double ops (dot/max are order-stable), so
    DuckDB reproduces values bit-identically; rounding to int8 uses
    round-half-away-from-zero in both engines.  Scale shape: pure scan-side
    map, zero shuffle — the 100 TB form writes q8 alongside the vectors.
    """
    v = _to_double(F.col(vec_col))
    maxabs = F.array_max(F.transform(v, F.abs))
    quant = F.when(maxabs == 0, F.transform(v, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(v, lambda x: F.round(F.lit(127.0) * x / maxabs, 0).cast("int"))
    )
    base = df.select(
        F.col(id_col),
        F.round(norm(v), 6).alias("l2_norm"),
        F.round(maxabs, 6).alias("scale_maxabs"),
        quant.alias("__q"),
    )
    return base.select(
        id_col,
        "l2_norm",
        "scale_maxabs",
        F.posexplode("__q").alias("dim", "q8"),
    ).select(id_col, F.col("dim").cast("long").alias("dim"), "q8", "l2_norm", "scale_maxabs")


def normalize_quantize_sql(table: str = "embeddings", dims: int = 64) -> str:
    v = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    maxabs = f"list_max(list_transform({v}, x -> abs(x)))"
    l2 = f"sqrt({dot_sql(v, v)})"
    return f"""
    WITH base AS (
        SELECT vec_id, round({l2}, 6) AS l2_norm, round({maxabs}, 6) AS scale_maxabs,
               CASE WHEN {maxabs} = 0
                    THEN list_transform({v}, x -> 0)
                    ELSE list_transform({v}, x -> CAST(round(127.0 * x / {maxabs}, 0) AS INT))
               END AS q
        FROM {table}
    )
    SELECT vec_id, CAST(d.dim AS BIGINT) AS dim, q[d.dim + 1] AS q8, l2_norm, scale_maxabs
    FROM base CROSS JOIN range({dims}) d(dim)
    """


# --- per-dimension feature stats + semantic dedup ----------------------------


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension moments of the embedding matrix (mean / std / min /
    max) — the statistics whitening, normalization-layer calibration, and
    drift monitoring read.  Components are scaled to fixed-point BIGINT
    before summing so the sums (and the variance terms built from them) are
    exact and order-independent — float sums would differ run-to-run under
    AQE partition reordering, and differ from DuckDB.

    Plan: posexplode multiplies rows by the dimension count, but the
    aggregation is partial-aggregable on a key space of exactly |dims|
    rows — the exchange carries |partitions|·|dims| partial tuples no
    matter how many vectors exist, so 100 TB of embeddings reduces in one
    pass with a constant-size shuffle."""
    v6 = F.round(F.col("val").cast("double") * 1_000_000, 0).cast("bigint")
    n = F.count("*")
    mean = F.sum("v6").cast("double") / (n * 1_000_000.0)
    ex2 = F.sum(F.col("v6") * F.col("v6")).cast("double") / (n * 1_000_000_000_000.0)
    return (
        df.select(F.posexplode(vec_col).alias("dim", "val"))
        .select(F.col("dim").cast("bigint").alias("dim"), v6.alias("v6"))
        .groupBy("dim")
        .agg(
            n.alias("n_vecs"),
            F.round(mean, 6).alias("dim_mean"),
            F.round(F.sqrt(ex2 - mean * mean), 6).alias("dim_std"),
            F.round(F.min("v6").cast("double") / 1_000_000.0, 6).alias("dim_min"),
            F.round(F.max("v6").cast("double") / 1_000_000.0, 6).alias("dim_max"),
        )
    )


def dim_stats_sql(table: str = "embeddings", vec_col: str = "embedding", dims: int = 64) -> str:
    """DuckDB twin of ``dim_stats`` — the identical fixed-point arithmetic,
    term for term, so results are bit-equal after round(…, 6)."""
    return f"""
    WITH e AS (
        SELECT d.dim AS dim,
               CAST(round(CAST({vec_col}[d.dim + 1] AS DOUBLE) * 1000000, 0)
                    AS BIGINT) AS v6
        FROM {table} CROSS JOIN range({dims}) d(dim)
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           count(*) AS n_vecs,
           round(CAST(sum(v6) AS DOUBLE) / (count(*) * 1000000.0), 6) AS dim_mean,
           round(sqrt(CAST(sum(v6 * v6) AS DOUBLE) / (count(*) * 1000000000000.0)
                      - (CAST(sum(v6) AS DOUBLE) / (count(*) * 1000000.0))
                        * (CAST(sum(v6) AS DOUBLE) / (count(*) * 1000000.0))), 6)
               AS dim_std,
           round(CAST(min(v6) AS DOUBLE) / 1000000.0, 6) AS dim_min,
           round(CAST(max(v6) AS DOUBLE) / 1000000.0, 6) AS dim_max
    FROM e GROUP BY dim
    """


def label_centroid_vectors(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Exact per-label mean embedding rebuilt as an array column (fixed-
    point sums → order-independent doubles; array order restored by sorting
    on the dimension index).  |labels| rows — always broadcastable."""
    v6 = F.round(F.col("val").cast("double") * 1_000_000, 0).cast("bigint")
    per_dim = (
        df.select(label_col, F.posexplode(vec_col).alias("dim", "val"))
        .select(label_col, "dim", v6.alias("v6"))
        .groupBy(label_col, "dim")
        .agg((F.sum("v6").cast("double") / (F.count("*") * 1_000_000.0)).alias("mean"))
    )
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct(F.col("dim"), F.col("mean")))).alias("dm"))
        .select(label_col, F.transform("dm", lambda x: x["mean"]).alias("centroid"))
    )


def semdedup_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    threshold: float = 0.25,
) -> DataFrame:
    """Semantic dedup, centroid-proxy variant (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication",
    2023): within each cluster, vectors whose cosine to the cluster
    centroid exceeds ``threshold`` are the cluster's near-identical core —
    keep the single closest representative, prune the rest.  (The paper
    ranks by pairwise sims inside a k-means cluster; sim-to-centroid is the
    O(n·d) proxy that needs no pairwise join at all, which is what makes
    this the 100 TB shape — cost is one broadcast join + one window.)

    ``prune`` marks droppable rows; ranking uses the UNROUNDED similarity
    with the id as tiebreak so the decision is deterministic cross-engine.
    """
    from pyspark.sql import Window as W

    centroids = label_centroid_vectors(df, label_col, vec_col)
    sim = cosine(_to_double(F.col(vec_col)), F.col("centroid"))
    scored = df.join(F.broadcast(centroids), label_col).select(
        id_col, label_col, sim.alias("__sim")
    )
    rn = F.row_number().over(
        W.partitionBy(label_col).orderBy(F.col("__sim").desc(), F.col(id_col))
    )
    return scored.select(
        id_col,
        label_col,
        F.round("__sim", 6).alias("centroid_sim"),
        ((rn > 1) & (F.col("__sim") >= threshold)).alias("prune"),
    )


def semdedup_prune_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    threshold: float = 0.25,
    dims: int = 64,
) -> str:
    """DuckDB twin of ``semdedup_prune`` — identical fixed-point centroids
    and left-to-right cosine accumulation."""
    cos = cosine_sql("v", "centroid")
    return f"""
    WITH e AS (
        SELECT {id_col}, {label_col},
               list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}
    ),
    per_dim AS (
        SELECT {label_col}, d.dim AS dim,
               CAST(sum(CAST(round(CAST({vec_col}[d.dim + 1] AS DOUBLE) * 1000000, 0)
                             AS BIGINT)) AS DOUBLE) / (count(*) * 1000000.0) AS mean
        FROM {table} CROSS JOIN range({dims}) d(dim)
        GROUP BY {label_col}, d.dim
    ),
    cent AS (
        SELECT {label_col}, list(mean ORDER BY dim) AS centroid
        FROM per_dim GROUP BY {label_col}
    ),
    scored AS (
        SELECT {id_col}, e.{label_col} AS {label_col}, {cos} AS sim
        FROM e JOIN cent ON e.{label_col} = cent.{label_col}
    ),
    ranked AS (
        SELECT {id_col}, {label_col}, sim,
               row_number() OVER (PARTITION BY {label_col}
                                  ORDER BY sim DESC, {id_col}) AS rn
        FROM scored
    )
    SELECT {id_col}, {label_col}, round(sim, 6) AS centroid_sim,
           (rn > 1 AND sim >= {threshold}) AS prune
    FROM ranked
    """


# --- product quantization ----------------------------------------------------

PQ_SUBSPACES = 8
PQ_CODEBOOK_K = 16


def pq_codebook(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
) -> DataFrame:
    """(sub, centroid, cv): per-subspace codebook seeded from the first
    ``k`` vectors by id — the deterministic sample initialization; a
    deployment Lloyd-refines each subspace's codebook with
    ``kmeans_refine`` (the iteration machinery already exists) but the
    ENCODING structure below is identical either way.  |codebook| = m·k
    rows — always broadcastable."""
    return (
        df.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).alias("centroid"),
            _to_double(F.col(vec_col)).alias("__v"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        )
        .select(
            "sub",
            "centroid",
            F.slice(
                "__v", (F.col("sub") * (F.size("__v") / m).cast("int") + 1), (F.size("__v") / m).cast("int")
            ).alias("cv"),
        )
    )


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
) -> DataFrame:
    """Product-quantization encoding (Jégou, Douze & Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): each vector
    splits into ``m`` subvectors, each assigned its nearest per-subspace
    codebook centroid — an m-byte code replacing the full vector, the
    memory layout IVF-ADC search reads at billion-vector scale.

    Output: (vec_id, codes[m], quant_error).  Scale shape: the codebook
    (m·k rows) broadcasts; the corpus fans out ×m subvectors scan-side,
    the argmin is a min(struct(dist, centroid)) hash aggregate (no window,
    no sort), and the code assembly is one more |vecs|-keyed aggregate.
    Everything is exact double arithmetic in array order; the error sum
    folds in subspace order so cross-engine parity survives the floats.
    """
    cb = pq_codebook(df, id_col, vec_col, m, k)
    sub_len = (F.size("__v") / m).cast("int")
    subs = df.select(
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        id_col,
        "sub",
        F.slice("__v", F.col("sub") * sub_len + 1, sub_len).alias("sv"),
    )
    d = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        subs.join(F.broadcast(cb), "sub")
        .select(id_col, "sub", F.struct(d.alias("d"), F.col("centroid")).alias("dc"))
        .groupBy(id_col, "sub")
        .agg(F.min("dc").alias("best"))
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("sub"), F.col("best.centroid").alias("c"), F.col("best.d").alias("d")))
    )
    err = F.aggregate(
        F.transform(ordered, lambda s: s["d"]), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        best.groupBy(id_col)
        .agg(
            F.transform(ordered, lambda s: s["c"]).alias("codes"),
            F.round(err, 6).alias("quant_error"),
        )
    )


def pq_encode_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    dims: int = 64,
) -> str:
    """DuckDB twin of ``pq_encode`` — identical slicing, distance folds,
    argmin tie-break, and subspace-ordered error accumulation."""
    d_sub = dims // m
    sqd = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(s.sv, c.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
        "(acc, x) -> acc + x)"
    )
    return f"""
    WITH vd AS (
        SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}
    ),
    subs AS (
        SELECT {id_col}, j.sub AS sub, v[j.sub * {d_sub} + 1 : (j.sub + 1) * {d_sub}] AS sv
        FROM vd CROSS JOIN range({m}) j(sub)
    ),
    cb AS (
        SELECT sub, {id_col} AS centroid, sv AS cv FROM subs WHERE {id_col} < {k}
    ),
    dist AS (
        SELECT s.{id_col} AS {id_col}, s.sub AS sub, c.centroid AS centroid, {sqd} AS d
        FROM subs s JOIN cb c USING (sub)
    ),
    best AS (
        SELECT {id_col}, sub, centroid, d
        FROM dist
        QUALIFY row_number() OVER (PARTITION BY {id_col}, sub ORDER BY d, centroid) = 1
    )
    SELECT {id_col},
           list(CAST(centroid AS BIGINT) ORDER BY sub) AS codes,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d ORDER BY sub)),
                             (acc, x) -> acc + x), 6) AS quant_error
    FROM best GROUP BY {id_col}
    """


def standardize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension standardization (x − μ_d)/σ_d — the whitening-apply
    step that consumes ``dim_stats``: the |dims|-row stats aggregate
    broadcasts back over the corpus and the transform is pure scan-side
    array arithmetic.  One constant-size exchange (the stats), zero corpus
    shuffles.  Output explodes to (vec_id, dim, z) rows with z rounded to
    6 places (the division's float parity boundary, same discipline as
    the cosine family); constant dimensions (σ=0) emit z=0 rather than a
    NaN poisoning downstream aggregates."""
    v6 = F.round(F.col("val").cast("double") * 1_000_000, 0).cast("bigint")
    n = F.count("*")
    mean = F.sum("v6").cast("double") / (n * 1_000_000.0)
    ex2 = F.sum(F.col("v6") * F.col("v6")).cast("double") / (n * 1_000_000_000_000.0)
    stats = (
        df.select(F.posexplode(vec_col).alias("dim", "val"))
        .select(F.col("dim").cast("bigint").alias("dim"), v6.alias("v6"))
        .groupBy("dim")
        .agg(mean.alias("mu"), F.sqrt(ex2 - mean * mean).alias("sigma"))
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "val")
    ).select(id_col, F.col("dim").cast("bigint").alias("dim"), F.col("val").cast("double").alias("x"))
    z = F.when(F.col("sigma") > 0, (F.col("x") - F.col("mu")) / F.col("sigma")).otherwise(
        F.lit(0.0)
    )
    return exploded.join(F.broadcast(stats), "dim").select(
        id_col, "dim", F.round(z, 6).alias("z")
    )


def standardize_sql(
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding", dims: int = 64
) -> str:
    """DuckDB twin of ``standardize`` — identical fixed-point moments and
    division order."""
    return f"""
    WITH e AS (
        SELECT d.dim AS dim,
               CAST(round(CAST({vec_col}[d.dim + 1] AS DOUBLE) * 1000000, 0)
                    AS BIGINT) AS v6
        FROM {table} CROSS JOIN range({dims}) d(dim)
    ),
    stats AS (
        SELECT dim,
               CAST(sum(v6) AS DOUBLE) / (count(*) * 1000000.0) AS mu,
               sqrt(CAST(sum(v6 * v6) AS DOUBLE) / (count(*) * 1000000000000.0)
                    - (CAST(sum(v6) AS DOUBLE) / (count(*) * 1000000.0))
                      * (CAST(sum(v6) AS DOUBLE) / (count(*) * 1000000.0))) AS sigma
        FROM e GROUP BY dim
    ),
    ex AS (
        SELECT {id_col}, d.dim AS dim, CAST({vec_col}[d.dim + 1] AS DOUBLE) AS x
        FROM {table} CROSS JOIN range({dims}) d(dim)
    )
    SELECT {id_col}, CAST(ex.dim AS BIGINT) AS dim,
           round(CASE WHEN sigma > 0 THEN (x - mu) / sigma ELSE 0.0 END, 6) AS z
    FROM ex JOIN stats ON ex.dim = stats.dim
    """


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m: int = PQ_SUBSPACES,
    kk: int = PQ_CODEBOOK_K,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes (Jégou et al. §IV):
    per query, a distance TABLE (m·kk entries — query-subvector vs every
    sub-centroid) replaces all full-vector arithmetic; each corpus vector's
    approximate distance is m table lookups summed in subspace order.

    Scale shape: the distance tables for all queries broadcast
    (|Q|·m·kk rows); the corpus side is its CODES, not its vectors —
    at billion-vector scale the scan reads m bytes per vector instead of
    the embedding column, and the join key (sub, centroid) has m·kk
    distinct values feeding a |Q|·n-row partial-aggregable fold.  No
    full-vector distance is ever computed corpus-side.
    """
    codes = pq_encode(corpus, id_col, vec_col, m, kk).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.struct(
                    j.alias("sub"), F.element_at("codes", j + 1).alias("centroid")
                ),
            )
        ).alias("sc"),
    ).select(id_col, "sc.sub", "sc.centroid")

    cb = pq_codebook(corpus, id_col, vec_col, m, kk)
    sub_len = (F.size("__v") / m).cast("int")
    q_subs = queries.select(
        F.col(query_id_col),
        _to_double(F.col(vec_col)).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        query_id_col,
        "sub",
        F.slice("__v", F.col("sub") * sub_len + 1, sub_len).alias("qv"),
    )
    dt_d = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dtable = q_subs.join(cb, "sub").select(
        query_id_col, "sub", "centroid", dt_d.alias("d")
    )

    ordered = F.array_sort(F.collect_list(F.struct(F.col("sub"), F.col("d"))))
    adc = F.aggregate(
        F.transform(ordered, lambda s: s["d"]), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        codes.join(F.broadcast(dtable), ["sub", "centroid"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.round(adc, 6).alias("adc_dist"))
    )
    from cdc_lite_spark.operators.topk import top_k_per_group

    return top_k_per_group(
        scored, [query_id_col], ["adc_dist", id_col], k=k, descending=False
    ).select(
        query_id_col,
        F.col(id_col).alias("nbr_id"),
        "adc_dist",
        F.col("rn").cast("long").alias("rank"),
    )


def pq_adc_topk_sql(
    table: str = "embeddings",
    n_queries: int = 5,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    kk: int = PQ_CODEBOOK_K,
    dims: int = 64,
) -> str:
    """DuckDB twin of the registered ADC query (queries = first
    ``n_queries`` vectors, like the other ANN twins)."""
    d_sub = dims // m
    sqd_qc = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(q.qv, c.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
        "(acc, x) -> acc + x)"
    )
    sqd_sc = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(s.sv, c.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
        "(acc, x) -> acc + x)"
    )
    return f"""
    WITH vd AS (
        SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}
    ),
    subs AS (
        SELECT {id_col}, j.sub AS sub, v[j.sub * {d_sub} + 1 : (j.sub + 1) * {d_sub}] AS sv
        FROM vd CROSS JOIN range({m}) j(sub)
    ),
    cb AS (
        SELECT sub, {id_col} AS centroid, sv AS cv FROM subs WHERE {id_col} < {kk}
    ),
    codes AS (
        SELECT s.{id_col} AS {id_col}, s.sub AS sub, c.centroid AS centroid
        FROM subs s JOIN cb c USING (sub)
        QUALIFY row_number() OVER (PARTITION BY s.{id_col}, s.sub
                                   ORDER BY {sqd_sc}, c.centroid) = 1
    ),
    dtable AS (
        SELECT q.{id_col} AS query_id, q.sub AS sub, c.centroid AS centroid,
               {sqd_qc} AS d
        FROM (SELECT {id_col}, sub, sv AS qv FROM subs WHERE {id_col} < {n_queries}) q
        JOIN cb c USING (sub)
    ),
    scored AS (
        SELECT query_id, codes.{id_col} AS nbr_id,
               round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                              list(d ORDER BY codes.sub)),
                                 (acc, x) -> acc + x), 6) AS adc_dist
        FROM codes JOIN dtable USING (sub, centroid)
        WHERE codes.{id_col} != query_id
        GROUP BY query_id, codes.{id_col}
    )
    SELECT query_id, nbr_id, adc_dist,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, nbr_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """


def pq_refine_codebook(
    df: DataFrame,
    cb: DataFrame,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
) -> DataFrame:
    """Lloyd refinement of a PQ codebook, all subspaces at once: assign
    every (vector, subspace) to its nearest sub-centroid, then recompute
    each (sub, centroid) as the elementwise mean of its assigned
    subvectors.  Per iteration: one broadcast-assign scan + one
    partial-aggregable mean keyed on (sub, centroid, dim) — |m·k·d_sub|
    output rows, constant in corpus size.  Empty cells keep their previous
    centroid (the standard k-means dead-cell rule).  Per-iteration
    codebooks are localCheckpoint-ed (tiny) and superseded checkpoints
    freed — the ``kmeans_refine`` discipline."""
    from cdc_lite_spark.operators._iterative import (
        free_new_checkpoints,
        persistent_rdd_ids,
    )

    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    sub_len = (F.size("__v") / m).cast("int")
    subs = df.select(
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        id_col, "sub", F.slice("__v", F.col("sub") * sub_len + 1, sub_len).alias("sv")
    )
    d = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    current = cb
    for _ in range(iterations):
        assigned = (
            subs.join(F.broadcast(current), "sub")
            .select(
                id_col,
                "sub",
                "sv",
                F.struct(d.alias("d"), F.col("centroid")).alias("dc"),
            )
            .groupBy(id_col, "sub")
            # sv is constant within the (id, sub) group (one subvector
            # joined against k centroids), so first() is deterministic here
            .agg(F.min("dc").alias("best"), F.first("sv").alias("sv"))
            .select(id_col, "sub", F.col("best.centroid").alias("centroid"), "sv")
        )
        means = (
            assigned.select("sub", "centroid", F.posexplode("sv").alias("dim", "val"))
            .groupBy("sub", "centroid", "dim")
            .agg(F.avg("val").alias("mu"))
            .groupBy("sub", "centroid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("dm"))
            .select(
                "sub", "centroid", F.transform("dm", lambda x: x["mu"]).alias("cv_new")
            )
        )
        current = (
            current.join(means, ["sub", "centroid"], "left")
            .select(
                "sub", "centroid", F.coalesce("cv_new", "cv").alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    free_new_checkpoints(spark, before, keep_latest=1)
    return current


# --- distribution drift -------------------------------------------------------

PSI_BINS = 10
PSI_LO, PSI_HI = -0.5, 0.5
PSI_DRIFT_THRESHOLD = 0.1


def _psi_bin(x: Column, bins: int = PSI_BINS) -> Column:
    """Fixed equal-width bins over [PSI_LO, PSI_HI], outliers clamped into
    the edge bins — fixed breakpoints keep the binning deterministic and
    engine-portable (quantile bins would depend on the data AND the
    engine's quantile algorithm)."""
    raw = F.floor((x - F.lit(PSI_LO)) / F.lit((PSI_HI - PSI_LO) / bins))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def embedding_drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    bins: int = PSI_BINS,
) -> DataFrame:
    """Per-dimension Population Stability Index between a reference and a
    current embedding population — the standard drift monitor for feature
    pipelines (PSI > 0.1 ⇒ investigate, > 0.25 ⇒ drifted; the banking
    scorecard convention).

    PSI_d = Σ_bins (p_b − q_b)·ln(p_b/q_b), with additive (+0.5) smoothing
    so empty bins never divide by zero.  Scale shape: both populations
    reduce to (dim, bin) count tables — |dims|·|bins| rows regardless of
    corpus size, one partial-aggregable exchange each; the PSI fold runs
    over a collected, SORTED bin array so float addition order is fixed
    cross-engine."""

    from pyspark.sql import Window as W

    def binned(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(F.posexplode(vec_col).alias("dim", "val"))
            .select(
                F.col("dim").cast("bigint").alias("dim"),
                _psi_bin(F.col("val").cast("double"), bins).alias("bin"),
            )
            .groupBy("dim", "bin")
            .agg(F.count("*").alias(f"n_{side}"))
        )

    r = binned(ref, "ref")
    c = binned(cur, "cur")
    tot_r = F.sum("n_ref").over(W.partitionBy("dim"))
    tot_c = F.sum("n_cur").over(W.partitionBy("dim"))
    joined = (
        r.join(c, ["dim", "bin"], "full_outer")
        .select(
            "dim",
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .withColumn("tot_ref", tot_r)
        .withColumn("tot_cur", tot_c)
    )
    p = (F.col("t.n_ref") + 0.5) / (F.col("t.tot_ref") + 0.5 * bins)
    q = (F.col("t.n_cur") + 0.5) / (F.col("t.tot_cur") + 0.5 * bins)
    term = (p - q) * F.log(p / q)
    per_bin = joined.alias("t").select("t.dim", "t.bin", term.alias("term"))
    ordered = F.array_sort(F.collect_list(F.struct(F.col("bin"), F.col("term"))))
    psi = F.aggregate(
        F.transform(ordered, lambda s: s["term"]), F.lit(0.0), lambda acc, x: acc + x
    )
    return per_bin.groupBy("dim").agg(
        F.round(psi, 6).alias("psi"),
        (psi > PSI_DRIFT_THRESHOLD).alias("drifted"),
    )


def embedding_drift_psi_sql(
    table: str = "embeddings",
    ref_pred: str = "vec_id % 2 = 0",
    cur_pred: str = "vec_id % 2 = 1",
    vec_col: str = "embedding",
    bins: int = PSI_BINS,
    dims: int = 64,
) -> str:
    """DuckDB twin of the registered drift query."""
    w = (PSI_HI - PSI_LO) / bins
    bin_expr = (
        f"CAST(least(greatest(floor((CAST({vec_col}[d.dim + 1] AS DOUBLE) "
        f"- ({PSI_LO})) / {w}), 0), {bins - 1}) AS INT)"
    )
    return f"""
    WITH ref AS (
        SELECT d.dim AS dim, {bin_expr} AS bin, count(*) AS n_ref
        FROM {table} CROSS JOIN range({dims}) d(dim)
        WHERE {ref_pred} GROUP BY 1, 2
    ),
    cur AS (
        SELECT d.dim AS dim, {bin_expr} AS bin, count(*) AS n_cur
        FROM {table} CROSS JOIN range({dims}) d(dim)
        WHERE {cur_pred} GROUP BY 1, 2
    ),
    joined AS (
        SELECT COALESCE(ref.dim, cur.dim) AS dim, COALESCE(ref.bin, cur.bin) AS bin,
               COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        FROM ref FULL OUTER JOIN cur ON ref.dim = cur.dim AND ref.bin = cur.bin
    ),
    tot AS (
        SELECT dim, bin, n_ref, n_cur,
               sum(n_ref) OVER (PARTITION BY dim) AS tot_ref,
               sum(n_cur) OVER (PARTITION BY dim) AS tot_cur
        FROM joined
    ),
    terms AS (
        SELECT dim, bin,
               ((n_ref + 0.5) / (tot_ref + 0.5 * {bins})
                - (n_cur + 0.5) / (tot_cur + 0.5 * {bins}))
               * ln(((n_ref + 0.5) / (tot_ref + 0.5 * {bins}))
                    / ((n_cur + 0.5) / (tot_cur + 0.5 * {bins}))) AS term
        FROM tot
    ),
    psi AS (
        SELECT dim,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY bin)),
                           (acc, x) -> acc + x) AS psi_raw
        FROM terms GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, round(psi_raw, 6) AS psi,
           psi_raw > {PSI_DRIFT_THRESHOLD} AS drifted
    FROM psi
    """


# --- truncation (Matryoshka-style) recall + embedding-space health ----------

#: prefix widths the truncation study evaluates (full width is the truth)
PREFIX_DIMS = (16, 32)


def prefix_dim_recall(
    df: DataFrame,
    k: int = 5,
    n_queries: int = 5,
    prefix_dims: tuple[int, ...] = PREFIX_DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of exact cosine search over TRUNCATED vectors (first ``d``
    dimensions) against full-width exact search — the dimension-budget
    study behind Matryoshka representations (Kusupati et al., NeurIPS
    2022): how much of the neighborhood structure survives when storage /
    bandwidth keeps only a prefix.  Output: one row per probe query with
    ``recall_d{d}`` per prefix width.

    Scale shape: same as ``ann_recall_report`` — the probe set broadcasts,
    each prefix pass is the production brute-force plan on a narrower
    ``slice`` of the vector (cheaper than full width by d/D), and the
    ground truth is computed once and checkpointed."""
    queries_df = df.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), vec_col
    )
    truth = (
        brute_force_topk(df, queries_df, k=k, id_col=id_col, vec_col=vec_col)
        .select("query_id", "nbr_id")
        .localCheckpoint(eager=True)
    )
    out = truth.alias("t").select("query_id", "nbr_id")
    recalls = []
    for d in prefix_dims:
        sliced = df.select(id_col, F.slice(F.col(vec_col), 1, d).alias(vec_col))
        q_sliced = queries_df.select(
            "query_id", F.slice(F.col(vec_col), 1, d).alias(vec_col)
        )
        approx = brute_force_topk(
            sliced, q_sliced, k=k, id_col=id_col, vec_col=vec_col
        ).select("query_id", F.col("nbr_id").alias(f"__n{d}"))
        out = out.join(
            approx,
            (out.query_id == approx.query_id) & (out.nbr_id == approx[f"__n{d}"]),
            "left",
        ).drop(approx.query_id)
        recalls.append(
            F.round(
                F.sum(F.col(f"__n{d}").isNotNull().cast("int")).cast("double") / k, 6
            ).alias(f"recall_d{d}")
        )
    return out.groupBy("query_id").agg(*recalls)


def prefix_dim_recall_sql(
    table: str = "embeddings",
    k: int = 5,
    n_queries: int = 5,
    prefix_dims: tuple[int, ...] = PREFIX_DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`prefix_dim_recall` — identical slicing,
    cosine rounding, and (cos desc, nbr_id desc) tie-break."""
    cos = cosine_sql("q.v", "c.v")
    ctes = [
        f"""vecs AS (
        SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}
    )""",
        f"q0 AS (SELECT {id_col} AS query_id, v FROM vecs WHERE {id_col} < {n_queries})",
        f"""truth AS (
        SELECT query_id, nbr_id FROM (
            SELECT q.query_id, c.{id_col} AS nbr_id,
                   row_number() OVER (PARTITION BY q.query_id
                                      ORDER BY round({cos}, 6) DESC, c.{id_col} DESC)
                       AS rank
            FROM q0 q CROSS JOIN vecs c WHERE c.{id_col} != q.query_id
        ) WHERE rank <= {k}
    )""",
    ]
    sels = []
    for d in prefix_dims:
        ctes.append(
            f"""t{d} AS (
        SELECT query_id, nbr_id FROM (
            SELECT q.query_id, c.{id_col} AS nbr_id,
                   row_number() OVER (PARTITION BY q.query_id
                                      ORDER BY round({cosine_sql(f"q.v[1:{d}]", f"c.v[1:{d}]")}, 6) DESC,
                                               c.{id_col} DESC) AS rank
            FROM q0 q CROSS JOIN vecs c WHERE c.{id_col} != q.query_id
        ) WHERE rank <= {k}
    )"""
        )
        sels.append(
            f"round(CAST(sum(CASE WHEN x{d}.nbr_id IS NOT NULL THEN 1 ELSE 0 END)"
            f" AS DOUBLE) / {k}, 6) AS recall_d{d}"
        )
    joins = " ".join(
        f"LEFT JOIN t{d} x{d} ON t.query_id = x{d}.query_id AND t.nbr_id = x{d}.nbr_id"
        for d in prefix_dims
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT t.query_id, {', '.join(sels)}
    FROM truth t {joins}
    GROUP BY t.query_id
    """
    )


#: histogram bin count for the pairwise-angle health check
ANGLE_BINS = 20
#: multiplier for the deterministic partner derivation (MINSTD constant)
PAIR_STEP = 48271


def pairwise_angle_histogram(
    df: DataFrame,
    bins: int = ANGLE_BINS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Histogram of cosine similarities over a deterministic sample of
    vector pairs — the embedding-space health check (a distribution piled
    against +1 means collapse/duplication; natural spaces concentrate near
    0 with thin tails).  Pairing: each vector meets the partner at index
    ``(id·48271 + 1) mod n`` — hash-derived, reproducible in SQL, one
    partner per vector so the sample is |corpus|-sized, never quadratic.
    Output: (bin, lo, hi, n_pairs) over ``bins`` equal bins of [-1, 1].

    Scale shape: one self-equi-join on the derived partner id (shuffle
    keyed on the id — co-located if the table is bucketed by it) + one
    tiny hash-agg; norms computed scan-side once per row."""
    n_vecs = df.count()
    a = _sided(df, id_col, vec_col, "q").withColumn(
        "__partner", (F.col("q_id") * PAIR_STEP + 1) % n_vecs
    )
    b = _sided(df, id_col, vec_col, "n")
    cos = _pair_cosine()
    width = 2.0 / bins
    bin_idx = F.least(
        F.lit(bins - 1), F.floor((cos + 1.0) / width).cast("int")
    ).cast("int")
    return (
        a.join(b, a["__partner"] == b["n_id"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select(bin_idx.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "bin",
            F.round(F.lit(-1.0) + F.col("bin") * width, 6).alias("lo"),
            F.round(F.lit(-1.0) + (F.col("bin") + 1) * width, 6).alias("hi"),
            "n_pairs",
        )
    )


def pairwise_angle_histogram_sql(
    table: str = "embeddings",
    bins: int = ANGLE_BINS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    cos = cosine_sql("a.v", "b.v")
    width = 2.0 / bins
    bin_idx = (
        f"CAST(least({bins - 1}, CAST(floor((round({cos}, 6) + 1.0) / {width})"
        f" AS INT)) AS INT)"
    )
    return f"""
    WITH vecs AS (
        SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}
    ),
    n AS (SELECT count(*) AS n_vecs FROM vecs),
    pairs AS (
        SELECT a.{id_col} AS qid, ({bin_idx}) AS bin
        FROM vecs a
        JOIN n ON TRUE
        JOIN vecs b ON b.{id_col} = (a.{id_col} * {PAIR_STEP} + 1) % n.n_vecs
        WHERE a.{id_col} != b.{id_col}
    )
    SELECT bin,
           round(-1.0 + bin * {width}, 6) AS lo,
           round(-1.0 + (bin + 1) * {width}, 6) AS hi,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY bin
    """


# --- RAG-ingest: feature-hash chunk embeddings + sparse cosine top-k --------

#: feature-hash embedding width (the hashing trick, Weinberger et al.
#: ICML 2009) — idx = h mod D, sign from the next hash bit
HASH_EMBED_DIM = 16
RAG_CHUNK_SIZE = 64
RAG_CHUNK_STRIDE = 48
RAG_N_QUERY_DOCS = 3
RAG_TOPK = 5


def chunk_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = RAG_CHUNK_SIZE,
    stride: int = RAG_CHUNK_STRIDE,
) -> DataFrame:
    """Overlapping character chunks: (doc_id, chunk_idx, chunk_text).
    One Generate over a computed index range — scan-side, no shuffle."""
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(text_col) - (size - stride)) / float(stride)).cast("bigint"),
    )
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_idx",
        F.substring(
            F.col(text_col), F.col("chunk_idx").cast("int") * stride + 1, size
        ).alias("chunk_text"),
    )


def feature_hash_embed(
    chunks: DataFrame,
    text_col: str = "chunk_text",
    dim: int = HASH_EMBED_DIM,
) -> DataFrame:
    """SPARSE feature-hash embedding of each chunk: tokens hash to a
    dimension index (h mod dim) with a ±1 sign from the next hash bit, and
    counts accumulate per (chunk, idx) — the hashing-trick text vectorizer,
    INTEGER-exact so both engines produce identical vectors with no model
    call and no float accumulation.  Output is the sparse form
    (doc_id, chunk_idx, idx, val) — what a real sparse retrieval index
    stores; cosine below joins on ``idx``, never materializing dense rows.
    """
    from cdc_lite_spark.functions.hashes import portable_hash64
    from cdc_lite_spark.operators.text import tokens

    # sign bit = the bit just above the index bits — pure integer/bit ops
    # (h/dim in doubles would lose precision above 2^53 and diverge from
    # DuckDB's integer //); requires dim to be a power of two
    assert dim & (dim - 1) == 0, "feature-hash dim must be a power of two"
    h = portable_hash64(F.col("tok"))
    sign = F.when(
        F.shiftright(h, dim.bit_length() - 1).bitwiseAND(F.lit(1)) == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        chunks.select(
            "doc_id", "chunk_idx", F.explode(tokens(text_col)).alias("tok")
        )
        .select("doc_id", "chunk_idx", (h % dim).alias("idx"), sign.alias("s"))
        .groupBy("doc_id", "chunk_idx", "idx")
        .agg(F.sum("s").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )


def rag_chunk_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_query_docs: int = RAG_N_QUERY_DOCS,
    k: int = RAG_TOPK,
) -> DataFrame:
    """The end-to-end RAG-ingest pipeline as one plan: chunk → embed
    (feature hashing stands in for the model call — the plumbing, not the
    weights, is what this engine owns) → sparse cosine top-k of each probe
    chunk against the chunk corpus.

    Scale shape: the embedding is scan-side explode+agg; the similarity
    is a SPARSE join on the dimension index (probe side broadcast —
    query-bounded), so cost is |corpus postings| × |probe density|, never
    |corpus|² and never dense |corpus|×D.  Integer vectors keep the dot
    products exact; only the final cosine divides (rounded 6dp, the
    established cross-engine discipline)."""
    sparse = feature_hash_embed(chunk_docs(df, id_col, text_col))
    norms = sparse.groupBy("doc_id", "chunk_idx").agg(
        F.sum(F.col("val") * F.col("val")).alias("n2")
    )
    qs = sparse.filter(
        (F.col("doc_id") < n_query_docs) & (F.col("chunk_idx") == 0)
    ).select(
        F.col("doc_id").alias("q_doc"), F.col("idx"), F.col("val").alias("q_val")
    )
    q_norms = norms.filter(
        (F.col("doc_id") < n_query_docs) & (F.col("chunk_idx") == 0)
    ).select(F.col("doc_id").alias("q_doc"), F.col("n2").alias("q_n2"))
    dots = (
        sparse.join(F.broadcast(qs), "idx")
        .groupBy("q_doc", "doc_id", "chunk_idx")
        .agg(F.sum(F.col("val") * F.col("q_val")).alias("dot"))
    )
    scored = (
        dots.join(norms, ["doc_id", "chunk_idx"])
        .join(F.broadcast(q_norms), "q_doc")
        .filter(~((F.col("doc_id") == F.col("q_doc")) & (F.col("chunk_idx") == 0)))
        .select(
            "q_doc",
            F.col("doc_id").alias("nbr_doc"),
            F.col("chunk_idx").alias("nbr_chunk"),
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("n2").cast("double")) * F.sqrt(F.col("q_n2").cast("double"))),
                6,
            ).alias("cos_sim"),
        )
    )
    from cdc_lite_spark.operators.topk import top_k_per_group

    return top_k_per_group(
        scored, ["q_doc"], ["cos_sim", "nbr_doc", "nbr_chunk"], k=k
    ).select(
        "q_doc", "nbr_doc", "nbr_chunk", "cos_sim", F.col("rn").cast("long").alias("rank")
    )


def rag_chunk_topk_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n_query_docs: int = RAG_N_QUERY_DOCS,
    k: int = RAG_TOPK,
    dim: int = HASH_EMBED_DIM,
    size: int = RAG_CHUNK_SIZE,
    stride: int = RAG_CHUNK_STRIDE,
) -> str:
    """DuckDB twin of :func:`rag_chunk_topk` — identical chunking, hash
    embedding, sparse dot products, cosine rounding and tie-breaks."""
    from cdc_lite_spark.functions.hashes import portable_hash64_sql
    from cdc_lite_spark.operators.text import tokens_sql

    h = portable_hash64_sql("tok")
    return f"""
    WITH chunks AS (
        SELECT {id_col}, chunk_idx,
               substr({text_expr}, CAST(chunk_idx AS INT) * {stride} + 1, {size})
                   AS chunk_text
        FROM (
            SELECT {id_col}, {text_expr},
                   unnest(range(0, greatest(1,
                       CAST(ceil((length({text_expr}) - {size - stride})
                                 / {stride}.0) AS BIGINT)))) AS chunk_idx
            FROM {table}
        )
    ),
    toks AS (
        SELECT {id_col}, chunk_idx, unnest({tokens_sql('chunk_text')}) AS tok
        FROM chunks
    ),
    hashed AS (
        SELECT {id_col}, chunk_idx, {h} % {dim} AS idx,
               CASE WHEN ({h} // {dim}) % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM toks
    ),
    sparse AS (
        SELECT {id_col}, chunk_idx, idx, CAST(sum(s) AS BIGINT) AS val
        FROM hashed GROUP BY {id_col}, chunk_idx, idx
        HAVING sum(s) != 0
    ),
    norms AS (
        SELECT {id_col}, chunk_idx, sum(val * val) AS n2
        FROM sparse GROUP BY {id_col}, chunk_idx
    ),
    qs AS (
        SELECT {id_col} AS q_doc, idx, val AS q_val FROM sparse
        WHERE {id_col} < {n_query_docs} AND chunk_idx = 0
    ),
    q_norms AS (
        SELECT {id_col} AS q_doc, n2 AS q_n2 FROM norms
        WHERE {id_col} < {n_query_docs} AND chunk_idx = 0
    ),
    dots AS (
        SELECT qs.q_doc, s.{id_col}, s.chunk_idx, sum(s.val * qs.q_val) AS dot
        FROM sparse s JOIN qs USING (idx)
        GROUP BY qs.q_doc, s.{id_col}, s.chunk_idx
    ),
    scored AS (
        SELECT d.q_doc, d.{id_col} AS nbr_doc, d.chunk_idx AS nbr_chunk,
               round(d.dot / (sqrt(CAST(n.n2 AS DOUBLE))
                              * sqrt(CAST(q.q_n2 AS DOUBLE))), 6) AS cos_sim
        FROM dots d
        JOIN norms n ON n.{id_col} = d.{id_col} AND n.chunk_idx = d.chunk_idx
        JOIN q_norms q USING (q_doc)
        WHERE NOT (d.{id_col} = d.q_doc AND d.chunk_idx = 0)
    )
    SELECT q_doc, nbr_doc, nbr_chunk, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY q_doc
                   ORDER BY cos_sim DESC, nbr_doc DESC, nbr_chunk DESC) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """
