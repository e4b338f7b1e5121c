"""Deduplication operators for LLM-data pipelines (SURVEY.md §2j X1/X2).

Four tiers, in increasing fuzziness:

- exact:        hash-groupBy on the content column
- MinHash+LSH:  shingle → k minhashes → banded buckets → candidate pairs
- SimHash:      per-token hash bit-votes → 32-bit fingerprint, hamming ≤ r
- n-gram Jaccard: exact token-set Jaccard verification on candidate pairs

Scale design (the whole point — corpus >> memory):
- signatures are computed scan-side (one pass, no shuffle, pure codegen);
- candidate generation NEVER compares all pairs: LSH bands shuffle on the
  band hash, so only same-bucket docs meet; bucket sizes are bounded by
  banding probability, and a frequency cap (``max_bucket``) drops
  degenerate hot buckets (e.g. empty docs) instead of letting one bucket
  produce O(n²) pairs;
- verification joins only the candidate pairs (|candidates| << n²).

Every hash is the engine-portable md5-based family so DuckDB oracles
reproduce signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.functions.hashes import portable_hash64, portable_hash64_sql
from cdc_lite_spark.operators.text import tokens, tokens_sql

SHINGLE = 3  # tokens per shingle
DEFAULT_K = 8  # minhash signature length
SIMHASH_BITS = 32

# canonical LSH banding geometry.  The Spark builders AND the DuckDB oracle
# generators (queries.py) must derive from these — independently hardcoded
# literals on either side silently break hash parity (ADVICE r03).
DEFAULT_BANDS = 4
DEFAULT_ROWS_PER_BAND = 2
assert DEFAULT_BANDS * DEFAULT_ROWS_PER_BAND == DEFAULT_K
#: degenerate-bucket cap for within-corpus self-join candidates
DEFAULT_MAX_BUCKET = 50
#: corpus-side occupancy cap for incremental batch-vs-corpus candidates
DEFAULT_MAX_BUCKET_INCR = 200

# universal-hash family for MinHash: h_i(x) = (A_i * base(x) + B_i) mod P.
# base(x) is the portable 60-bit hash computed ONCE per shingle; the k
# family members are cheap affine transforms (the standard construction —
# k independent string hashes would cost k md5 passes for no extra
# independence).  P is the largest prime < 2^31 so products stay in BIGINT
# range identically in Spark and DuckDB.
MINHASH_P = 2_147_483_647
_MINHASH_A = [1_103_515_245, 22_695_477, 134_775_813, 214_013, 69_069, 1_664_525, 48_271, 16_807]
_MINHASH_B = [12_345, 54_321, 1, 2_531_011, 362_437, 1_013_904_223, 7, 49_297]


# --- exact dedup ------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Group identical content; keep the minimum id as the canonical
    representative (deterministic, unlike dropDuplicates' arbitrary row).
    One hash-aggregate shuffle on the content hash."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies")
    )


# --- shingles + MinHash -----------------------------------------------------


#: multiplier for the word-rolling shingle combine (prime, < 2^21 so the
#: per-step product word_hash·A stays < 2^52 — exact BIGINT in both engines)
_ROLL_A = 1_000_003


def word_hashes(text_col: str | Column = "text") -> Column:
    """One portable hash per word, reduced mod P — the md5 pass runs once
    per WORD; shingle hashes are derived arithmetically from these."""
    return F.transform(tokens(text_col), lambda w: portable_hash64(w) % MINHASH_P)


def word_hashes_sql(text_expr: str = "text") -> str:
    toks = tokens_sql(text_expr)
    return f"list_transform({toks}, w -> {portable_hash64_sql('w')} % {MINHASH_P})"


def shingle_hashes(wh: Column, n: int = SHINGLE) -> Column:
    """n-gram shingle hashes via a rolling polynomial over word hashes:
    h(w_i..w_{i+n-1}) = fold(acc·A + h_w mod P, init 0).  One md5 per word
    (in ``word_hashes``) instead of one per n-word shingle STRING — the
    string construction (slice + concat) and the longer md5 inputs made the
    old shingle-string form ~4x slower at sf0.1 (BENCH_NOTES.md round 3).

    ``wh`` MUST reference a MATERIALIZED column (stage ``word_hashes`` in
    a projection first): Spark evaluates interpreted higher-order-function
    children per reference, so an inline word-hash expression here would
    re-run the md5 pass ~n times per shingle (measured 20x slower).

    Short documents (< n words) contribute the fold over ALL words as a
    single shingle; the empty document folds to the init value 0.  Both
    branches reproduce bit-identically in DuckDB (``shingle_hashes_sql``).
    """

    def combine(i: Column) -> Column:
        expr = F.element_at(wh, i)
        for j in range(1, n):
            expr = (expr * _ROLL_A + F.element_at(wh, i + j)) % MINHASH_P
        return expr

    size = F.size(wh)
    make = F.transform(F.sequence(F.lit(1), size - (n - 1)), combine)
    whole = F.array(
        F.aggregate(
            wh, F.lit(0).cast("long"), lambda acc, h: (acc * _ROLL_A + h) % MINHASH_P
        )
    )
    return F.when(size >= n, make).otherwise(whole)


def shingle_hashes_sql(wh_expr: str, n: int = SHINGLE) -> str:
    """DuckDB twin of ``shingle_hashes`` over a word-hash list expression.

    ``list_reduce`` without an init equals the fold-with-init-0 because
    (0·A + h1) mod P = h1; it throws on empty lists, hence the len=0 arm.
    """
    expr = f"({wh_expr})[i]"
    for j in range(1, n):
        expr = f"(({expr}) * {_ROLL_A} + ({wh_expr})[i+{j}]) % {MINHASH_P}"
    make = f"list_transform(range(1, len({wh_expr}) - {n - 2}), i -> {expr})"
    whole = f"[list_reduce({wh_expr}, (acc, h) -> (acc * {_ROLL_A} + h) % {MINHASH_P})]"
    return (
        f"CASE WHEN len({wh_expr}) >= {n} THEN {make} "
        f"WHEN len({wh_expr}) = 0 THEN [CAST(0 AS BIGINT)] "
        f"ELSE {whole} END"
    )


def _affine_min(base_col: Column, i: int) -> Column:
    """min over the base-hash array of h_i(x) = (A_i·x + B_i) mod P."""
    a, b = _MINHASH_A[i], _MINHASH_B[i]
    return F.array_min(
        F.transform(base_col, lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P))
    )


def minhash_sql(text_expr: str = "text", k: int = DEFAULT_K, n: int = SHINGLE) -> str:
    base = shingle_hashes_sql("__wh", n)
    parts = [
        f"list_min(list_transform(__base, x -> ({_MINHASH_A[i]} * x + {_MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(k)
    ]
    arr = "[" + ", ".join(parts) + "]"
    return (
        f"(SELECT {arr} FROM (SELECT {base} AS __base "
        f"FROM (SELECT {word_hashes_sql(text_expr)} AS __wh)))"
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = DEFAULT_K
) -> DataFrame:
    """Staged in three projections: word hashes materialize once per row
    (the only md5 pass), the rolling shingle combine reads them, and the k
    affine families read the combined column.  Without the stages each
    interpreted higher-order expression re-evaluates its children per
    reference (measured 7x slower unstaged affine, 20x unstaged rolling)."""
    staged_wh = df.select(id_col, word_hashes(text_col).alias("__wh"))
    staged = staged_wh.select(
        id_col, shingle_hashes(F.col("__wh")).alias("__base")
    )
    return staged.select(
        id_col,
        F.array(*[_affine_min(F.col("__base"), i) for i in range(k)]).alias("minhash"),
    )


# --- LSH banding → candidate pairs → verified near-dups ----------------------


def _banded(sig: DataFrame, id_col: str, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bucket) rows: one md5 bucket per band from the signature
    slice — the shared front half of self-join and two-sided LSH."""
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("minhash", b * rows_per_band + r + 1).cast(
                                        "string"
                                    )
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded LSH: equal band-slices land in the same bucket; a self-join
    per bucket yields candidate pairs (id_a < id_b, distinct).

    ``max_bucket`` caps degenerate buckets — a bucket of b docs yields
    b(b-1)/2 pairs, so unbounded hot buckets are the scale killer.  Dropped
    buckets are a recall tradeoff, logged by the caller at bench time.
    """
    banded = _banded(sig, id_col, bands, rows_per_band)

    # bucket-size cap via a count window — one shuffle on (band,bucket),
    # no second scan of the signature plan (a counts-join would re-derive it)
    from pyspark.sql import Window as W

    bounded = (
        banded.withColumn("__n", F.count("*").over(W.partitionBy("band", "bucket")))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    a = bounded.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a"))
    b = bounded.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_pairs_between(
    sig_new: DataFrame,
    sig_old: DataFrame,
    id_col: str = "doc_id",
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    max_bucket: int = DEFAULT_MAX_BUCKET_INCR,
) -> DataFrame:
    """Two-sided LSH: candidates only between an incoming batch and the
    existing corpus — the incremental-ingest shape.  At 100 TB you never
    re-pair the corpus against itself (that work is already done); each new
    batch joins bucket-to-bucket against the stored corpus signatures, so
    cost ∝ |batch| x bucket occupancy, independent of corpus size.

    ``max_bucket`` caps the *corpus-side* bucket occupancy (the side that
    grows unboundedly); the batch side is assumed small per tick.  Returns
    (id_new, id_old) distinct pairs.
    """
    new_b = _banded(sig_new, id_col, bands, rows_per_band).withColumnRenamed(
        id_col, "id_new"
    )
    old_b = _banded(sig_old, id_col, bands, rows_per_band).withColumnRenamed(
        id_col, "id_old"
    )
    from pyspark.sql import Window as W

    old_bounded = (
        old_b.withColumn("__n", F.count("*").over(W.partitionBy("band", "bucket")))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    return (
        new_b.join(old_bounded, ["band", "bucket"])
        .select("id_new", "id_old")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-SET Jaccard on candidate pairs only (X2 verification +
    the n-gram-Jaccard dedup tier).  Join cost ∝ |candidates|, not n²."""
    toks = df.select(
        F.col(id_col), F.array_distinct(tokens(text_col)).alias("tok_set")
    )
    j = (
        pairs.join(toks.withColumnsRenamed({id_col: "id_a", "tok_set": "set_a"}), "id_a")
        .join(toks.withColumnsRenamed({id_col: "id_b", "tok_set": "set_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        j.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """Asymmetric near-dup: token-set containment |A∩B| / min(|A|,|B|) on
    candidate pairs only.  Jaccard misses subset duplication — a paragraph
    quoted inside a much longer document scores low Jaccard but ~1.0
    containment — and dedup pipelines drop the *contained* side.  Same
    candidates-only join shape as :func:`jaccard_verify`: cost ∝ |pairs|,
    never n².  Emits which side is contained (the smaller set)."""
    toks = df.select(
        F.col(id_col), F.array_distinct(tokens(text_col)).alias("tok_set")
    )
    j = (
        pairs.join(toks.withColumnsRenamed({id_col: "id_a", "tok_set": "set_a"}), "id_a")
        .join(toks.withColumnsRenamed({id_col: "id_b", "tok_set": "set_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    smaller = F.least(F.size("set_a"), F.size("set_b"))
    cont = F.when(smaller > 0, inter.cast("double") / smaller).otherwise(F.lit(0.0))
    return (
        j.withColumn("containment", F.round(cont, 6))
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            "containment",
            F.when(F.size("set_a") <= F.size("set_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_id"),
        )
    )


# --- SimHash -----------------------------------------------------------------


def simhash_col(text_col: str | Column = "text", bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint: per token, each bit of h(token) votes ±1; the
    fingerprint sets bits with positive tallies.  One array-fold per row —
    no explode, no shuffle (the explode formulation multiplies rows ×bits;
    this stays a scan-side expression)."""
    tok_hashes = F.transform(tokens(text_col), lambda t: portable_hash64(t))
    zero = F.array_repeat(F.lit(0).cast("long"), bits)

    def bit_votes(h: Column) -> Column:
        return F.array(
            *[
                F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
                for i in range(bits)
            ]
        )

    votes = F.aggregate(
        tok_hashes, zero, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v)
    )
    out: Column = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(
            F.element_at(votes, i + 1) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash_sql(text_expr: str = "text", bits: int = SIMHASH_BITS) -> str:
    """DuckDB twin of :func:`simhash_col` (explode-free, same fold shape)."""
    h = portable_hash64_sql("t")
    toks = tokens_sql(text_expr)
    zero = f"list_transform(range(0, {bits}), i -> CAST(0 AS BIGINT))"
    bit_votes = (
        f"list_transform(range(0, {bits}), "
        f"i -> CAST(((({h}) >> i) & 1) * 2 - 1 AS BIGINT))"
    )
    votes = (
        f"list_reduce(list_prepend({zero}, list_transform({toks}, t -> {bit_votes})), "
        f"(acc, tv) -> list_transform(list_zip(acc, tv), p -> p[1] + p[2]))"
    )
    return (
        f"list_sum(list_transform(list_zip({votes}, range(0, {bits})), "
        f"p -> CASE WHEN p[1] > 0 THEN (CAST(1 AS BIGINT) << p[2]) ELSE CAST(0 AS BIGINT) END))"
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Staged SimHash: the vote fold materializes once per row, then the
    bit-assembly projection reads the materialized array (the one-expression
    form re-runs the fold per bit — measured ~10x slower at sf0.1)."""
    # hash each token ONCE (md5 is the dominant cost), then fold cheap bit
    # extractions over the long values
    tok_hashes = F.transform(tokens(text_col), lambda t: portable_hash64(t))
    zero = F.array_repeat(F.lit(0).cast("long"), bits)

    def bit_votes(h: Column) -> Column:
        return F.array(
            *[
                F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
                for i in range(bits)
            ]
        )

    votes = F.aggregate(
        tok_hashes, zero, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v)
    )
    staged = df.select(id_col, votes.alias("__votes"))
    out: Column = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(
            F.element_at("__votes", i + 1) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return staged.select(id_col, out.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two fingerprint longs."""
    return F.bit_count(a.bitwiseXOR(b))


def _edges_union_find(batches):
    """Partition-local union-find with path compression: consumes every
    Arrow batch of its partition's (a, b) edges, emits (doc_id, cluster_id)
    with cluster_id = the component's min node id.  Executor-side — the
    driver never sees a row."""
    import pandas as pd

    parent: dict = {}
    seen: set = set()

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for pdf in batches:
        for a, b in zip(pdf["a"], pdf["b"]):
            seen.add(a)
            seen.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min: smaller id becomes the root, so the root IS
                # the canonical min label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    out = {n: find(n) for n in seen}
    yield pd.DataFrame(
        {"doc_id": list(out.keys()), "cluster_id": list(out.values())}
    )


def dedup_clusters(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iter: int = 20,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every document in a
    component gets ``cluster_id`` = the component's minimum doc id (the
    canonical survivor).  This is the step that turns pairwise dedup output
    into droppable groups.

    Two execution strategies, size-gated like an AQE join pick:

    - ``|pairs| ≤ local_threshold`` (the common case at ANY corpus scale —
      LSH+verify emits orders of magnitude fewer pairs than documents):
      one ``mapInPandas`` pass runs union-find with path compression over
      a single coalesced partition, executor-side.  O(E α(E)) total, ONE
      job, no iteration — replacing 4-6 scheduled rounds over a few
      hundred rows (measured 3.9 s → ~0.3 s at sf0.1's 600 pairs).  This
      is not a driver collect: the edges flow Arrow-batched to one
      executor core, the driver only sees the count.
    - larger pair sets: Pregel-style min-label propagation — each round
      every node takes the min label among itself and its neighbors;
      converged when no label changes (≤ graph diameter rounds,
      ``max_iter`` as a safety bound).  Per round: one join + one
      min-aggregation, labels localCheckpoint-ed so the plan stays flat.
      At 100 TB the label table is |nodes-in-pairs|, so the join
      broadcast-s or co-partitions.  (The two-phase contraction of
      Kiveris et al.'s MapReduce-CC would slot between these tiers;
      2M edges ≈ 30 MB fits one core long before that's needed.)
    """
    from cdc_lite_spark.operators._iterative import free_new_checkpoints, persistent_rdd_ids

    spark = pairs.sparkSession
    before = persistent_rdd_ids(spark)

    # pairs may carry an arbitrarily expensive lineage (e.g. the whole LSH
    # pipeline) — materialize it ONCE, *before* the symmetric union, or both
    # union branches re-run it (observed: edges cost 2× the pair pipeline).
    # persist()+count (CacheManager) rather than localCheckpoint so both
    # union branches substitute the same InMemoryRelation and the cache is
    # releasable the moment the edge table is checkpointed.
    base = pairs.select(F.col(left).alias("a"), F.col(right).alias("b")).persist()
    n_edges = base.count()

    if n_edges <= local_threshold:
        id_type = base.schema[0].dataType.simpleString()
        out_schema = f"doc_id {id_type}, cluster_id {id_type}"
        out = base.coalesce(1).mapInPandas(_edges_union_find, out_schema)
        # sever the result from the cached edge plan before releasing it
        out = out.localCheckpoint(eager=True)
        base.unpersist()
        free_new_checkpoints(spark, before, keep_latest=1)
        return out
    edges = (
        base.unionByName(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    labels = (
        edges.select(F.col("a").alias("node")).distinct().withColumn("lbl", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        prop = edges.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "lbl", F.lit(None).cast("long").alias("own"))
        # the labels branch carries each node's current label in `own`
        # (exactly once per node), so the same aggregation that computes the
        # new label also exposes the old one — no per-iteration change-join
        own = labels.select("node", "lbl", F.col("lbl").alias("own"))
        new_labels = (
            prop.unionByName(own)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"), F.max("own").alias("prev_lbl"))
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("lbl") != F.col("prev_lbl")).count()
        labels = new_labels
        if changed == 0:
            break
    # free every superseded checkpoint and the edge table — only the final
    # labels' blocks survive; anything else would pin executor memory for
    # the rest of the session
    free_new_checkpoints(spark, before, keep_latest=1)
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


# --- corpus n-gram duplication + winnowing fingerprints ----------------------

#: winnowing window size (shingles per window) — Schleimer, Schwamb &
#: Aiken, "Winnowing: Local Algorithms for Document Fingerprinting"
#: (SIGMOD 2003).  Guarantee: any shared run of w+n-1 tokens between two
#: documents shares at least one selected fingerprint.
WINNOW_W = 4


def staged_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE
) -> DataFrame:
    """(id, __sh) with shingle hashes staged through two projections —
    word hashes materialize once (the only md5 pass), the rolling combine
    reads them (see ``shingle_hashes`` for why staging is mandatory)."""
    staged_wh = df.select(id_col, word_hashes(text_col).alias("__wh"))
    return staged_wh.select(id_col, shingle_hashes(F.col("__wh"), n).alias("__sh"))


def staged_shingles_sql(text_expr: str = "text", n: int = SHINGLE) -> str:
    """DuckDB scalar-subquery twin of ``staged_shingles``'s __sh column."""
    return (
        f"(SELECT {shingle_hashes_sql('__wh', n)} "
        f"FROM (SELECT {word_hashes_sql(text_expr)} AS __wh))"
    )


def dup_ngram_coverage(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE
) -> DataFrame:
    """Per-document fraction of n-gram shingles that occur in MORE than one
    document — the corpus-level duplication metric behind suffix-style
    training-data dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022; here over hashed shingles instead of
    a suffix array, which is the shape that distributes).

    Plan: scan-side shingling (no shuffle) → explode per-doc DISTINCT
    shingles → document frequency via a count window on the shingle key →
    per-doc aggregation.  Two shuffles, cost O(total shingles), never
    O(n²) — there is no pairwise comparison anywhere.  The count WINDOW
    (not a groupBy + join back) means the expensive shingle lineage is
    computed exactly once — a self-join would re-run the per-word md5 pass
    on both sides (the same lesson as the LSH bucket cap above).
    """
    from pyspark.sql import Window as W

    grams = staged_shingles(df, id_col, text_col, n).select(
        id_col, F.explode(F.array_distinct("__sh")).alias("gram")
    )
    return (
        grams.withColumn("doc_freq", F.count("*").over(W.partitionBy("gram")))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("doc_freq") > 1).cast("bigint")).alias("n_dup_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "n_dup_grams",
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 6).alias("dup_fraction"),
        )
    )


def winnow_fingerprints_col(sh: Column, w: int = WINNOW_W) -> Column:
    """Winnowing fingerprint selection over a MATERIALIZED shingle-hash
    array column: minimum hash of each w-length sliding window, then
    distinct.  (The value-distinct form of robust winnowing — positions are
    dropped since downstream matching keys on the hash value.)  Documents
    shorter than one window contribute their global minimum."""
    wins = F.transform(
        F.sequence(F.lit(1), F.size(sh) - (w - 1)),
        lambda i: F.array_min(F.slice(sh, i, w)),
    )
    whole = F.array(F.array_min(sh))
    return F.array_distinct(F.when(F.size(sh) >= w, wins).otherwise(whole))


def winnow_fingerprints_sql(sh_expr: str, w: int = WINNOW_W) -> str:
    """DuckDB twin of ``winnow_fingerprints_col`` (list_distinct does not
    promise order, so consumers must only use order-independent reductions
    — counts, sums mod P — which is all the registered query emits)."""
    wins = (
        f"list_transform(range(1, len({sh_expr}) - {w - 2}), "
        f"i -> list_aggregate(({sh_expr})[i:i+{w - 1}], 'min'))"
    )
    whole = f"[list_aggregate({sh_expr}, 'min')]"
    return (
        f"list_distinct(CASE WHEN len({sh_expr}) >= {w} THEN {wins} ELSE {whole} END)"
    )


def winnowing_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE,
    w: int = WINNOW_W,
) -> DataFrame:
    """Per-document winnowing fingerprint summary: selected-count, density
    vs the full shingle set, and an order-independent checksum (sum mod P)
    over the selected hash VALUES so parity checks cover the actual
    fingerprints, not just their count.

    Scan-side only — zero shuffles; the fingerprint set is the ~2/(w+1)
    density sketch a plagiarism/overlap index would shuffle instead of the
    full shingle stream (w=4 → ~60% fewer exchange rows at 100 TB).
    """
    staged = staged_shingles(df, id_col, text_col, n).select(
        id_col,
        F.size("__sh").alias("n_shingles"),
        winnow_fingerprints_col(F.col("__sh"), w).alias("__fp"),
    )
    checksum = F.aggregate(
        F.col("__fp"), F.lit(0).cast("long"), lambda acc, x: (acc + x) % MINHASH_P
    )
    return staged.select(
        id_col,
        "n_shingles",
        F.size("__fp").alias("n_fingerprints"),
        F.round(F.size("__fp") / F.col("n_shingles"), 6).alias("density"),
        checksum.alias("fp_checksum"),
    )


def dup_span_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE
) -> DataFrame:
    """Per-document DUPLICATED SPANS — the merged token ranges covered by
    n-gram shingles that occur more than once in the corpus (any document,
    including elsewhere in the same one).

    `dup_ngram_coverage` reports HOW MUCH of a document is duplicated;
    this reports WHERE — the contiguous islands a Lee-et-al-style exact
    substring dedup (ACL 2022) would actually cut.  A duplicated gram at
    token position p covers [p, p+n-1]; overlapping or adjacent covered
    ranges merge into one span (classic gaps-and-islands: a range opens a
    new island iff it starts past the running max end + 1).

    Returns one row per document that HAS duplicated spans:
    (id, n_tokens, n_dup_spans, dup_tokens, dup_token_fraction).
    Documents with fewer than n tokens are excluded: they have no real
    n-gram (the shared shingle machinery gives them one whole-doc
    pseudo-shingle for totality, which is the right dedup signal for
    `exact_dedup`-style ops but would fabricate an n-token span here).

    Plan: positional shingles scan-side → occurrence count via a count
    window on the gram key (the same single-lineage trick as
    dup_ngram_coverage — no groupBy+join-back, no self-join) → two
    doc-partitioned windows (running max end, island prefix sum) over the
    DUPLICATED positions only → per-span then per-doc aggregation.
    Cost O(total shingles) + O(dup positions); never pairwise.

    Two pushdown guards keep the md5 pass single-evaluation (measured 16x
    at sf0.1 — 52s → 3.3s without them):
    * the short-doc filter tests ``size(tokens(text))`` BEFORE any hashing,
      so the predicate Catalyst pushes to the scan inlines only the cheap
      split — filtering on the later ``n_tokens`` column substitutes the
      whole word-hash transform into the scan-level filter, where the
      rolling combine's three ``element_at(__wh, ·)`` references each
      re-run the full md5 pass per shingle position (O(tokens²) md5);
    * ``posexplode_outer``, not ``posexplode``: InferFiltersFromGenerate
      infers ``size(__sh) > 0 AND isnotnull(__sh)`` for INNER generates on
      attribute children, and predicate pushdown then drags that inferred
      filter through both staging projections with the same inlining blowup.
      The rule skips outer generates, and ``__sh`` here is provably
      non-null and non-empty (n_tokens >= n pins the transform branch,
      which emits n_tokens-n+1 >= 1 elements), so _outer is a no-op
      semantically and pos/gram are never null."""
    from pyspark.sql import Window as W

    staged_wh = df.filter(F.size(tokens(text_col)) >= n).select(
        id_col, word_hashes(text_col).alias("__wh")
    )
    staged = staged_wh.select(
        id_col,
        F.size("__wh").alias("n_tokens"),
        shingle_hashes(F.col("__wh"), n).alias("__sh"),
    )
    grams = staged.select(
        id_col,
        "n_tokens",
        F.posexplode_outer("__sh").alias("pos", "gram"),
    )
    dup = grams.withColumn("occ", F.count("*").over(W.partitionBy("gram"))).filter(
        F.col("occ") > 1
    )
    w_prev = W.partitionBy(id_col).orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.partitionBy(id_col).orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    islands = (
        dup.withColumn("prev_end", F.max(F.col("pos") + (n - 1)).over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end") + 1), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_cum))
    )
    spans = islands.groupBy(id_col, "n_tokens", "island").agg(
        (F.max("pos") - F.min("pos") + n).alias("span_tokens")
    )
    return spans.groupBy(id_col, "n_tokens").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    ).select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "n_dup_spans",
        "dup_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias(
            "dup_token_fraction"
        ),
    )


# --- incremental n-gram novelty (dup-ngram at ingest time) -------------------


def doc_grams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE
) -> DataFrame:
    """(id, gram) rows — one row per DISTINCT shingle per document."""
    return staged_shingles(df, id_col, text_col, n).select(
        id_col, F.explode(F.array_distinct("__sh")).alias("gram")
    )


def gram_frequency_state(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE
) -> DataFrame:
    """Corpus gram-frequency state (gram, doc_freq) — the maintainable
    aggregate behind dup-ngram scoring at ingest.  Built once over the
    historical corpus; thereafter ``update_gram_frequencies`` folds each
    batch in at O(batch) cost."""
    return doc_grams(df, id_col, text_col, n).groupBy("gram").agg(
        F.count("*").alias("doc_freq")
    )


def update_gram_frequencies(
    state: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE,
) -> DataFrame:
    """Fold a new-document batch into the gram-frequency state: shingle the
    BATCH only, aggregate its per-gram doc counts, and merge with a
    full-outer join on the gram key.  Cost ∝ batch, never ∝ corpus —
    identical scale shape to ``incremental.apply_delta``.  (Documents are
    append-only here; retraction would subtract the same way.)"""
    delta = doc_grams(batch, id_col, text_col, n).groupBy("gram").agg(
        F.count("*").alias("__d")
    )
    return (
        state.join(delta, "gram", "full_outer")
        .select(
            "gram",
            (F.coalesce(F.col("doc_freq"), F.lit(0)) + F.coalesce(F.col("__d"), F.lit(0))).alias(
                "doc_freq"
            ),
        )
    )


def batch_gram_novelty(
    batch: DataFrame,
    state: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE,
) -> DataFrame:
    """Score incoming documents against the historical corpus WITHOUT
    rescanning it: per batch document, the fraction of its shingles never
    seen in the corpus state.  novelty 0 ⇒ every n-gram already exists
    (an exact or near copy of historical content); 1 ⇒ entirely new text.

    The join keys on the gram hash.  Spark cannot broadcast the PRESERVED
    side of a left-outer join, so this is a shuffle equi-join: the batch
    grams (small) shuffle fully, and the state side's cost depends on its
    layout — plain parquet reshuffles the state each tick (fine while
    state ≪ corpus), while a state table bucketed by gram
    (``DataFrameWriter.bucketBy``, see tests/test_bucketed.py) co-locates
    the join so each tick moves only the batch side.  Either way the
    O(corpus) text rescan never happens — only gram COUNTS are touched.
    Per-doc rollup is one partial-aggregable exchange.
    """
    grams = doc_grams(batch, id_col, text_col, n)
    seen = F.when(F.col("doc_freq").isNotNull(), 1).otherwise(0)
    return (
        grams.join(state, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(seen).cast("bigint").alias("n_seen"),
        )
        .select(
            id_col,
            "n_grams",
            "n_seen",
            F.round(1 - F.col("n_seen") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = SHINGLE,
    max_sources_per_gram: int = 64,
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how many
    distinct shingles they share — the split-leakage / provenance-overlap
    audit a training-data pipeline runs before declaring sources
    independent.

    Plan: (source, gram) pairs dedup once (one exchange), then a self-join
    keyed on the gram hash.  A gram shared by s sources emits s(s-1)/2
    rows, so ``max_sources_per_gram`` caps ubiquitous grams (stop-phrases)
    exactly like the LSH bucket cap — a gram in EVERY source carries no
    contamination signal but would dominate the join.  Output is
    |sources|² bounded, tiny at any corpus size.
    """
    from pyspark.sql import Window as W

    sg = (
        staged_shingles(df, source_col, text_col, n)
        .select(source_col, F.explode(F.array_distinct("__sh")).alias("gram"))
        .distinct()
    )
    bounded = (
        sg.withColumn("__n", F.count("*").over(W.partitionBy("gram")))
        .filter(F.col("__n") <= max_sources_per_gram)
        .drop("__n")
        # both self-join sides read this — materialize once so the shingle
        # scan + cap window don't run twice (the winnow_overlap lesson)
        .localCheckpoint(eager=True)
    )
    a = bounded.select(F.col("gram"), F.col(source_col).alias("source_a"))
    b = bounded.select(F.col("gram"), F.col(source_col).alias("source_b"))
    return (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_grams"))
    )


#: winnowing overlap: hot-fingerprint cap and pair-score threshold
WINNOW_MAX_FP_DOCS = 50
WINNOW_OVERLAP_THRESHOLD = 0.4


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SHINGLE,
    w: int = WINNOW_W,
    max_fp_docs: int = WINNOW_MAX_FP_DOCS,
    threshold: float = WINNOW_OVERLAP_THRESHOLD,
) -> DataFrame:
    """Document-overlap pairs from shared winnowing fingerprints — the
    MOSS-style plagiarism/overlap detector: score(a,b) = |fp_a ∩ fp_b| /
    min(|fp_a|, |fp_b|) over the ~2/(w+1)-density sketch instead of the
    full shingle sets (the same containment semantics as
    ``containment_verify`` at a fraction of the join volume).

    Scale: fingerprints explode scan-side; ubiquitous fingerprints (shared
    by > ``max_fp_docs`` docs) are dropped by a count window — the same
    hot-key cap as LSH buckets, since a boilerplate fingerprint in f docs
    would emit f² pairs while carrying no overlap signal.  The pair join
    is an equi-join on the fingerprint hash; per-doc sketch sizes join
    back from a |docs|-row aggregate.
    """
    from pyspark.sql import Window as W

    # materialize the sketch ONCE: four plan branches read it (sizes, both
    # self-join sides via the cap window) and the composed lazy plan would
    # re-derive the interpreted winnowing expression in each — measured as
    # a multi-minute blowup at sf0.1 vs <1 s materialized (the same
    # persist-before-reuse lesson as dedup_clusters' edge projection)
    staged = staged_shingles(df, id_col, text_col, n).select(
        id_col, winnow_fingerprints_col(F.col("__sh"), w).alias("__fp")
    ).localCheckpoint(eager=True)
    fps = staged.select(id_col, F.explode("__fp").alias("fp"))
    sizes = staged.select(id_col, F.size("__fp").alias("n_fp"))
    bounded = (
        fps.withColumn("__n", F.count("*").over(W.partitionBy("fp")))
        .filter(F.col("__n") <= max_fp_docs)
        .drop("__n")
    )
    a = bounded.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = bounded.select(F.col("fp"), F.col(id_col).alias("id_b"))
    shared = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_fps"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_fp_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_fps",
            F.round(
                F.col("shared_fps") / F.least("n_fp_a", "n_fp_b"), 6
            ).alias("overlap"),
        )
        .filter(F.col("overlap") >= threshold)
    )
