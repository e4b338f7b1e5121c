"""Deterministic sampling & dataset-splitting operators.

Training-data pipelines need sampling that is REPRODUCIBLE across runs,
engines, and cluster sizes — ``df.sample()`` is none of those (RNG state
differs per partition layout).  Everything here keys off the engine-portable
content hash (functions/hashes.py): the same row always lands in the same
sample/split, on any engine, at any scale, with no shuffle.

- ``hash_sample``: Bernoulli-style p% sample by key hash (scan-side filter).
- ``stratified_cap``: at most n rows per stratum, hash-ordered (one shuffle
  on the stratum key; WindowGroupLimit prunes partial top-n map-side).
- ``dataset_split``: train/val/test assignment by hash bucket — the
  canonical leakage-safe split (a key can never straddle splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.functions.hashes import portable_hash64, portable_hash64_sql


def _bucket(key: Column, modulus: int) -> Column:
    return portable_hash64(key.cast("string")) % modulus


def hash_sample(df: DataFrame, key_col: str, percent: int, modulus: int = 100) -> DataFrame:
    """Keep rows whose key hashes into the first ``percent`` of ``modulus``
    buckets — deterministic Bernoulli(percent/modulus) sampling."""
    return df.filter(_bucket(F.col(key_col), modulus) < percent)


def hash_sample_sql(key_expr: str, percent: int, modulus: int = 100) -> str:
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"({h} % {modulus}) < {percent}"


def stratified_cap(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, selected by hash order
    (stable under data growth: a row's selection only changes if
    higher-priority rows enter its stratum)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(stratum_col).orderBy(
        _bucket(F.col(key_col), 1_000_000_007), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )


def dataset_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket (weights sum to the modulus).

    Keyed on content/id hash, so the assignment is stable as the dataset
    grows and a given key can never leak across splits.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    modulus = sum(weights.values())
    b = _bucket(F.col(key_col), modulus)
    expr: Column | None = None
    lo = 0
    for name, w in weights.items():
        cond = (b >= lo) & (b < lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += w
    return df.withColumn(out_col, expr)


def dataset_split_sql(key_expr: str, weights: dict[str, int] | None = None) -> str:
    weights = weights or {"train": 80, "val": 10, "test": 10}
    modulus = sum(weights.values())
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)")
    b = f"({h} % {modulus})"
    parts, lo = [], 0
    for name, w in weights.items():
        parts.append(f"WHEN {b} >= {lo} AND {b} < {lo + w} THEN '{name}'")
        lo += w
    return "CASE " + " ".join(parts) + " END"


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, int] | None = None,
    threshold: float = 0.5,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment that near-duplicates cannot straddle: the
    split key is the document's near-dup CLUSTER id (min member id via
    LSH → Jaccard → connected components), falling back to the doc's own
    id for unclustered documents.  Hashing doc ids alone silently leaks —
    two near-identical documents land in train and test with probability
    2·p(1−p) each — which inflates eval scores exactly like direct test
    contamination; keying the hash on the cluster closes it by
    construction.

    Output: (id, split_key, split).  Scale: the cluster map covers only
    CLUSTERED docs (pairs ≪ corpus), joined back left so the common case
    (no duplicate) costs one broadcast-or-shuffle join; the split itself
    is the same stable hash as ``dataset_split``.
    """
    from cdc_lite_spark.operators.dedup import (
        dedup_clusters,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    pairs = jaccard_verify(
        df,
        lsh_candidate_pairs(minhash_signatures(df, id_col=id_col, text_col=text_col), id_col=id_col),
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
    )
    clusters = dedup_clusters(pairs.select("id_a", "id_b"))
    keyed = (
        df.select(id_col)
        .join(clusters.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("split_key"),
        )
    )
    return dataset_split(keyed, "split_key", weights, out_col)


#: modulus for the hash-derived uniform in race-based samplers (A-ES /
#: Gumbel): u = (hash % RACE_M + 0.5) / RACE_M — an exact dyadic rational.
#: The SQL twins and the DSIR sampler derive from this same constant.
RACE_M = 1 << 20


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int, seed: str = "wsamp"
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis A-ES, IPL 2006): each row draws a reproducible uniform u from
    its key hash and races with key ln(u)/w — the top-k rows are a weighted
    sample where selection probability scales with ``weight_col``.

    Determinism: u is an exact dyadic rational built from the portable
    hash, so reruns, engines, and partition layouts all agree.  (ln() is
    the one libm call; engines may differ in its last ulp, which could
    flip an ordering only if two race keys are within ~1e-16 of each other
    — with hash-distinct u values this does not occur in practice, and the
    key tie-break keeps equal race keys deterministic.)

    Scale shape: scan-side expression + global top-k
    (TakeOrderedAndProject — per-partition heads, no full sort, no
    shuffle of the losers).  Rows with non-positive weight are excluded,
    matching "weight 0 ⇒ never sampled".
    """
    u = (
        portable_hash64(F.col(key_col).cast("string"), seed=seed) % RACE_M
        + F.lit(0.5)
    ) / F.lit(float(RACE_M))
    race = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_race", race)
        .orderBy(F.col("_race").desc(), F.col(key_col))
        .limit(k)
        .drop("_race")
    )


def weighted_sample_race_sql(key_expr: str, weight_expr: str, seed: str = "wsamp") -> str:
    """DuckDB expression for the same A-ES race key (for oracle twins)."""
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)", seed=seed)
    return f"ln(({h} % {RACE_M} + 0.5) / {RACE_M}.0) / CAST({weight_expr} AS DOUBLE)"
