"""Corpus-quality operators for LLM training-data pipelines (SURVEY.md §2j).

Extends the X4 text-analysis suite with the filters a pretraining corpus
actually runs (the reference has no counterpart — these are the
brief-mandated training-pipeline extensions):

- **Repetition statistics** (Gopher-style quality rules, Rae et al. 2021
  §A1.1 adapted to line-less documents): top-word ratio, duplicate-bigram
  fraction, top-bigram ratio per document.
- **Boilerplate / quality filtering**: rule-based keep/drop verdicts with
  a reason code, composed from repetition + stopword signals.
- **N-gram contamination check** (benchmark-decontamination): fraction of a
  document's distinct 5-grams that collide with a held-out set's 5-grams.
- **Sequence packing**: greedy contiguous packing of documents into
  fixed-token-budget training batches via a running token sum per shard.

Scale shapes:

- repetition/boilerplate: explode to (doc, gram) then two hash
  aggregations — partial-aggregable, shuffle carries distinct grams per
  doc, never raw text; at 100 TB this is the standard map-side-combine
  word-count shape.
- contamination: the holdout gram set is tiny by construction (it is the
  benchmark suite) — broadcast semi-join, corpus never shuffles.
- packing: one window sum partitioned by shard (``source``) — each shard
  packs independently, so no global ordering bottleneck; the per-shard
  sort is the only cost.

Every operator has a DuckDB SQL twin built from the same constants
(functions/hashes.py discipline) so the driver oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.operators.text import STOPWORDS, tokens, tokens_sql

#: sequence-packing token budget per training batch
PACK_BUDGET = 512

#: contamination n-gram order
CONTAM_N = 5

#: boilerplate rule thresholds (shared by Spark and SQL twins)
MIN_TOKENS = 20
MAX_TOP_WORD_RATIO = 0.125
MIN_STOPWORD_RATIO = 0.01


def _bigrams(toks: Column) -> Column:
    """Adjacent-pair bigram array (1-based element_at == DuckDB list index).

    Short-doc clamp: Spark's ``sequence(start, stop)`` steps BACKWARDS when
    start > stop (``sequence(1, 0)`` -> ``[1, 0]``), unlike DuckDB's empty
    ``range`` — without the guard a <2-token document generates descending
    indices and ``element_at`` throws.  A NULL token array still propagates
    NULL (the ``< 2`` predicate is NULL, matching both engines)."""
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )


def _bigrams_sql(toks: str) -> str:
    return f"list_transform(range(1, len({toks})), i -> {toks}[i] || ' ' || {toks}[i+1])"


def _ngrams(toks: Column, n: int) -> Column:
    # same short-doc clamp as _bigrams: a <n-token doc must yield [] (as
    # DuckDB's range does), not a backwards sequence that crashes element_at
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def _ngrams_sql(toks: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len({toks}) - {n - 2}), i -> {parts})"


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition measures: ``top_word_ratio`` (most frequent
    word / tokens), ``dup_bigram_frac`` (fraction of bigram occurrences
    beyond first sight), ``top_bigram_ratio``.  High values flag the
    degenerate repeated-text documents Gopher's rules drop."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("t"))

    words = base.select(id_col, F.explode("t").alias("w"))
    wstat = (
        words.groupBy(id_col, "w")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_tokens"),
            F.max("count").alias("top_word_n"),
            F.count("*").alias("n_distinct_words"),
        )
    )
    bigrams = base.select(id_col, F.explode(_bigrams(F.col("t"))).alias("g"))
    bstat = (
        bigrams.groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_bigrams"),
            F.max("count").alias("top_bigram_n"),
            F.count("*").alias("n_distinct_bigrams"),
        )
    )
    out = wstat.join(bstat, id_col, "left")
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return out.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        r6(F.col("top_word_n").cast("double") / F.col("n_tokens")).alias("top_word_ratio"),
        r6(
            F.coalesce(
                (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
                / F.col("n_bigrams"),
                F.lit(0.0),
            )
        ).alias("dup_bigram_frac"),
        r6(
            F.coalesce(
                F.col("top_bigram_n").cast("double") / F.col("n_bigrams"), F.lit(0.0)
            )
        ).alias("top_bigram_ratio"),
    )


def repetition_stats_sql(table: str = "documents", text_expr: str = "text") -> str:
    toks = tokens_sql(text_expr)
    return f"""
    WITH base AS (SELECT doc_id, {toks} AS t FROM {table}),
    wc AS (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS w FROM base) GROUP BY doc_id, w
    ),
    wstat AS (
        SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_word_n FROM wc GROUP BY doc_id
    ),
    bc AS (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest({_bigrams_sql('t')}) AS g FROM base) GROUP BY doc_id, g
    ),
    bstat AS (
        SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_n,
               count(*) AS n_distinct_bigrams
        FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(w.n_tokens AS BIGINT) AS n_tokens,
           round(CAST(w.top_word_n AS DOUBLE) / w.n_tokens, 6) AS top_word_ratio,
           round(COALESCE(CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE)
                          / b.n_bigrams, 0.0), 6) AS dup_bigram_frac,
           round(COALESCE(CAST(b.top_bigram_n AS DOUBLE) / b.n_bigrams, 0.0), 6)
               AS top_bigram_ratio
    FROM wstat w LEFT JOIN bstat b USING (doc_id)
    """


def boilerplate_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rule-based corpus filter: keep/drop verdict + reason per document.
    First matching rule wins (fixed order → deterministic)."""
    toks = tokens(text_col)
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stats = repetition_stats(df, text_col=text_col, id_col=id_col)
    enriched = df.select(
        F.col(id_col),
        n_toks.alias("__nt"),
        F.when(n_toks > 0, n_stop.cast("double") / n_toks).otherwise(F.lit(0.0)).alias("__sr"),
    ).join(stats, id_col)
    verdict = (
        F.when(F.col("__nt") < MIN_TOKENS, F.lit("drop:too_short"))
        .when(F.col("top_word_ratio") > MAX_TOP_WORD_RATIO, F.lit("drop:repetitive"))
        .when(F.col("__sr") < MIN_STOPWORD_RATIO, F.lit("drop:no_stopwords"))
        .otherwise(F.lit("keep"))
    )
    return enriched.select(id_col, F.col("__nt").cast("long").alias("n_tokens"), verdict.alias("verdict"))


def boilerplate_filter_sql(table: str = "documents", text_expr: str = "text") -> str:
    toks = tokens_sql(text_expr)
    stop_arr = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    rep = repetition_stats_sql(table, text_expr)
    return f"""
    WITH rep AS ({rep}),
    feats AS (
        SELECT doc_id, len({toks}) AS nt,
               CASE WHEN len({toks}) > 0
                    THEN CAST(len(list_filter({toks}, x -> list_contains({stop_arr}, x)))
                         AS DOUBLE) / len({toks})
                    ELSE 0.0 END AS sr
        FROM {table}
    )
    SELECT f.doc_id, CAST(f.nt AS BIGINT) AS n_tokens,
           CASE WHEN f.nt < {MIN_TOKENS} THEN 'drop:too_short'
                WHEN r.top_word_ratio > {MAX_TOP_WORD_RATIO} THEN 'drop:repetitive'
                WHEN f.sr < {MIN_STOPWORD_RATIO} THEN 'drop:no_stopwords'
                ELSE 'keep' END AS verdict
    FROM feats f JOIN rep r USING (doc_id)
    """


def contamination_check(
    corpus: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = CONTAM_N,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the fraction of its
    distinct ``n``-grams that appear anywhere in the holdout (benchmark)
    set.  The holdout gram set is broadcast — the corpus never shuffles.

    Precondition: one corpus row per ``id_col`` (a document id).  Gram
    dedup is per-row (``array_distinct``); if the same id appeared on two
    rows their shared grams would be double-counted, where a cross-row
    ``dropDuplicates([id, gram])`` would shuffle the full gram stream —
    the exact cost this operator exists to avoid."""
    # materialize the token array behind a projection boundary FIRST: the
    # n-gram lambda does n element_at calls per gram, and inlining the
    # split/filter expression there re-tokenizes the document once per
    # element_at (observed 5x on the r02 bench)
    # per-doc gram dedup happens INSIDE the array (array_distinct) before
    # the explode: with one row per doc_id (see docstring precondition)
    # every gram of a doc lives in that row, so this equals
    # dropDuplicates([id, g]) with zero shuffle — the exploded stream then
    # hits the broadcast join
    # and collapses map-side in the final partial aggregation, so the only
    # shuffle in the whole plan is |docs| partial rows (r7: the previous
    # dropDuplicates shuffled the full gram stream, the one above-baseline
    # query left on the r6 bench)
    corp_grams = corpus.select(F.col(id_col), tokens(text_col).alias("__t")).select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(_ngrams(F.col("__t"), n))).alias("g"),
    )
    hold_grams = (
        holdout.select(tokens(text_col).alias("__t"))
        .select(F.explode(_ngrams(F.col("__t"), n)).alias("g"))
        .distinct()
    )
    hit = corp_grams.join(
        F.broadcast(hold_grams.withColumn("__hit", F.lit(1))), "g", "left"
    )
    return hit.groupBy(id_col).agg(
        F.count("g").cast("long").alias("n_grams"),
        F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_contaminated"),
        F.round(
            F.coalesce(
                # try_divide: a 0-gram (shorter-than-n) doc divides by zero,
                # which ANSI mode turns into a query-killing error
                F.try_divide(
                    F.sum(F.coalesce("__hit", F.lit(0))).cast("double"),
                    F.count("g"),
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("contamination_ratio"),
    )


def contamination_check_sql(
    corpus_pred: str, holdout_pred: str, table: str = "documents", n: int = CONTAM_N
) -> str:
    toks = tokens_sql("text")
    grams = _ngrams_sql("t", n)
    return f"""
    WITH corp AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, unnest({grams}) AS g
            FROM (SELECT doc_id, {toks} AS t FROM {table} WHERE {corpus_pred})
        )
    ),
    hold AS (
        SELECT DISTINCT g FROM (
            SELECT unnest({grams}) AS g
            FROM (SELECT {toks} AS t FROM {table} WHERE {holdout_pred})
        )
    ),
    base AS (SELECT doc_id FROM {table} WHERE {corpus_pred})
    SELECT b.doc_id,
           CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(s.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           round(COALESCE(s.ratio, 0.0), 6) AS contamination_ratio
    FROM base b LEFT JOIN (
        SELECT c.doc_id, count(*) AS n_grams,
               sum(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated,
               CAST(sum(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS ratio
        FROM corp c LEFT JOIN hold h USING (g) GROUP BY c.doc_id
    ) s USING (doc_id)
    """


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """Greedy contiguous sequence packing: within each shard, documents (in
    ``id_col`` order) accumulate a running token sum; ``batch_id`` is the
    bucket of each document's STARTING offset, so the first document is
    always batch 0 and a document overflowing the budget overshoots its own
    batch rather than opening a later one (hypothesis-found edge: the
    endpoint-bucket formula left batch 0 empty when doc 1 exceeded the
    budget).  Deterministic, one window aggregation per shard —
    the standard streaming approximation of bin packing used to build
    fixed-budget training batches."""
    from pyspark.sql import Window as W

    base = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(
        W.partitionBy("shard").orderBy(id_col).rowsBetween(W.unboundedPreceding, 0)
    )
    return base.select(
        "shard",
        id_col,
        "n_tokens",
        ((cum - F.col("n_tokens")) / F.lit(budget)).cast("long").alias("batch_id"),
    )


def pack_sequences_sql(table: str = "documents", budget: int = PACK_BUDGET) -> str:
    toks = tokens_sql("text")
    return f"""
    SELECT source AS shard, doc_id,
           CAST(len({toks}) AS BIGINT) AS n_tokens,
           CAST(floor((sum(len({toks})) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - len({toks})) / {budget}) AS BIGINT) AS batch_id
    FROM {table}
    """


#: temperature for domain-mixing weights (alpha < 1 upsamples small domains)
MIX_ALPHA = 0.7


def domain_mix_weights(
    df: DataFrame,
    shard_col: str = "source",
    alpha: float = MIX_ALPHA,
) -> DataFrame:
    """Temperature-scaled domain mixing (multilingual-BERT / XLM-style
    exponentiated sampling): weight_d = count_d^alpha / Σ count^alpha.
    Upsamples small domains relative to proportional sampling; ``alpha=1``
    recovers proportional, ``alpha=0`` uniform.  Emits per-domain counts,
    raw share, mixed weight, and the effective sampling multiplier.

    Scale shape: one count aggregation (|domains| rows) + a broadcast-able
    scalar total — the weights table is tiny and joins back to the corpus
    broadcast."""
    counts = df.groupBy(F.col(shard_col).alias("domain")).agg(F.count("*").alias("n_docs"))
    powed = counts.withColumn("__p", F.pow(F.col("n_docs").cast("double"), F.lit(alpha)))
    tot = powed.agg(
        F.sum("__p").alias("__tp"), F.sum("n_docs").alias("__tn")
    )
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            "n_docs",
            r6(F.col("n_docs") / F.col("__tn")).alias("raw_share"),
            r6(F.col("__p") / F.col("__tp")).alias("mix_weight"),
            r6((F.col("__p") / F.col("__tp")) / (F.col("n_docs") / F.col("__tn"))).alias(
                "upsample_factor"
            ),
        )
    )


def domain_mix_weights_sql(table: str = "documents", alpha: float = MIX_ALPHA) -> str:
    return f"""
    WITH counts AS (
        SELECT source AS domain, count(*) AS n_docs FROM {table} GROUP BY source
    ),
    powed AS (SELECT domain, n_docs, pow(CAST(n_docs AS DOUBLE), {alpha}) AS p FROM counts),
    tot AS (SELECT sum(p) AS tp, sum(n_docs) AS tn FROM powed)
    SELECT domain, n_docs,
           round(n_docs / tn, 6) AS raw_share,
           round(p / tp, 6) AS mix_weight,
           round((p / tp) / (n_docs / tn), 6) AS upsample_factor
    FROM powed CROSS JOIN tot
    """
