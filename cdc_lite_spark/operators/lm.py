"""Statistical language-model scoring over the corpus (SURVEY.md §2j X4+).

Unigram-LM log-probability scoring — the classic cheap "perplexity filter"
for training-data quality (docs whose tokens are improbable under the
corpus's own unigram distribution are boilerplate/noise candidates) — and
corpus bigram statistics.

Engine-parity discipline (see functions/hashes.py): per-term log
probabilities are rounded to 6 dp and carried as DECIMAL so the per-doc sum
is order-independent and bit-identical in DuckDB; the final averages divide
in DOUBLE (same operands → same IEEE result in both engines).

Scale shape: one explode+hash-agg for the vocabulary (partial-aggregable),
a global top-V (TakeOrderedAndProject — only V rows ever leave the
executors), then one explode + broadcast-join + hash-agg scoring pass.  No
all-pairs, no Python, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.operators.text import (
    adjacent_pairs,
    adjacent_pairs_sql,
    tokens,
    tokens_sql,
)

#: vocabulary size for the unigram LM (top-V by corpus frequency)
LM_VOCAB_SIZE = 1000
#: decimal places per-term log-probs are rounded to before the exact sum
LM_ROUND_DP = 6


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = LM_VOCAB_SIZE,
) -> DataFrame:
    """Per-document unigram-LM score: mean add-one-smoothed log-probability
    of the document's tokens under the corpus unigram distribution.

    ``logp(t) = ln((count(t) + 1) / (N + V + 1))`` for the top-``V`` terms,
    with a single OOV bucket ``ln(1 / (N + V + 1))`` for everything else
    (``N`` = total corpus token count).  Documents with no tokens drop out.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    # global top-V: TakeOrderedAndProject, deterministic (cnt desc, term asc)
    vocab = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(vocab_size)
    totals = counts.agg(F.sum("cnt").alias("n_total"))

    denom = F.col("n_total") + vocab_size + 1
    lp = F.round(
        F.log(F.coalesce(F.col("cnt") + 1, F.lit(1)).cast("double") / denom), LM_ROUND_DP
    ).cast(f"decimal(12,{LM_ROUND_DP})")
    scored = (
        toks.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), lp.alias("lp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("lp").cast("double").alias("sum_logprob"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "sum_logprob",
        (F.col("sum_logprob") / F.col("n_tokens")).alias("avg_logprob"),
    )


def unigram_logprob_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = LM_VOCAB_SIZE,
) -> str:
    """DuckDB twin of :func:`unigram_logprob` (same constants, same
    rounding, same decimal sum)."""
    toks = tokens_sql(text_col)
    return f"""
    WITH toks AS (
        SELECT {id_col}, unnest({toks}) AS term FROM {table}
    ),
    counts AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY term),
    vocab AS (SELECT term, cnt FROM counts ORDER BY cnt DESC, term ASC LIMIT {vocab_size}),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM counts),
    scored AS (
        SELECT t.{id_col},
               CAST(round(ln(CAST(coalesce(v.cnt + 1, 1) AS DOUBLE)
                             / (tot.n_total + {vocab_size} + 1)), {LM_ROUND_DP})
                    AS DECIMAL(12,{LM_ROUND_DP})) AS lp
        FROM toks t LEFT JOIN vocab v USING (term) CROSS JOIN tot
    )
    SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(lp) AS DOUBLE) AS sum_logprob,
           CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob
    FROM scored GROUP BY {id_col}
    """


def bigram_counts(
    docs: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """Global top-``top_n`` adjacent-token bigrams by corpus frequency
    (collocation mining / boilerplate discovery).  One explode + hash-agg +
    TakeOrderedAndProject; ties break on the bigram string."""
    # transform's index is 0-based and Spark SQL array indexing is 0-based:
    # element i pairs with element i+1; slice keeps indices 0..size-2
    bigrams = F.expr(
        "transform(slice(__t, 1, greatest(size(__t) - 1, 0)),"
        " (x, i) -> concat(x, ' ', __t[i + 1]))"
    )
    return (
        docs.select(tokens(text_col).alias("__t"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(top_n)
    )


def bigram_counts_sql(table: str = "documents", text_col: str = "text", top_n: int = 50) -> str:
    toks = tokens_sql(text_col)
    return f"""
    WITH toks AS (SELECT {toks} AS t FROM {table}),
    bg AS (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
            AS bigram
        FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT {top_n}
    """


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram-LM score — the step up from the unigram filter:
    mean add-one-smoothed conditional log-probability of each adjacent
    token pair under the corpus's own bigram distribution, plus the
    perplexity ``exp(-avg)`` quality number training pipelines threshold on
    (Wenzek et al., "CCNet", LREC 2020 filter by LM perplexity).

    ``logp(w_i | w_{i-1}) = ln((c(w_{i-1} w_i) + 1) / (ctx(w_{i-1}) + V))``
    with ``ctx`` the exact context count (sum of bigram counts by first
    token) and ``V`` the corpus vocabulary size.  The model is trained on
    the scored corpus itself, so every pair is in-vocabulary — no OOV
    bucket needed.  Documents with <2 tokens have no bigrams and drop out.

    Scale shape: one explode produces the pair stream; the model is two
    partial-aggregable hash-aggs over it (|observed bigrams| ≤ V² rows,
    language-bounded — at web scale cap to top-B pairs the way
    ``unigram_logprob`` caps its vocab); scoring is one equi-join of the
    pair stream against the model (AQE broadcasts it while it fits) + one
    |docs|-keyed agg.  Parity: per-pair logs round to {LM_ROUND_DP} dp and
    sum as DECIMAL (order-free, bit-identical in DuckDB); the division and
    exp run on identical operands.
    """
    pair_stream = (
        docs.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(id_col, F.explode(adjacent_pairs("prev", "cur")).alias("p"))
        .select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    )
    model = pair_stream.groupBy("prev", "cur").agg(F.count("*").alias("c_big"))
    ctx = model.groupBy("prev").agg(F.sum("c_big").alias("c_ctx"))
    vocab_n = (
        docs.select(F.explode(tokens(text_col)).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    lp = F.round(
        F.log((F.col("c_big") + 1).cast("double") / (F.col("c_ctx") + F.col("v"))),
        LM_ROUND_DP,
    ).cast(f"decimal(12,{LM_ROUND_DP})")
    scored = (
        pair_stream.join(model, ["prev", "cur"])
        .join(ctx, "prev")
        .crossJoin(F.broadcast(vocab_n))
        .select(F.col(id_col), lp.alias("lp"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp").cast("double").alias("sum_logprob"),
        )
        .select(
            id_col,
            "n_bigrams",
            (F.col("sum_logprob") / F.col("n_bigrams")).alias("avg_logprob"),
            F.round(
                F.exp(-(F.col("sum_logprob") / F.col("n_bigrams"))), LM_ROUND_DP
            ).alias("perplexity"),
        )
    )


def bigram_logprob_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bigram_logprob` (same smoothing, rounding,
    decimal sum)."""
    toks = tokens_sql(text_col)
    return f"""
    WITH base AS (SELECT {id_col}, {toks} AS t FROM {table}),
    pairs AS (
        SELECT {id_col}, p[1] AS prev, p[2] AS cur
        FROM (
            SELECT {id_col},
                   unnest({adjacent_pairs_sql()}) AS p
            FROM base
        )
    ),
    model AS (SELECT prev, cur, count(*) AS c_big FROM pairs GROUP BY prev, cur),
    ctx AS (SELECT prev, sum(c_big) AS c_ctx FROM model GROUP BY prev),
    voc AS (
        SELECT count(DISTINCT tt) AS v
        FROM (SELECT unnest(t) AS tt FROM base)
    ),
    scored AS (
        SELECT p.{id_col},
               CAST(round(ln(CAST(m.c_big + 1 AS DOUBLE) / (x.c_ctx + voc.v)),
                          {LM_ROUND_DP}) AS DECIMAL(12,{LM_ROUND_DP})) AS lp
        FROM pairs p
        JOIN model m USING (prev, cur)
        JOIN ctx x USING (prev)
        CROSS JOIN voc
    )
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob,
           round(exp(-(CAST(sum(lp) AS DOUBLE) / count(*))), {LM_ROUND_DP})
               AS perplexity
    FROM scored GROUP BY {id_col}
    """


# --- DSIR-style importance resampling ---------------------------------------


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = LM_VOCAB_SIZE,
) -> DataFrame:
    """Per-document importance log-weight for Data Selection with Importance
    Resampling (Xie et al., NeurIPS 2023): ``log w(x) = log p_target(x) −
    log p_raw(x)`` under two add-one-smoothed unigram LMs — documents that
    look more like the (small) target corpus than like the raw pool score
    high.  This is the paper's hashed-ngram estimator with the engine's
    top-V vocab discipline standing in for feature hashing.

    Engine parity: per-term log-probs under BOTH models round to
    ``LM_ROUND_DP`` decimals, the per-token difference stays DECIMAL, and
    the per-doc sum is therefore exact and order-independent.

    Scale shape: both vocabularies are top-V TakeOrderedAndProject results
    that broadcast; scoring is ONE pass over the raw corpus's tokens (one
    explode, two broadcast joins, one hash agg) — the target corpus is
    read once to fit its model and never joined row-to-row against raw.
    """
    raw_toks = raw.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))

    def _model(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        toks = docs.select(F.explode(tokens(text_col)).alias("term"))
        counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
        vocab = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(vocab_size)
        total = counts.agg(F.sum("cnt").alias("n_total"))
        return vocab, total

    vocab_t, total_t = _model(target)
    vocab_r, total_r = _model(raw)

    def _lp(cnt_col: str, total_col: str) -> F.Column:
        denom = F.col(total_col) + vocab_size + 1
        return F.round(
            F.log(F.coalesce(F.col(cnt_col) + 1, F.lit(1)).cast("double") / denom),
            LM_ROUND_DP,
        ).cast(f"decimal(12,{LM_ROUND_DP})")

    scored = (
        raw_toks.join(
            F.broadcast(vocab_t.withColumnRenamed("cnt", "cnt_t")), "term", "left"
        )
        .join(F.broadcast(vocab_r.withColumnRenamed("cnt", "cnt_r")), "term", "left")
        .crossJoin(F.broadcast(total_t.withColumnRenamed("n_total", "n_t")))
        .crossJoin(F.broadcast(total_r.withColumnRenamed("n_total", "n_r")))
        .select(
            F.col(id_col),
            (_lp("cnt_t", "n_t") - _lp("cnt_r", "n_r")).alias("lw"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("lw").cast("double").alias("log_weight"),
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = LM_VOCAB_SIZE,
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k importance resampling on the DSIR log-weights: key =
    ``log w + Gumbel`` with the Gumbel noise derived from the portable id
    hash (``−ln(−ln(u))``), so the resample is weighted-without-replacement
    AND deterministic across runs/engines/layouts — the same discipline as
    ``sampling.weighted_sample``, lifted to log-space weights.

    Returns the k selected (id, n_tokens, log_weight) rows via global
    top-k heads (no full sort)."""
    from cdc_lite_spark.functions.hashes import portable_hash64
    from cdc_lite_spark.operators.sampling import RACE_M

    weights = dsir_log_weights(raw, target, id_col, text_col, vocab_size)
    u = (
        portable_hash64(F.col(id_col).cast("string"), seed=seed) % RACE_M
        + F.lit(0.5)
    ) / F.lit(float(RACE_M))
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn("_key", F.col("log_weight") + gumbel)
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_key")
    )
