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

from cdc_lite_spark.operators.text import tokens, tokens_sql

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
