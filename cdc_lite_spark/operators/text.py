"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2j X4).

Language-ID (marker-word heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + a BPE-ish regex), and document
fingerprinting (polynomial rolling hash).  All pure column expressions —
JVM-side, whole-stage codegen, embarrassingly parallel: at 100 TB these are
scan-bound map operators with zero shuffle.

Each operator has a DuckDB SQL twin built from the same constants so the
oracle compares bit-identical values (functions/hashes.py discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_lite_spark.functions.hashes import portable_hash64, portable_hash64_sql

# --- shared constants (Spark + DuckDB twins derive from these) -------------

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbols
#: (character classes only — identical semantics in Java regex and RE2).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: marker words per language for the heuristic language-ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}
LANG_PRIORITY = ("en", "de", "es", "fr")  # deterministic tie-break order

STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "it", "on", "for")

ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007
TOKEN_MOD = 1_000_003


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens with empties dropped (leading/trailing/double
    spaces produce empty strings in both engines' regex split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda x: x != "")


def tokens_sql(expr: str = "text") -> str:
    return f"list_filter(string_split({expr}, ' '), x -> x != '')"


def adjacent_pairs(first: str = "a", second: str = "b", col: str = "__t") -> Column:
    """Struct array of ADJACENT token pairs of the token-array column
    ``col`` — the shared pair extractor behind bigram LMs, PMI, and the
    co-occurrence graph (transform's index is 0-based and Spark array
    indexing is 0-based: element i pairs with element i+1; slice keeps
    indices 0..size-2).  One definition so a tokenizer/pairing change
    cannot silently diverge across operators."""
    return F.expr(
        f"transform(slice({col}, 1, greatest(size({col}) - 1, 0)),"
        f" (x, i) -> struct(x AS {first}, {col}[i + 1] AS {second}))"
    )


def adjacent_pairs_sql(col: str = "t") -> str:
    """DuckDB twin of :func:`adjacent_pairs`: 2-element lists over the
    1-based range (identical pair set)."""
    return f"list_transform(range(1, len({col})), i -> [{col}[i], {col}[i + 1]])"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (op X4 token counting)."""
    return df.withColumn("n_tokens", F.size(tokens(text_col))).withColumn(
        "n_subwords", F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    )


def token_counts_sql(text_expr: str = "text") -> dict[str, str]:
    return {
        "n_tokens": f"len({tokens_sql(text_expr)})",
        "n_subwords": f"len(regexp_extract_all({text_expr}, '{BPE_ISH_PATTERN}'))",
    }


def _marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda x: F.array_contains(marker_arr, x)))


def _marker_score_sql(toks_expr: str, markers: tuple[str, ...]) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter({toks_expr}, x -> list_contains({arr}, x)))"


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """Heuristic language-ID: marker-word hit counts per language, argmax
    with fixed priority order; 'und' (undetermined) when nothing matches."""
    toks = tokens(text_col)
    scores = {lang: _marker_score(toks, m) for lang, m in LANG_MARKERS.items()}
    best: Column = F.lit("und")
    for lang in reversed(LANG_PRIORITY):  # earlier priority wins ties via >=
        cond = scores[lang] >= F.greatest(*[scores[o] for o in LANG_PRIORITY if o != lang])
        better = cond & (scores[lang] > 0)
        best = F.when(better, F.lit(lang)).otherwise(best)
    return df.withColumn(out_col, best)


def lang_id_sql(text_expr: str = "text") -> str:
    toks = tokens_sql(text_expr)
    score = {lang: _marker_score_sql(toks, m) for lang, m in LANG_MARKERS.items()}
    expr = "'und'"
    for lang in reversed(LANG_PRIORITY):
        others = " , ".join(score[o] for o in LANG_PRIORITY if o != lang)
        expr = (
            f"CASE WHEN {score[lang]} > 0 AND {score[lang]} >= greatest({others}) "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: char/token counts, mean token length,
    punctuation ratio, stopword ratio, and a composite quality score."""
    t = tokens(text_col)
    n_chars = F.length(text_col)
    n_toks = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9 ]"))
    mean_tok = F.when(n_toks > 0, n_chars.cast("double") / n_toks).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, n_stop.cast("double") / n_toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.when((n_toks >= 5) & (stop_ratio <= 0.5), F.lit(1.0)).otherwise(F.lit(0.0))
        * (1 - punct_ratio)
    )
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_toks)
        .withColumn("mean_token_len", mean_tok)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("quality_score", quality)
    )


def text_stats_sql(text_expr: str = "text") -> dict[str, str]:
    toks = tokens_sql(text_expr)
    stop_arr = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    n_chars = f"length({text_expr})"
    n_toks = f"len({toks})"
    n_stop = f"len(list_filter({toks}, x -> list_contains({stop_arr}, x)))"
    n_punct = f"len(regexp_extract_all({text_expr}, '[^A-Za-z0-9 ]'))"
    mean_tok = f"CASE WHEN {n_toks} > 0 THEN CAST({n_chars} AS DOUBLE) / {n_toks} ELSE 0.0 END"
    stop_ratio = f"CASE WHEN {n_toks} > 0 THEN CAST({n_stop} AS DOUBLE) / {n_toks} ELSE 0.0 END"
    punct_ratio = f"CASE WHEN {n_chars} > 0 THEN CAST({n_punct} AS DOUBLE) / {n_chars} ELSE 0.0 END"
    quality = (
        f"(CASE WHEN {n_toks} >= 5 AND {stop_ratio} <= 0.5 THEN 1.0 ELSE 0.0 END)"
        f" * (1 - {punct_ratio})"
    )
    return {
        "n_chars_calc": n_chars,
        "n_tokens": n_toks,
        "mean_token_len": mean_tok,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality_score": quality,
    }


def doc_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Polynomial rolling hash over token hashes — an order-SENSITIVE
    document fingerprint (complement of the order-insensitive C3 table
    checksum): fp = fold(acc*31 + h(tok) mod p)."""
    tok_hashes = F.transform(tokens(text_col), lambda t: portable_hash64(t) % TOKEN_MOD)
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD,
    )
    return df.withColumn(out_col, fp)


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_weight: float = 0.0,
) -> DataFrame:
    """TF-IDF term weights: ``(doc_id, term, tf, df_count, weight)``.

    Classic two-aggregate shape: explode tokens → per-(doc,term) counts →
    per-term document frequency → weight = tf · ln(N/df).  Scale: two hash
    aggregations (both partial-aggregable) and one broadcastable join of the
    term-frequency table (|vocab| rows); the corpus is scanned once.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_count"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    out = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df_count",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df_count")), 8
            ).alias("weight"),
        )
    )
    return out.filter(F.col("weight") >= min_weight) if min_weight > 0 else out


def tf_idf_sql(table: str = "documents", id_col: str = "doc_id", text_expr: str = "text") -> str:
    """DuckDB twin of :func:`tf_idf` (ln + round(,8) keeps libm last-ulp
    differences out of the compared values)."""
    return f"""
    WITH toks AS (
        SELECT {id_col}, unnest({tokens_sql(text_expr)}) AS term FROM {table}
    ),
    tf AS (
        SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY {id_col}, term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_count FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT {id_col}) AS n_docs FROM {table})
    SELECT tf.{id_col}, tf.term, tf.tf, dfreq.df_count,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df_count), 8) AS weight
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    """


def doc_fingerprint_sql(text_expr: str = "text") -> str:
    h = portable_hash64_sql("t")
    tok_hashes = f"list_transform({tokens_sql(text_expr)}, t -> {h} % {TOKEN_MOD})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {tok_hashes}), "
        f"(acc, x) -> (acc * {ROLLING_BASE} + x) % {ROLLING_MOD})"
    )


# --- encoding quality (X4 extension) -----------------------------------------

#: byte-sequence artifacts of UTF-8 text decoded as Latin-1/cp1252 — the
#: classic mojibake signatures ("â€™" for an apostrophe,
#: "Ã©" for e-acute, stray "Â" before NBSP)
MOJIBAKE_MARKERS = ("â", "Ã", "Â")

#: U+FFFD — a decoder already gave up on these bytes
REPLACEMENT_CHAR = "�"

#: C0 control characters except tab/newline/CR (never legitimate in text)
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"


def _count_marker(col: Column, marker: str) -> Column:
    """Occurrences of a fixed substring via replace-length diff (no regex —
    the same trick works verbatim in DuckDB)."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit("")))
    ) / len(marker)


def encoding_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Encoding-quality features per document: replacement-char count,
    C0 control characters, non-ASCII ratio, and a mojibake score
    (UTF-8-decoded-as-Latin-1 artifacts).  Training pipelines threshold on
    these before any model-based quality filter — documents full of decode
    artifacts poison tokenizers cheaply.

    Pure scan-side expressions (length/replace/regexp_count): no shuffle,
    whole-stage codegen, trivially 100 TB-safe."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_repl = _count_marker(c, REPLACEMENT_CHAR).cast("long")
    n_control = F.regexp_count(c, F.lit(_CONTROL_CLASS)).cast("long")
    n_non_ascii = F.regexp_count(c, F.lit(r"[^\x00-\x7F]"))
    mojibake = None
    for m in MOJIBAKE_MARKERS:
        cnt = _count_marker(c, m)
        mojibake = cnt if mojibake is None else mojibake + cnt
    mojibake = mojibake.cast("long")
    non_ascii_ratio = F.when(
        n_chars > 0, F.round(n_non_ascii.cast("double") / n_chars, 6)
    ).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_repl.alias("n_replacement"),
        n_control.alias("n_control"),
        non_ascii_ratio.alias("non_ascii_ratio"),
        mojibake.alias("mojibake_hits"),
        ((n_repl == 0) & (n_control == 0) & (mojibake == 0))
        .cast("int")
        .alias("clean_encoding"),
    )


def encoding_stats_sql(text_expr: str = "text") -> dict[str, str]:
    """DuckDB twins of :func:`encoding_stats` (same replace-diff trick)."""

    def count_marker(m: str) -> str:
        return (
            f"((length({text_expr}) - length(replace({text_expr}, '{m}', '')))"
            f" / {len(m)})"
        )

    n_chars = f"length({text_expr})"
    n_repl = f"CAST({count_marker(REPLACEMENT_CHAR)} AS BIGINT)"
    n_control = (
        f"CAST(len(regexp_extract_all({text_expr}, '{_CONTROL_CLASS}')) AS BIGINT)"
    )
    n_non_ascii = f"len(regexp_extract_all({text_expr}, '[^\\x00-\\x7F]'))"
    mojibake = "(" + " + ".join(count_marker(m) for m in MOJIBAKE_MARKERS) + ")"
    return {
        "n_chars": n_chars,
        "n_replacement": n_repl,
        "n_control": n_control,
        "non_ascii_ratio": (
            f"CASE WHEN {n_chars} > 0 THEN "
            f"round(CAST({n_non_ascii} AS DOUBLE) / {n_chars}, 6) ELSE 0.0 END"
        ),
        "mojibake_hits": f"CAST({mojibake} AS BIGINT)",
        "clean_encoding": (
            f"CAST(({n_repl} = 0 AND {n_control} = 0 AND "
            f"CAST({mojibake} AS BIGINT) = 0) AS INT)"
        ),
    }


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the statistic the
    first BPE merge iteration maximizes (Sennrich et al., "Neural Machine
    Translation of Rare Words with Subword Units", ACL 2016).

    Scale shape (the classic distributed-BPE trick): the corpus first
    collapses to the VOCABULARY aggregate (word, n_occurrences) — one
    partial-aggregable shuffle keyed on the word — and pair generation
    runs over vocab entries weighted by their counts.  The expensive text
    volume is touched exactly once; everything after operates on |vocab|
    rows, which is bounded by the language, not the corpus.  Output is the
    FULL pair table (alphabet-bounded, a few hundred rows) so no top-k
    tie-break nondeterminism exists.
    """
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_occ"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.substring(F.col("word"), i, 2),
    )
    return (
        vocab.filter(F.length("word") >= 2)
        .select(F.explode(pairs).alias("pair"), "n_occ")
        .groupBy("pair")
        .agg(F.sum("n_occ").cast("bigint").alias("pair_count"))
    )


def bpe_pair_counts_sql(table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB twin of ``bpe_pair_counts``."""
    return f"""
    WITH vocab AS (
        SELECT word, count(*) AS n_occ
        FROM (SELECT unnest({tokens_sql(text_expr)}) AS word FROM {table})
        GROUP BY word
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(word)),
                                     i -> substr(word, CAST(i AS INT), 2))) AS pair,
               n_occ
        FROM vocab WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(n_occ) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    """


def _merge_pair_fold(syms: Column, left: Column, right: Column, merged: Column) -> Column:
    """Greedy left-to-right single-pair merge over a symbol array, as a
    fold: walk the symbols; when the accumulator's last element equals
    ``left`` and the current symbol equals ``right``, replace the last
    element with ``merged``.  Because the merged symbol differs from
    ``left``, runs merge non-overlapping left-to-right — exactly BPE's
    greedy semantics (a a a a → aa aa, not aa a a)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == left) & (x == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _vocab_bpe_local(n_merges: int):
    """Executor-side BPE merge loop over the (word, n_occ, syms) vocab
    batches of ONE coalesced partition — the same size-gate shape as the
    union-find connected-components fast path.  Emits the merge table."""
    import pandas as pd

    def run(batches):
        vocab: dict[tuple[str, ...], int] = {}
        for b in batches:
            for syms, occ in zip(b["syms"], b["n_occ"]):
                key = tuple(syms)
                vocab[key] = vocab.get(key, 0) + int(occ)
        merges = []
        for rank in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + c
            if not counts:
                break
            (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < 2:
                break
            merges.append((rank, l, r, l + r))
            new_vocab: dict[tuple[str, ...], int] = {}
            for syms, c in vocab.items():
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == l and x == r:
                        out[-1] = l + r
                    else:
                        out.append(x)
                key = tuple(out)
                new_vocab[key] = new_vocab.get(key, 0) + c
            vocab = new_vocab
        yield pd.DataFrame(
            merges, columns=["merge_rank", "left_sym", "right_sym", "merged"]
        ).astype({"merge_rank": "int32"})

    return run


MERGES_SCHEMA = "merge_rank int, left_sym string, right_sym string, merged string"
#: above this vocab size the executor-local merge loop gives way to the
#: distributed per-iteration DataFrame path
BPE_LOCAL_MAX_VOCAB = 2_000_000


def char_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n_occ, syms) vocabulary aggregate — the ONLY pass over the
    text volume (one partial-aggregable shuffle keyed on the word); BPE
    iterations run over this, whose size is bounded by the language's word
    types, not the corpus."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")), lambda i: F.substring(F.col("word"), i, 1)
    )
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_occ"))
        .select("word", "n_occ", chars.alias("syms"))
    )


def bpe_train_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Distributed BPE training, merge table only (Sennrich et al. ACL
    2016).  The corpus collapses to the vocabulary aggregate once; the
    merge loop — inherently sequential, O(|vocab|·n_merges) — then runs
    executor-side over ONE coalesced Arrow partition (word types are
    language-bounded: even web-scale corpora yield vocabularies far under
    ``BPE_LOCAL_MAX_VOCAB``; the count-threshold gate below guards the
    pathological case).  One job end-to-end, no per-iteration scheduling
    round-trips.  ``bpe_train`` keeps the per-iteration DataFrame loop for
    vocabularies that genuinely exceed one executor's memory.

    The gate is enforced, not just documented: the vocab cardinality (one
    cheap aggregate over the already-required vocab plan) picks the path
    — the same size-gate discipline as ``dedup_clusters``."""
    vocab = char_vocab(df, text_col)
    if vocab.count() > BPE_LOCAL_MAX_VOCAB:
        merges, _ = bpe_train(df, text_col, n_merges)
        return merges
    return vocab.coalesce(1).mapInPandas(_vocab_bpe_local(n_merges), MERGES_SCHEMA)


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 8, vocab_partitions: int = 1
):
    """Per-iteration DataFrame BPE training — the scale path for
    vocabularies too large for one executor (see ``bpe_train_merges`` for
    the common case).  Returns (merges, vocab): the ordered rule list and
    the final symbolized vocabulary DataFrame.

    Each merge iteration runs on |vocab| rows: pair counts are a hash
    aggregate, the argmax is a 1-row collect (the decision is inherently
    sequential — the driver round-trip is the algorithm, not an accident),
    and the merge itself is the greedy fold above.  Per-iteration vocab is
    localCheckpoint-ed so the plan doesn't grow multiplicatively
    (the ``kmeans_refine`` lesson), and superseded checkpoints are freed.
    """
    from cdc_lite_spark.operators._iterative import (
        free_new_checkpoints,
        persistent_rdd_ids,
    )

    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    vocab = (
        char_vocab(df, text_col)
        # |vocab| is language-bounded (word TYPES, not tokens), so the
        # iterative phase runs on a few partitions regardless of corpus
        # size; default 1 keeps per-iteration jobs single-task (32-way
        # shuffles of a 10^3-row table cost more in scheduling than work)
        .coalesce(vocab_partitions)
        .localCheckpoint(eager=True)
    )
    pair_col = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i).alias("l"),
            F.element_at("syms", i + 1).alias("r"),
        ),
    )
    merges: list[tuple[int, str, str, str]] = []
    for rank in range(n_merges):
        best = (
            vocab.filter(F.size("syms") >= 2)
            .select(F.explode(pair_col).alias("p"), "n_occ")
            .groupBy("p.l", "p.r")
            .agg(F.sum("n_occ").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < 2:
            break
        l, r = best[0]["l"], best[0]["r"]
        merges.append((rank, l, r, l + r))
        vocab = vocab.select(
            "word",
            "n_occ",
            _merge_pair_fold(
                F.col("syms"), F.lit(l), F.lit(r), F.lit(l + r)
            ).alias("syms"),
        ).localCheckpoint(eager=True)
    free_new_checkpoints(spark, before, keep_latest=1)
    merges_df = df.sparkSession.createDataFrame(
        merges or [(0, "", "", "")], MERGES_SCHEMA
    )
    if not merges:
        merges_df = merges_df.limit(0)
    return merges_df, vocab


def _vocab_bpe_segment(n_merges: int):
    """Executor-side BPE loop that emits the final SEGMENTATION of each
    vocab word (word, n_occ, pieces) instead of the merge table."""
    import pandas as pd

    def run(batches):
        rows = []  # (word, n_occ)
        vocab: dict[str, tuple[tuple[str, ...], int]] = {}
        for b in batches:
            for word, syms, occ in zip(b["word"], b["syms"], b["n_occ"]):
                vocab[word] = (tuple(syms), int(occ))
        for _ in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for syms, c in vocab.values():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + c
            if not counts:
                break
            (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < 2:
                break
            new_vocab = {}
            for word, (syms, c) in vocab.items():
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == l and x == r:
                        out[-1] = l + r
                    else:
                        out.append(x)
                new_vocab[word] = (tuple(out), c)
            vocab = new_vocab
        yield pd.DataFrame(
            [(w, c, list(s)) for w, (s, c) in vocab.items()],
            columns=["word", "n_occ", "pieces"],
        )

    return run


def bpe_vocab_segmentation(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """(word, n_occ, pieces): each vocabulary word segmented by the learned
    BPE merges — the lookup table tokenization-by-join reads.  Same
    executor-local shape (and the same enforced size gate) as
    ``bpe_train_merges``; above the gate the per-iteration DataFrame
    trainer's final vocab IS the segmentation."""
    vocab = char_vocab(df, text_col)
    if vocab.count() > BPE_LOCAL_MAX_VOCAB:
        _, trained = bpe_train(df, text_col, n_merges)
        return trained.select("word", "n_occ", F.col("syms").alias("pieces"))
    return vocab.coalesce(1).mapInPandas(
        _vocab_bpe_segment(n_merges), "word string, n_occ bigint, pieces array<string>"
    )


def bpe_token_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Per-document BPE token count under the corpus-learned merges — the
    budget number a training pipeline needs per document (sequence packing,
    cost estimation) computed WITHOUT tokenizing any document: documents
    explode to words, the segmented vocabulary broadcasts (it is
    language-bounded), and the piece counts sum per document.  The corpus
    text is touched twice total (once to learn, once to count words);
    no Python ever sees a document."""
    seg = bpe_vocab_segmentation(df, text_col, n_merges).select(
        "word", F.size("pieces").alias("__np")
    )
    words = df.select(id_col, F.explode(tokens(text_col)).alias("word"))
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("__np").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def _bpe_recursive_cte(
    n_merges: int, table: str = "documents", text_expr: str = "text"
) -> str:
    """The shared DuckDB recursive-CTE core of the BPE oracles: iterative
    vocab reduction as `WITH RECURSIVE` — each step's working table is the
    previous iteration's segmented vocabulary; the best pair is a
    LIMIT-1 aggregate subquery over it (cnt DESC, l, r — the exact
    tie-break of both Spark paths), and the greedy left-to-right merge is
    the same list fold as ``_merge_pair_fold``.  Recursion stops when the
    best pair's count drops below 2 or ``n_merges`` is reached — the final
    iteration's rows ARE the segmented vocabulary."""
    toks = tokens_sql(text_expr)
    return f"""
    WITH RECURSIVE vocab0 AS (
        SELECT word, count(*) AS n_occ
        FROM (SELECT unnest({toks}) AS word FROM {table})
        GROUP BY word
    ),
    it AS (
        SELECT 0 AS iter, word, n_occ,
               list_transform(range(1, length(word) + 1),
                              i -> substr(word, CAST(i AS INT), 1)) AS syms,
               CAST(NULL AS VARCHAR) AS ml, CAST(NULL AS VARCHAR) AS mr
        FROM vocab0
        UNION ALL
        SELECT it.iter + 1, it.word, it.n_occ,
               list_reduce(
                   list_prepend(CAST([] AS VARCHAR[]), list_transform(it.syms, s -> [s])),
                   (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = best.l AND x[1] = best.r
                               THEN list_append(acc[1:len(acc)-1], best.l || best.r)
                               ELSE list_concat(acc, x) END
               ) AS syms,
               best.l, best.r
        FROM it CROSS JOIN (
            SELECT p[1] AS l, p[2] AS r, sum(n_occ) AS cnt
            FROM (
                SELECT unnest(list_transform(range(1, len(syms)),
                                  i -> [syms[CAST(i AS INT)], syms[CAST(i AS INT) + 1]])) AS p,
                       n_occ
                FROM it WHERE len(syms) >= 2
            )
            GROUP BY 1, 2
            ORDER BY cnt DESC, l, r
            LIMIT 1
        ) best
        WHERE it.iter < {n_merges} AND best.cnt >= 2
    )
    """


def bpe_train_merges_sql(
    n_merges: int = 8, table: str = "documents", text_expr: str = "text"
) -> str:
    """DuckDB twin of ``bpe_train_merges`` — the ordered merge-rule table
    extracted from the recursive iterations (rows produced at iteration k
    carry the pair chosen for merge rank k-1)."""
    return (
        _bpe_recursive_cte(n_merges, table, text_expr)
        + """
    SELECT DISTINCT CAST(iter - 1 AS INT) AS merge_rank,
           ml AS left_sym, mr AS right_sym, ml || mr AS merged
    FROM it WHERE iter >= 1
    """
    )


def bpe_token_counts_sql(
    n_merges: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of ``bpe_token_counts`` — the final recursive iteration
    is the segmented vocabulary; per-document counts come from the same
    tokenization-by-join (no document is re-segmented)."""
    toks = tokens_sql(text_expr)
    return (
        _bpe_recursive_cte(n_merges, table, text_expr)
        + f"""
    , final AS (
        SELECT word, len(syms) AS np
        FROM it WHERE iter = (SELECT max(iter) FROM it)
    ),
    words AS (SELECT {id_col}, unnest({toks}) AS word FROM {table})
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(np) AS BIGINT) AS n_bpe_tokens
    FROM words JOIN final USING (word)
    GROUP BY {id_col}
    """
    )


BM25_K1 = 1.2
BM25_B = 0.75
#: default probe query for the registered BM25 query (terms from the
#: synthetic vocabulary so the result set is non-trivial)
BM25_QUERY_TERMS = ("spark", "query", "table")


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 document scores for a query term set (Robertson &
    Spärck Jones probabilistic weighting; the default ranking function of
    Lucene/Elasticsearch) — the retrieval-quality upgrade over raw TF-IDF.

    score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: one corpus scan → per-(doc, term) TF restricted to the
    query terms scan-side (the filter prunes before the aggregate, so the
    exchange carries only matching postings); doc lengths ride the same
    scan; df/avgdl/N are broadcast scalars.  The per-term score sum folds
    over a sorted term array — float order fixed cross-engine."""
    terms_arr = F.array(*[F.lit(t) for t in query_terms])
    toks = df.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("dl"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf = (
        toks.filter(F.array_contains(terms_arr, F.col("term")))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    stats = df.select(
        F.countDistinct(id_col).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_count"))
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df_count") + 0.5) / (F.col("df_count") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    term_score = idf * (F.col("tf") * (k1 + 1)) / denom
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, "term", term_score.alias("ts"))
    )
    ordered = F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("ts"))))
    total = F.aggregate(
        F.transform(ordered, lambda s: s["ts"]), F.lit(0.0), lambda acc, x: acc + x
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_matched_terms"),
        F.round(total, 6).alias("bm25"),
    )


def bm25_scores_sql(
    table: str = "documents",
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    id_col: str = "doc_id",
    text_expr: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of ``bm25_scores``."""
    toks = tokens_sql(text_expr)
    terms = "[" + ", ".join(f"'{t}'" for t in query_terms) + "]"
    return f"""
    WITH base AS (
        SELECT {id_col}, len({toks}) AS dl, unnest({toks}) AS term FROM {table}
    ),
    tf AS (
        SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
        FROM base WHERE list_contains({terms}, term)
        GROUP BY {id_col}, term
    ),
    stats AS (
        SELECT count(DISTINCT {id_col}) AS n_docs,
               avg(len({toks})) AS avgdl
        FROM {table}
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_count FROM tf GROUP BY term),
    scored AS (
        SELECT {id_col}, tf.term AS term,
               ln(1.0 + (n_docs - df_count + 0.5) / (df_count + 0.5))
               * (tf * ({k1} + 1)) / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)) AS ts
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
    )
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_matched_terms,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ts ORDER BY term)),
                             (acc, x) -> acc + x), 6) AS bm25
    FROM scored GROUP BY {id_col}
    """


# --- blocklist policy filtering --------------------------------------------

#: default policy blocklist for the registered query — lowercase terms,
#: matched against whitespace tokens after lowercasing (term-level matching,
#: not substring: "ship" does not hit "shipment").
DEFAULT_BLOCKLIST = ("quarterly", "anomaly", "checksum", "deprecated")


def blocklist_hits(
    df: DataFrame,
    terms: tuple[str, ...] = DEFAULT_BLOCKLIST,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Policy/content filtering against a term blocklist: per document, the
    sorted list of distinct blocklist terms present and their count, plus
    the keep/drop verdict.

    Scale shape: the blocklist rides into the plan as a LITERAL array (for
    real deployments, a broadcast join against a terms table works the same
    way) and matching is `array_intersect` on the lowercased token set —
    one scan-side expression, zero shuffle, whole-stage codegen.  This is
    term-level matching on the shared whitespace tokenizer; substring
    matching (catching "badword" inside "xbadwordy") is a different
    operator with regex cost — deliberately not this one.
    """
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    hits = F.array_sort(F.array_intersect(toks, F.array(*[F.lit(t) for t in terms])))
    return df.select(
        F.col(id_col),
        hits.alias("hit_terms"),
        F.size(hits).cast("int").alias("n_hit_terms"),
        (F.size(hits) == 0).cast("int").alias("keep"),
    )


def blocklist_hits_sql(
    terms: tuple[str, ...] = DEFAULT_BLOCKLIST,
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    lst = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    toks = tokens_sql(f"lower({text_expr})")
    hits = f"list_sort(list_distinct(list_filter({toks}, t -> list_contains({lst}, t))))"
    return f"""
    SELECT {id_col},
           {hits} AS hit_terms,
           CAST(len({hits}) AS INT) AS n_hit_terms,
           CAST(len({hits}) = 0 AS INT) AS keep
    FROM {table}
    """


# --- corpus statistics: PMI phrases, entropy, Zipf fit ----------------------

#: minimum pair count for a PMI phrase candidate (Mikolov et al.'s discount
#: threshold in spirit: rare pairs produce unreliable, inflated PMI)
PMI_MIN_COUNT = 5
#: decimal places PMI / entropy contributions round to before exact sums
CORPUS_STAT_DP = 9


def phrase_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = PMI_MIN_COUNT,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the classic
    phrase-detection statistic (Mikolov et al., "Distributed
    Representations of Words and Phrases", NeurIPS 2013 learn phrases by
    thresholding exactly this score):

        pmi(a,b) = ln( c(a b) · N_pairs / (c_left(a) · c_right(b)) )

    with ``c_left``/``c_right`` the exact marginal counts of the pair
    table (so the distribution sums to 1 by construction).  Pairs below
    ``min_count`` are dropped.  Output: (a, b, pair_count, pmi).

    Scale shape: one explode over the token stream, then three
    partial-aggregable hash-aggs on the pair table (|pairs| ≤ V²,
    language-bounded) and two vocabulary-sized joins — AQE broadcasts the
    marginals while they fit.  No Python, no windows."""
    pair_df = (
        df.select(tokens(text_col).alias("__t"))
        .select(F.explode(adjacent_pairs()).alias("p"))
        .select("p.a", "p.b")
    )
    counts = pair_df.groupBy("a", "b").agg(F.count("*").alias("pair_count"))
    left = counts.groupBy("a").agg(F.sum("pair_count").alias("c_a"))
    right = counts.groupBy("b").agg(F.sum("pair_count").alias("c_b"))
    total = counts.agg(F.sum("pair_count").alias("n_pairs"))
    pmi = F.round(
        F.log(
            F.col("pair_count").cast("double")
            * F.col("n_pairs")
            / (F.col("c_a") * F.col("c_b"))
        ),
        6,
    )
    return (
        counts.filter(F.col("pair_count") >= min_count)
        .join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(total))
        .select("a", "b", "pair_count", pmi.alias("pmi"))
    )


def phrase_pmi_sql(
    table: str = "documents",
    text_expr: str = "text",
    min_count: int = PMI_MIN_COUNT,
) -> str:
    """DuckDB twin of :func:`phrase_pmi` (identical count marginals,
    identical ln operand, 6-dp rounding)."""
    toks = tokens_sql(text_expr)
    return f"""
    WITH pairs AS (
        SELECT p[1] AS a, p[2] AS b
        FROM (
            SELECT unnest({adjacent_pairs_sql()}) AS p
            FROM (SELECT {toks} AS t FROM {table})
        )
    ),
    counts AS (SELECT a, b, CAST(count(*) AS BIGINT) AS pair_count FROM pairs GROUP BY a, b),
    lmarg AS (SELECT a, sum(pair_count) AS c_a FROM counts GROUP BY a),
    rmarg AS (SELECT b, sum(pair_count) AS c_b FROM counts GROUP BY b),
    tot AS (SELECT sum(pair_count) AS n_pairs FROM counts)
    SELECT a, b, pair_count,
           round(ln(CAST(pair_count AS DOUBLE) * n_pairs / (c_a * c_b)), 6) AS pmi
    FROM counts JOIN lmarg USING (a) JOIN rmarg USING (b) CROSS JOIN tot
    WHERE pair_count >= {min_count}
    """


def token_entropy_by_source(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Shannon entropy of each source's token distribution — the corpus
    diversity gauge a mixing pipeline reads next to `domain_mix_weights`
    (a source whose entropy collapses is template spam, not prose).
    Output: (source, n_tokens, n_vocab, entropy) with entropy in nats.

    Parity: per-term contributions ``p·ln p`` round to CORPUS_STAT_DP (9)
    dp and sum as DECIMAL (order-free); both engines divide identical
    operands.  One explode + two hash-aggs; everything after the
    (source, term) aggregate is vocabulary-sized."""
    term_counts = (
        df.select(F.col(group_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(group_col, "term")
        .agg(F.count("*").alias("c"))
    )
    totals = term_counts.groupBy(group_col).agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("n_vocab")
    )
    p = F.col("c").cast("double") / F.col("n_tokens")
    contrib = F.round(p * F.log(p), CORPUS_STAT_DP).cast(
        f"decimal(20,{CORPUS_STAT_DP})"
    )
    return (
        term_counts.join(totals, group_col)
        .select(F.col(group_col), F.col("n_tokens"), F.col("n_vocab"), contrib.alias("h"))
        .groupBy(group_col, "n_tokens", "n_vocab")
        .agg(F.round(-F.sum("h").cast("double"), 6).alias("entropy"))
    )


def token_entropy_by_source_sql(
    table: str = "documents",
    group_col: str = "source",
    text_expr: str = "text",
) -> str:
    toks = tokens_sql(text_expr)
    return f"""
    WITH tc AS (
        SELECT {group_col}, term, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT {group_col}, unnest({toks}) AS term FROM {table})
        GROUP BY {group_col}, term
    ),
    tot AS (
        SELECT {group_col}, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_vocab
        FROM tc GROUP BY {group_col}
    )
    SELECT {group_col}, n_tokens, n_vocab,
           round(-CAST(sum(CAST(round((CAST(c AS DOUBLE) / n_tokens)
                                      * ln(CAST(c AS DOUBLE) / n_tokens),
                                      {CORPUS_STAT_DP})
                               AS DECIMAL(20,{CORPUS_STAT_DP}))) AS DOUBLE), 6)
               AS entropy
    FROM tc JOIN tot USING ({group_col})
    GROUP BY {group_col}, n_tokens, n_vocab
    """


#: how many top-frequency terms the Zipf regression fits over
ZIPF_TOP_N = 100


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = ZIPF_TOP_N,
) -> DataFrame:
    """Least-squares fit of ``ln(freq) = intercept + slope·ln(rank)`` over
    the top-``top_n`` vocabulary terms — natural corpora track Zipf's law
    with slope ≈ −1; a collapsed or synthetic corpus bends away from it,
    which makes the slope a one-number data-health gauge.

    Output: one row (n_terms, slope, intercept).  Ranks are assigned by
    (freq desc, term asc) — fully deterministic.  Parity: the regression
    moments Σx, Σy, Σxy, Σx² accumulate as DECIMAL over 9-dp-rounded
    ln values (order-free exact sums); the closed-form solution then
    divides identical operands.  Scale: one explode + hash-agg, a top-N
    (TakeOrderedAndProject), and a 1-row reduction."""
    from pyspark.sql import Window as W

    counts = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("term"))
        .limit(top_n)
    )
    ranked = counts.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("c"), F.asc("term")))
    )
    dec = f"decimal(20,{CORPUS_STAT_DP})"
    x = F.round(F.log(F.col("rank").cast("double")), CORPUS_STAT_DP).cast(dec)
    y = F.round(F.log(F.col("c").cast("double")), CORPUS_STAT_DP).cast(dec)
    moments = ranked.select(
        x.alias("x"), y.alias("y")
    ).agg(
        F.count("*").alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return moments.select(
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


def zipf_fit_sql(
    table: str = "documents",
    text_expr: str = "text",
    top_n: int = ZIPF_TOP_N,
) -> str:
    toks = tokens_sql(text_expr)
    dp = CORPUS_STAT_DP
    return f"""
    WITH counts AS (
        SELECT term, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest({toks}) AS term FROM {table})
        GROUP BY term ORDER BY c DESC, term ASC LIMIT {top_n}
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rank FROM counts
    ),
    xy AS (
        SELECT CAST(round(ln(CAST(rank AS DOUBLE)), {dp}) AS DECIMAL(20,{dp})) AS x,
               CAST(round(ln(CAST(c AS DOUBLE)), {dp}) AS DECIMAL(20,{dp})) AS y
        FROM ranked
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * y) AS DOUBLE) AS sxy, CAST(sum(x * x) AS DOUBLE) AS sxx
        FROM xy
    )
    SELECT n_terms,
           round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6) AS slope,
           round((sy - ((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)) * sx)
                 / n_terms, 6) AS intercept
    FROM m
    """


def lang_confusion(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Confusion matrix of the declared language label against the
    marker-word language-ID guess — the label-QA report run before
    trusting either side for filtering.  Output: (declared_lang,
    detected_lang, n_docs).  Pure scan-side expression + one hash-agg."""
    return (
        lang_id(df, text_col=text_col, out_col="detected_lang")
        .groupBy(F.col(lang_col).alias("declared_lang"), "detected_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def lang_confusion_sql(
    table: str = "documents",
    lang_col: str = "lang",
    text_expr: str = "text",
) -> str:
    return f"""
    SELECT {lang_col} AS declared_lang,
           {lang_id_sql(text_expr)} AS detected_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM {table}
    GROUP BY 1, 2
    """


# --- filter funnel ----------------------------------------------------------

#: the default quality-gate cascade: (rule name, min tokens, max tokens,
#: stopword-ratio cap...) — thresholds shared by Spark and the SQL twin
FUNNEL_MIN_TOKENS = 10
FUNNEL_MAX_TOKENS = 5000
FUNNEL_MAX_STOP_RATIO = 0.5
FUNNEL_MAX_PUNCT_RATIO = 0.3


def _funnel_rules(text_col: str = "text") -> list[tuple[str, Column]]:
    """Ordered (rule, per-doc pass flag) cascade — each flag is a pure
    scan-side expression on the shared tokenizer/stat constants."""
    t = tokens(text_col)
    n_toks = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_chars = F.length(text_col)
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9 ]"))
    n_repl = _count_marker(F.col(text_col), REPLACEMENT_CHAR)
    block = F.array_intersect(
        F.array_distinct(tokens(F.lower(F.col(text_col)))),
        F.array(*[F.lit(x) for x in DEFAULT_BLOCKLIST]),
    )
    return [
        ("length", (n_toks >= FUNNEL_MIN_TOKENS) & (n_toks <= FUNNEL_MAX_TOKENS)),
        ("stopword_ratio", n_stop.cast("double") <= F.lit(FUNNEL_MAX_STOP_RATIO) * n_toks),
        ("punct_ratio", n_punct.cast("double") <= F.lit(FUNNEL_MAX_PUNCT_RATIO) * n_chars),
        ("encoding", n_repl == 0),
        ("blocklist", F.size(block) == 0),
    ]


def _funnel_rules_sql(text_expr: str = "text") -> list[tuple[str, str]]:
    toks = tokens_sql(text_expr)
    stop_arr = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    n_toks = f"len({toks})"
    n_stop = f"len(list_filter({toks}, x -> list_contains({stop_arr}, x)))"
    n_chars = f"length({text_expr})"
    n_punct = f"len(regexp_extract_all({text_expr}, '[^A-Za-z0-9 ]'))"
    n_repl = (
        f"((length({text_expr}) - length(replace({text_expr},"
        f" '{REPLACEMENT_CHAR}', ''))) / {len(REPLACEMENT_CHAR)})"
    )
    lst = "[" + ", ".join(f"'{x}'" for x in DEFAULT_BLOCKLIST) + "]"
    block = (
        f"len(list_filter(list_distinct({tokens_sql(f'lower({text_expr})')}),"
        f" t -> list_contains({lst}, t)))"
    )
    return [
        ("length", f"({n_toks} >= {FUNNEL_MIN_TOKENS} AND {n_toks} <= {FUNNEL_MAX_TOKENS})"),
        ("stopword_ratio", f"(CAST({n_stop} AS DOUBLE) <= {FUNNEL_MAX_STOP_RATIO} * {n_toks})"),
        ("punct_ratio", f"(CAST({n_punct} AS DOUBLE) <= {FUNNEL_MAX_PUNCT_RATIO} * {n_chars})"),
        ("encoding", f"({n_repl} = 0)"),
        ("blocklist", f"({block} = 0)"),
    ]


def filter_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The pipeline-audit funnel: how many documents survive each
    successive quality gate, and how many each rule alone removes.
    Output: (stage, rule, n_pass_cumulative, n_dropped_here) with stage 0
    = the unfiltered corpus.

    Every rule is a scan-side flag, so the whole funnel is ONE pass over
    the corpus collapsing to a 1-row aggregate, unpivoted executor-side —
    the report costs the same as a count(*) at any corpus size."""
    rules = _funnel_rules(text_col)
    aggs = [F.count(F.lit(1)).alias("__n0")]
    cum = F.lit(True)
    for i, (_, flag) in enumerate(rules, start=1):
        cum = cum & flag
        aggs.append(F.sum(cum.cast("long")).alias(f"__n{i}"))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(0).alias("stage"),
            F.lit("all").alias("rule"),
            F.col("__n0").alias("n_pass_cumulative"),
            F.lit(0).cast("long").alias("n_dropped_here"),
        )
    ]
    for i, (name, _) in enumerate(rules, start=1):
        rows.append(
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(name).alias("rule"),
                F.col(f"__n{i}").alias("n_pass_cumulative"),
                (F.col(f"__n{i-1}") - F.col(f"__n{i}")).alias("n_dropped_here"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def filter_funnel_sql(table: str = "documents", text_expr: str = "text") -> str:
    rules = _funnel_rules_sql(text_expr)
    aggs = ["CAST(count(*) AS BIGINT) AS n0"]
    cum = "TRUE"
    for i, (_, flag) in enumerate(rules, start=1):
        cum = f"{cum} AND {flag}"
        aggs.append(f"CAST(sum(CASE WHEN {cum} THEN 1 ELSE 0 END) AS BIGINT) AS n{i}")
    selects = [
        "SELECT 0 AS stage, 'all' AS rule, n0 AS n_pass_cumulative, CAST(0 AS BIGINT) AS n_dropped_here FROM wide"
    ]
    for i, (name, _) in enumerate(rules, start=1):
        selects.append(
            f"SELECT {i} AS stage, '{name}' AS rule, n{i} AS n_pass_cumulative,"
            f" n{i-1} - n{i} AS n_dropped_here FROM wide"
        )
    return (
        "WITH wide AS (SELECT " + ", ".join(aggs) + f" FROM {table})\n"
        + "\nUNION ALL\n".join(selects)
    )


# --- hybrid ranking: reciprocal rank fusion ---------------------------------

#: RRF smoothing constant (Cormack et al.'s standard k=60)
RRF_K = 60
RRF_TOP = 20


def hybrid_rank_rrf(
    df: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    top: int = RRF_TOP,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reciprocal rank fusion of two retrieval rankers (Cormack, Clarke &
    Büttcher, SIGIR 2009 — the standard hybrid-search combiner): BM25 and
    summed TF-IDF over the same query terms, fused as
    ``Σ_r 1/(rrf_k + rank_r)`` with a document missing from a ranker
    contributing nothing.  Output: top-``top`` docs
    (doc_id, bm25_rank, tfidf_rank, rrf_score).

    Scale shape: both rankers prune to the query-term postings scan-side,
    so every window/join below operates on the CANDIDATE set (bounded by
    the query's document frequency), never the corpus; the fusion itself
    is a full-outer join of two rank lists + one TakeOrderedAndProject.
    Ranks tie-break on (score desc, id asc); the two 1/(k+r) additions run
    in fixed written order — deterministic cross-engine."""
    from pyspark.sql import Window as W

    bm = bm25_scores(df, query_terms, id_col=id_col, text_col=text_col).select(
        id_col, "bm25"
    )
    r_bm = bm.withColumn(
        "bm25_rank",
        F.row_number().over(W.orderBy(F.desc("bm25"), F.asc(id_col))),
    ).select(id_col, "bm25_rank")

    ti = tf_idf(df, id_col=id_col, text_col=text_col).filter(
        F.col("term").isin(list(query_terms))
    )
    # fixed-order conditional sum — no float fold order to diverge
    score = None
    for t in sorted(query_terms):
        term_w = F.max(F.when(F.col("term") == t, F.col("weight")))
        piece = F.coalesce(term_w, F.lit(0.0))
        score = piece if score is None else score + piece
    ti_doc = ti.groupBy(id_col).agg(F.round(score, 8).alias("tiw"))
    r_ti = ti_doc.withColumn(
        "tfidf_rank",
        F.row_number().over(W.orderBy(F.desc("tiw"), F.asc(id_col))),
    ).select(id_col, "tfidf_rank")

    fused = r_bm.join(r_ti, id_col, "full_outer").select(
        id_col,
        "bm25_rank",
        "tfidf_rank",
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("tfidf_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(top)


def hybrid_rank_rrf_sql(
    table: str = "documents",
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    top: int = RRF_TOP,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`hybrid_rank_rrf` (same rankers, tie-breaks,
    fixed-order fusion arithmetic)."""
    bm = bm25_scores_sql(table=table, query_terms=query_terms, id_col=id_col, text_expr=text_expr)
    ti = tf_idf_sql(table=table, id_col=id_col, text_expr=text_expr)
    terms = sorted(query_terms)
    pieces = " + ".join(
        f"COALESCE(max(CASE WHEN term = '{t}' THEN weight END), 0.0)" for t in terms
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH bm AS ({bm}),
    r_bm AS (
        SELECT {id_col}, row_number() OVER (ORDER BY bm25 DESC, {id_col} ASC)
                   AS bm25_rank
        FROM bm
    ),
    ti AS ({ti}),
    ti_doc AS (
        SELECT {id_col}, round({pieces}, 8) AS tiw
        FROM ti WHERE term IN ({in_list}) GROUP BY {id_col}
    ),
    r_ti AS (
        SELECT {id_col}, row_number() OVER (ORDER BY tiw DESC, {id_col} ASC)
                   AS tfidf_rank
        FROM ti_doc
    )
    SELECT COALESCE(r_bm.{id_col}, r_ti.{id_col}) AS {id_col},
           bm25_rank, tfidf_rank,
           round(COALESCE(1.0 / ({rrf_k} + bm25_rank), 0.0)
                 + COALESCE(1.0 / ({rrf_k} + tfidf_rank), 0.0), 6) AS rrf_score
    FROM r_bm FULL OUTER JOIN r_ti USING ({id_col})
    ORDER BY rrf_score DESC, {id_col} ASC
    LIMIT {top}
    """
