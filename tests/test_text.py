"""Text-analysis operator semantics (SURVEY.md §2j X4)."""

from __future__ import annotations

from cdc_lite_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    text_stats,
    token_counts,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark):
    df = _df(spark, [(1, "hello world42 x!"), (2, ""), (3, "a  b   c")])
    out = {r["doc_id"]: r for r in token_counts(df).collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["n_subwords"] == 5  # hello / world / 42 / x / !
    assert out[2]["n_tokens"] == 0
    assert out[3]["n_tokens"] == 3  # double spaces don't create tokens


def test_lang_id_markers(spark):
    df = _df(
        spark,
        [
            (1, "the cat and the dog"),
            (2, "der hund und die katze ist"),
            (3, "el perro y los gatos es"),
            (4, "xyzzy plugh quux"),
        ],
    )
    out = {r["doc_id"]: r["lang_guess"] for r in lang_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_text_stats_ratios(spark):
    df = _df(spark, [(1, "the cat sat on the mat today ok"), (2, "")])
    out = {r["doc_id"]: r for r in text_stats(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 8
    assert abs(r1["stopword_ratio"] - 3 / 8) < 1e-12  # the, on, the
    assert r1["punct_ratio"] == 0.0
    assert r1["quality_score"] == 1.0
    r2 = out[2]
    assert r2["n_tokens"] == 0 and r2["quality_score"] == 0.0


def test_fingerprint_order_sensitive(spark):
    df = _df(spark, [(1, "a b c"), (2, "c b a"), (3, "a b c")])
    out = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert out[1] == out[3]  # deterministic
    assert out[1] != out[2]  # order matters (unlike the C3 table checksum)


def test_encoding_stats_detects_artifacts(spark):
    """Synthetic mojibake/control/replacement payloads — the documents
    testdata is clean, so dirty inputs are pinned here."""
    from cdc_lite_spark.operators.text import encoding_stats

    docs = spark.createDataFrame(
        [
            (1, "perfectly clean ascii text"),
            (2, "bad bytes � here �"),
            (3, "mojibake: donâ€™t and cafÃ© and Â nbsp"),
            (4, "control\x07char"),
            (5, "naturally accented: café déjà vu"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in encoding_stats(docs).collect()}
    assert out[1]["clean_encoding"] == 1 and out[1]["non_ascii_ratio"] == 0.0
    assert out[2]["n_replacement"] == 2 and out[2]["clean_encoding"] == 0
    assert out[3]["mojibake_hits"] >= 3 and out[3]["clean_encoding"] == 0
    assert out[4]["n_control"] == 1 and out[4]["clean_encoding"] == 0
    # genuine non-ASCII is NOT mojibake: flagged by ratio, still clean
    assert out[5]["clean_encoding"] == 1 and out[5]["non_ascii_ratio"] > 0


def test_bpe_pair_counts_weighted_by_occurrence(spark):
    from cdc_lite_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab x")], "doc_id long, text string"
    )
    out = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(docs).collect()}
    assert out["ab"] == 3  # 'ab' occurs 3 times corpus-wide
    assert out["cd"] == 1
    assert "x" not in out  # single-char words contribute no pair


def _bpe_reference(word_counts, n_merges):
    """Pure-Python BPE reference (greedy left-to-right merge, ties by
    lexicographic pair) to pin the distributed trainer."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), _ = best
        merges.append((rank, l, r, l + r))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    from cdc_lite_spark.operators.text import bpe_train, bpe_train_merges

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "wide wider widest"),
        ],
        "doc_id long, text string",
    )
    merges_df, vocab = bpe_train(docs, n_merges=6)
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    # the executor-local fast path learns the identical rules
    local = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"])
        for r in bpe_train_merges(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    assert local == got
    wc = {}
    for t in ["low lower lowest low low", "new newer newest new", "wide wider widest"]:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    expect = _bpe_reference(wc, 6)
    assert got == expect
    # greedy-run semantics: 'a a a a' merges into two 'aa', not one
    runs = spark.createDataFrame([(1, "aaaa aaaa aaaa")], "doc_id long, text string")
    m, v = bpe_train(runs, n_merges=1)
    syms = v.collect()[0]["syms"]
    assert syms == ["aa", "aa"]


def test_bpe_token_counts_matches_reference_segmentation(spark):
    from cdc_lite_spark.operators.text import bpe_token_counts

    texts = {
        1: "low lower lowest low low",
        2: "new newer newest new",
        3: "wide wider widest",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_token_counts(docs, n_merges=6).collect()}

    wc = {}
    for t in texts.values():
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    merges = _bpe_reference(wc, 6)

    def segment(word):
        syms = list(word)
        for _, l, r, m in merges:
            out_s = []
            for x in syms:
                if out_s and out_s[-1] == l and x == r:
                    out_s[-1] = m
                else:
                    out_s.append(x)
            syms = out_s
        return syms

    for doc_id, t in texts.items():
        expect = sum(len(segment(w)) for w in t.split())
        assert out[doc_id]["n_bpe_tokens"] == expect
        assert out[doc_id]["n_words"] == len(t.split())


def test_bm25_matches_hand_computation(spark):
    import math

    from cdc_lite_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark spark query engine"),
            (2, "spark alone here with padding words making it longer"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, ("spark", "query")).collect()}
    assert 3 not in out  # no matching terms, no row
    assert out[1]["n_matched_terms"] == 2 and out[2]["n_matched_terms"] == 1

    def bm25(tf, dfc, dl, n=3, avgdl=(4 + 9 + 4) / 3, k1=1.2, b=0.75):
        idf = math.log(1 + (n - dfc + 0.5) / (dfc + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    expect1 = round(bm25(2, 2, 4) + bm25(1, 1, 4), 6)
    expect2 = round(bm25(1, 2, 9), 6)
    assert abs(out[1]["bm25"] - expect1) < 1e-6
    assert abs(out[2]["bm25"] - expect2) < 1e-6
    assert out[1]["bm25"] > out[2]["bm25"]


def test_bpe_size_gate_falls_back_to_dataframe_path(spark, monkeypatch):
    """Above BPE_LOCAL_MAX_VOCAB the executor-local loop must yield to the
    per-iteration DataFrame trainer — pinned by forcing the gate to 0 and
    asserting identical merges from both paths."""
    import cdc_lite_spark.operators.text as textmod

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string",
    )
    fast = [
        tuple(r) for r in textmod.bpe_train_merges(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    monkeypatch.setattr(textmod, "BPE_LOCAL_MAX_VOCAB", 0)
    gated = [
        tuple(r) for r in textmod.bpe_train_merges(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    assert gated == fast
    seg = textmod.bpe_vocab_segmentation(docs, n_merges=4)
    assert {"word", "n_occ", "pieces"} == set(seg.columns)
    assert seg.count() > 0


# --- blocklist policy filtering --------------------------------------------


def test_blocklist_hits_term_level_matching(spark):
    from cdc_lite_spark.operators.text import blocklist_hits

    df = spark.createDataFrame(
        [
            (1, "the Quarterly report flagged an anomaly in the anomaly log"),
            (2, "shipment of quarterlyish goods"),  # substring must NOT hit
            (3, "clean text with nothing listed"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in blocklist_hits(df).collect()}
    assert rows[1]["hit_terms"] == ["anomaly", "quarterly"]  # distinct + sorted
    assert rows[1]["n_hit_terms"] == 2 and rows[1]["keep"] == 0
    assert rows[2]["hit_terms"] == [] and rows[2]["keep"] == 1
    assert rows[3]["keep"] == 1
    assert rows[4]["hit_terms"] == [] and rows[4]["keep"] == 1


def test_phrase_pmi_independent_vs_collocated(spark):
    """A perfectly collocated pair scores ln(N·c_ab/(c_a·c_b)) higher than
    a pair whose members mix freely with other partners (the actual
    independence PMI penalizes), and sub-threshold pairs are dropped."""
    import math

    from cdc_lite_spark.operators.text import phrase_pmi

    rows = []
    did = 0
    # a/d each pair with b/c equally (uncorrelated block), e-f collocates
    for left in ("a", "d"):
        for right in ("b", "c"):
            for _ in range(5):
                rows.append((did, f"{left} {right}")); did += 1
    for _ in range(10):
        rows.append((did, "e f")); did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["a"], r["b"]): r["pmi"] for r in phrase_pmi(docs, min_count=5).collect()}
    # N=30 pairs; (e,f): 10·30/(10·10)=3 ; (a,b): 5·30/(10·10)=1.5
    assert abs(out[("e", "f")] - round(math.log(3.0), 6)) < 1e-9
    assert abs(out[("a", "b")] - round(math.log(1.5), 6)) < 1e-9
    assert out[("e", "f")] > out[("a", "b")]


def test_token_entropy_uniform_is_log_v(spark):
    """A source with a perfectly uniform token distribution has entropy
    exactly ln(V)."""
    import math

    from cdc_lite_spark.operators.text import token_entropy_by_source

    docs = spark.createDataFrame(
        [(1, "a b c d", "u"), (2, "a a a a", "skew")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in token_entropy_by_source(docs).collect()}
    assert abs(out["u"]["entropy"] - round(math.log(4), 6)) < 1e-6
    assert out["skew"]["entropy"] == 0.0
    assert out["u"]["n_vocab"] == 4 and out["skew"]["n_vocab"] == 1


def test_zipf_fit_exact_power_law(spark):
    """freq(r) = C·r^s exactly -> regression recovers s (here -1)."""
    from cdc_lite_spark.operators.text import zipf_fit

    # build a corpus where term_i appears round(1200/i) times
    rows = []
    did = 0
    for i in range(1, 21):
        for _ in range(1200 // i):
            rows.append((did, f"t{i:02d}"))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = zipf_fit(docs, top_n=20).collect()[0]
    assert r["n_terms"] == 20
    assert abs(r["slope"] + 1.0) < 0.02  # integer rounding of counts only


def test_lang_confusion_diagonal(spark):
    """Docs written with a language's own marker words land on the
    diagonal; marker-free docs detect as 'und'."""
    from cdc_lite_spark.operators.text import lang_confusion

    docs = spark.createDataFrame(
        [
            (1, "the cat of the house", "en"),
            (2, "der hund und die katze", "de"),
            (3, "zzz qqq", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {(r["declared_lang"], r["detected_lang"]): r["n_docs"] for r in lang_confusion(docs).collect()}
    assert out[("en", "en")] == 1 and out[("de", "de")] == 1 and out[("en", "und")] == 1


def test_filter_funnel_monotone_and_attributed(spark):
    """Cumulative pass counts are non-increasing, drops sum to the funnel
    total, and a doc failing exactly one rule is attributed to it."""
    from cdc_lite_spark.operators.text import filter_funnel

    good = "spark table query join window " * 4  # 20 tokens, clean
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "too short"),                     # fails length
            (3, good + "deprecated checksum"),    # fails blocklist only
            (4, good.replace(" ", "!!!! ")),      # punct-heavy (ratio 0.4)
        ],
        "doc_id long, text string",
    )
    rows = {r["rule"]: r for r in filter_funnel(docs).collect()}
    assert rows["all"]["n_pass_cumulative"] == 4
    vals = [r["n_pass_cumulative"] for r in sorted(rows.values(), key=lambda r: r["stage"])]
    assert vals == sorted(vals, reverse=True)
    assert rows["length"]["n_dropped_here"] == 1
    assert rows["punct_ratio"]["n_dropped_here"] == 1
    assert rows["blocklist"]["n_dropped_here"] == 1
    assert vals[-1] == 1  # only the clean doc survives


def test_hybrid_rrf_fuses_both_rankers(spark):
    """A doc top-ranked by both rankers outscores one present in only one
    list, and the score is exactly the two reciprocal terms."""
    from cdc_lite_spark.operators.text import hybrid_rank_rrf

    docs = spark.createDataFrame(
        [
            (1, "spark query table spark query table"),  # strong for both
            (2, "spark alone here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in hybrid_rank_rrf(docs, top=5).collect()}
    assert 3 not in out  # matches no query term -> in neither list
    assert out[1]["rrf_score"] > out[2]["rrf_score"]
    r = out[1]
    assert abs(
        r["rrf_score"]
        - round(1.0 / (60 + r["bm25_rank"]) + 1.0 / (60 + r["tfidf_rank"]), 6)
    ) < 1e-9
