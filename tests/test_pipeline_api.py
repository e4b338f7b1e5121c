"""CorpusPipeline: the composed training-data prep flow end-to-end."""

from __future__ import annotations

import pyspark.sql.functions as F

from cdc_lite_spark.pipeline import CorpusPipeline


def _docs(spark):
    # >= 20 tokens, no word above 1/8 of the total (passes the repetition
    # rule), contains stopwords (passes the stopword rule)
    dup = (
        "the quick brown fox jumps over a lazy dog while bright stars shine "
        "above silent hills and rivers flow gently toward distant blue seas"
    )
    return spark.createDataFrame(
        [
            (1, dup),
            (2, dup),  # exact duplicate of 1
            (3, dup + " extra"),  # near-duplicate of 1
            (4, "der hund und die katze und das haus und der baum und der"),  # German
            (5, "a a a a a a a a a a a a a a a a"),  # degenerate repetition
            (6, "contact me at alice@example.com or call 1234567 about this "
                "offer of a fine new house near the lake with its own dock "
                "plus garden view facing sunny southern slopes and old pines"),
        ],
        "doc_id long, text string",
    )


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "ready")
    pipe = (
        CorpusPipeline(_docs(spark))
        .redact_pii()
        .drop_exact_dups()
        .drop_near_dups(threshold=0.5)
        .filter_language({"en"})
        .filter_quality()
        .with_token_counts()
        .split({"train": 80, "val": 10, "test": 10})
    )
    pipe.write(out)
    got = spark.read.parquet(out)
    ids = {r.doc_id for r in got.select("doc_id").collect()}
    # 2 (exact dup) and 3 (near dup) collapse into 1; 4 is German; 5 is
    # degenerate; 1 and 6 survive
    assert ids == {1, 6}
    row6 = got.filter("doc_id = 6").first()
    assert "<EMAIL>" in row6.text and "<NUM>" in row6.text
    assert set(got.columns) >= {"doc_id", "text", "n_tokens", "n_subwords", "split"}
    assert got.filter(F.col("split").isin("train", "val", "test")).count() == 2


def test_pipeline_steps_are_immutable(spark):
    base = CorpusPipeline(_docs(spark))
    sampled = base.sample(50)
    assert base.count() == 6  # base unchanged by deriving sampled
    assert sampled.count() <= 6


def test_pipeline_is_lazy_single_plan(spark):
    """Column-expression steps stay one declarative plan (no action runs)."""
    pipe = CorpusPipeline(_docs(spark)).redact_pii().normalize().with_token_counts()
    # reaching .df triggers no job; the plan compiles and explains fine
    plan = pipe.df._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" in plan or "LogicalRDD" in plan


def test_pipeline_filter_encoding_and_drop_contained(spark):
    from cdc_lite_spark.pipeline import CorpusPipeline

    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, quote),  # contained inside doc 3 -> dropped by drop_contained
            (2, "bad bytes � here"),  # decode artifact -> dropped by filter_encoding
            (3, "prefix words " + quote + " suffix words trailing tail"),
            (4, "a perfectly ordinary clean document with many plain words"),
        ],
        "doc_id long, text string",
    )
    out = (
        CorpusPipeline(docs)
        .filter_encoding()
        .drop_contained(threshold=0.9)
        .df
    )
    # drop_contained only sees LSH candidates; force the pair through the
    # direct operator too for the pinned semantics
    ids = {r["doc_id"] for r in out.collect()}
    assert 2 not in ids  # encoding artifact gone
    assert 4 in ids and 3 in ids

    from cdc_lite_spark.operators.dedup import containment_verify

    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    cont = containment_verify(docs, pairs, threshold=0.9).collect()
    assert cont and cont[0]["contained_id"] == 1


def test_pipeline_drop_heavily_duplicated_and_fingerprints(spark):
    p = CorpusPipeline(_docs(spark))
    # docs 1/2/3 share almost all n-grams → dup_fraction near 1; the
    # unique docs survive a 0.8 gate
    kept = {r["doc_id"] for r in p.drop_heavily_duplicated(0.8).df.collect()}
    assert {4, 5, 6} <= kept
    assert 1 not in kept and 2 not in kept

    fp = p.with_fingerprints().df
    assert {"n_fingerprints", "density", "fp_checksum"} <= set(fp.columns)
    rows = {r["doc_id"]: r for r in fp.collect()}
    assert rows[1]["fp_checksum"] == rows[2]["fp_checksum"]  # identical docs
    assert rows[1]["fp_checksum"] != rows[4]["fp_checksum"]


def test_pipeline_leakage_safe_split(spark):
    p = CorpusPipeline(_docs(spark)).split(leakage_safe=True)
    rows = {r["doc_id"]: r["split"] for r in p.df.collect()}
    # docs 1/2/3 are near-dups of each other → identical split
    assert rows[1] == rows[2] == rows[3]
    assert set(rows) == {1, 2, 3, 4, 5, 6}


def test_pipeline_blocklist_weighted_sample_and_layout(spark, tmp_path):
    import glob

    docs = _docs(spark).withColumn("n_chars", F.length("text"))
    p = CorpusPipeline(docs)

    # doc 6 contains "offer" — blocklist it; others survive
    kept = p.drop_blocklisted(terms=("offer",)).df
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 6 not in ids and {1, 2, 3, 4, 5} <= ids

    # weighted sample is deterministic and honors k
    s1 = {r["doc_id"] for r in p.sample_weighted("n_chars", 3).df.collect()}
    s2 = {r["doc_id"] for r in p.sample_weighted("n_chars", 3).df.collect()}
    assert s1 == s2 and len(s1) == 3

    # layout write: one dir per language partition, round-trip intact
    out = str(tmp_path / "laid_out")
    langs = p.df.withColumn("lang_tag", (F.col("doc_id") % 2).cast("int"))
    CorpusPipeline(langs).write_layout(out, ["lang_tag"], sort_by=["doc_id"])
    assert len(glob.glob(f"{out}/lang_tag=*")) == 2
    assert spark.read.parquet(out).count() == docs.count()


def test_pipeline_dsir_and_profile(spark):
    docs = _docs(spark)
    p = CorpusPipeline(docs)

    # steer toward the German doc: k=2 keeps it (plus one more)
    target = docs.filter(F.col("doc_id") == 4)
    kept = {r["doc_id"] for r in p.sample_dsir(target, 2).df.collect()}
    assert len(kept) == 2 and 4 in kept

    prof = {r["col_name"]: r for r in p.profile().collect()}
    assert prof["doc_id"]["n_distinct"] == docs.count()
    assert prof["text"]["n_nulls"] == 0 and prof["text"]["min_str"] is not None
