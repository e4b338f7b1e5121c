"""Fluent corpus-pipeline API: compose the training-data operators into one
lazy plan.

    from cdc_lite_spark.pipeline import CorpusPipeline

    (CorpusPipeline(docs)
        .redact_pii()
        .drop_exact_dups()
        .drop_near_dups(threshold=0.8)
        .filter_language({"en"})
        .filter_quality()
        .with_token_counts()
        .split({"train": 98, "val": 1, "test": 1})
        .write("/data/corpus_ready"))

Every step appends to ONE DataFrame plan — nothing executes until
``write``/``df``/``count`` — so Catalyst optimizes across step boundaries
(e.g. the language filter pushes below the PII regex, column pruning drops
intermediate features).  The exceptions are the near-dup steps, which run
the LSH pipeline (a genuine multi-pass computation) when invoked.

Steps are immutable: each returns a new ``CorpusPipeline``, so partial
pipelines can be shared/forked without aliasing surprises.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CorpusPipeline:
    _df: DataFrame
    id_col: str = "doc_id"
    text_col: str = "text"

    # -- access ------------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def count(self) -> int:
        return self._df.count()

    def write(self, path: str, format: str = "parquet", partition_by: str | None = None):
        w = self._df.write.format(format).mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.save(path)
        return self

    def _with(self, df: DataFrame) -> CorpusPipeline:
        return replace(self, _df=df)

    # -- cleaning ----------------------------------------------------------
    def redact_pii(self) -> CorpusPipeline:
        """Scrub emails and long digit runs in place (text column rewrite)."""
        email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
        scrubbed = F.regexp_replace(
            F.regexp_replace(F.col(self.text_col), email, "<EMAIL>"),
            "[0-9]{6,}",
            "<NUM>",
        )
        return self._with(self._df.withColumn(self.text_col, scrubbed))

    def normalize(self) -> CorpusPipeline:
        """Lowercase, strip non-alphanumerics, collapse whitespace."""
        norm = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(self.text_col)), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        )
        return self._with(self._df.withColumn(self.text_col, norm))

    # -- dedup -------------------------------------------------------------
    def drop_exact_dups(self) -> CorpusPipeline:
        """Keep the minimum-id document per identical text (deterministic
        canonical survivor; one hash-agg shuffle on the content hash)."""
        from cdc_lite_spark.functions.hashes import portable_hash64

        h = portable_hash64(F.col(self.text_col))
        w_min = (
            self._df.select(F.col(self.id_col), h.alias("__h"))
            .groupBy("__h")
            .agg(F.min(self.id_col).alias(self.id_col))
        )
        return self._with(self._df.join(w_min, self.id_col, "left_semi"))

    def drop_near_dups(self, threshold: float = 0.5) -> CorpusPipeline:
        """MinHash-LSH near-dup clustering; keep each cluster's minimum-id
        head.  Runs the LSH pipeline (multi-pass) at call time."""
        from cdc_lite_spark.operators.dedup import (
            dedup_clusters,
            jaccard_verify,
            lsh_candidate_pairs,
            minhash_signatures,
        )

        sig = minhash_signatures(self._df, id_col=self.id_col, text_col=self.text_col)
        cands = lsh_candidate_pairs(sig, id_col=self.id_col)
        pairs = jaccard_verify(
            self._df, cands, id_col=self.id_col, text_col=self.text_col,
            threshold=threshold,
        )
        clusters = dedup_clusters(pairs)
        losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(self.id_col)
        )
        return self._with(self._df.join(losers, self.id_col, "left_anti"))

    def drop_contained(self, threshold: float = 0.9) -> CorpusPipeline:
        """Drop documents substantially CONTAINED in another (asymmetric
        containment on LSH candidates — catches subset duplication that
        Jaccard under-scores; the longer document survives)."""
        from cdc_lite_spark.operators.dedup import (
            containment_verify,
            lsh_candidate_pairs,
            minhash_signatures,
        )

        sig = minhash_signatures(self._df, id_col=self.id_col, text_col=self.text_col)
        cands = lsh_candidate_pairs(sig, id_col=self.id_col)
        contained = containment_verify(
            self._df, cands, id_col=self.id_col, text_col=self.text_col,
            threshold=threshold,
        ).select(F.col("contained_id").alias(self.id_col))
        return self._with(self._df.join(contained, self.id_col, "left_anti"))

    # -- filtering ---------------------------------------------------------
    def filter_encoding(self) -> CorpusPipeline:
        """Drop documents with decode artifacts (replacement chars, C0
        controls, mojibake) — the cheap gate that runs before any
        model-based quality filter."""
        from cdc_lite_spark.operators.text import encoding_stats

        clean = encoding_stats(self._df, text_col=self.text_col).filter(
            F.col("clean_encoding") == 1
        ).select(self.id_col)
        return self._with(self._df.join(clean, self.id_col, "left_semi"))

    def filter_language(self, langs: set[str]) -> CorpusPipeline:
        """Keep documents whose heuristic language-ID is in ``langs``."""
        from cdc_lite_spark.operators.text import lang_id

        tagged = lang_id(self._df, text_col=self.text_col, out_col="__lang")
        return self._with(
            tagged.filter(F.col("__lang").isin(*sorted(langs))).drop("__lang")
        )

    def filter_quality(self) -> CorpusPipeline:
        """Apply the rule-based boilerplate filter (keep verdicts only)."""
        from cdc_lite_spark.operators.quality import boilerplate_filter

        verdicts = boilerplate_filter(
            self._df, text_col=self.text_col, id_col=self.id_col
        )
        keep = verdicts.filter(F.col("verdict") == "keep").select(self.id_col)
        return self._with(self._df.join(keep, self.id_col, "left_semi"))

    # -- enrichment / selection --------------------------------------------
    def with_token_counts(self) -> CorpusPipeline:
        from cdc_lite_spark.operators.text import token_counts

        return self._with(token_counts(self._df, text_col=self.text_col))

    def sample(self, percent: int) -> CorpusPipeline:
        """Deterministic hash-Bernoulli sample (stable across runs/growth)."""
        from cdc_lite_spark.operators.sampling import hash_sample

        return self._with(hash_sample(self._df, self.id_col, percent))

    def split(
        self, weights: dict[str, int] | None = None, leakage_safe: bool = False
    ) -> CorpusPipeline:
        """Add a stable train/val/test column keyed on the id hash.

        ``leakage_safe=True`` keys the hash on the near-dup CLUSTER id
        instead, so near-duplicates can never straddle splits (use when
        the pipeline did NOT already drop near-dups upstream)."""
        from cdc_lite_spark.operators.sampling import dataset_split, leakage_safe_split

        if leakage_safe:
            assign = leakage_safe_split(
                self._df, id_col=self.id_col, text_col=self.text_col, weights=weights
            ).select(self.id_col, "split")
            return self._with(self._df.join(assign, self.id_col))
        return self._with(dataset_split(self._df, self.id_col, weights))

    def drop_heavily_duplicated(self, max_fraction: float = 0.8) -> CorpusPipeline:
        """Drop documents whose corpus-duplicated n-gram fraction exceeds
        ``max_fraction`` (Lee et al. ACL 2022 — heavily-copied documents
        are removed outright rather than pairwise-deduped)."""
        from cdc_lite_spark.operators.dedup import dup_ngram_coverage

        cov = dup_ngram_coverage(self._df, id_col=self.id_col, text_col=self.text_col)
        keep = cov.filter(F.col("dup_fraction") <= max_fraction).select(self.id_col)
        return self._with(self._df.join(keep, self.id_col, "left_semi"))

    def with_fingerprints(self) -> CorpusPipeline:
        """Attach winnowing fingerprint summary columns (n_fingerprints,
        density, fp_checksum) — the sketch an overlap index shuffles in
        place of the full shingle stream."""
        from cdc_lite_spark.operators.dedup import winnowing_summary

        fp = winnowing_summary(self._df, id_col=self.id_col, text_col=self.text_col)
        return self._with(self._df.join(fp.drop("n_shingles"), self.id_col))

    def drop_blocklisted(self, terms: tuple[str, ...] | None = None) -> CorpusPipeline:
        """Drop documents containing any blocklist term (term-level match on
        the shared tokenizer — see operators/text.py:blocklist_hits)."""
        from cdc_lite_spark.operators.text import DEFAULT_BLOCKLIST, blocklist_hits

        verdicts = blocklist_hits(
            self._df, terms or DEFAULT_BLOCKLIST, id_col=self.id_col, text_col=self.text_col
        )
        keep = verdicts.filter(F.col("keep") == 1).select(self.id_col)
        return self._with(self._df.join(keep, self.id_col, "left_semi"))

    def sample_weighted(self, weight_col: str, k: int) -> CorpusPipeline:
        """Deterministic weighted sample without replacement (Efraimidis-
        Spirakis race on the id hash) — e.g. length- or quality-weighted
        corpus downsampling that is reproducible across runs and engines."""
        from cdc_lite_spark.operators.sampling import weighted_sample

        return self._with(weighted_sample(self._df, self.id_col, weight_col, k))

    def write_layout(
        self,
        path: str,
        partition_by: list[str],
        sort_by: list[str] | None = None,
    ) -> None:
        """Persist with the data-skipping layout (directory partitioning +
        sorted row groups — operators/layout.py)."""
        from cdc_lite_spark.operators.layout import write_partitioned

        write_partitioned(self._df, path, partition_by, sort_by)

    def sample_dsir(self, target: DataFrame, k: int) -> CorpusPipeline:
        """Keep the k documents most resembling ``target`` (DSIR importance
        resampling, operators/lm.py) — e.g. steer a raw crawl toward a
        curated reference corpus."""
        from cdc_lite_spark.operators.lm import dsir_sample

        keep = dsir_sample(
            self._df, target, k, id_col=self.id_col, text_col=self.text_col
        ).select(self.id_col)
        return self._with(self._df.join(F.broadcast(keep), self.id_col, "left_semi"))

    def profile(self) -> DataFrame:
        """One-pass ANALYZE-style per-column statistics of the current
        corpus (operators/profile.py) — a terminal observer, not a stage."""
        from cdc_lite_spark.operators.profile import column_stats

        return column_stats(self._df)
