"""cdc_lite_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TomKlimovski/cdc-lite, rebuilt Spark-first.

The reference (/root/reference, single Go file pkg/duckdb/duckdb_cdc.go) is a
DuckDB change-data-capture poller: fingerprint tables, detect drift, emit JSONL
change records.  This package re-expresses those semantics as declarative
DataFrame plans (Catalyst optimizes; Tungsten executes), extends them with the
relational surface the oracle harness checks (joins, windows, aggregates), and
adds LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout:
    session     — SparkSession factory tuned for the harness
    envelope    — the CDC change-record envelope (B3/B4 in SURVEY.md §2)
    engine      — CdcEngine facade (snapshot / checksum / diff / monitor)
    operators/  — checksum, diff, latest-per-key, top-k, event windows,
                  dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard),
                  similarity (cosine top-k, sign-LSH ANN), text analysis,
                  multimodal plumbing
    sources/    — table loaders, change-log batch+stream source
    functions/  — engine-portable hash/canonicalization expressions (shared
                  with the DuckDB oracle SQL so both engines hash identical
                  bytes; SURVEY.md §7.4)
    streaming/  — structured-streaming monitor loop (poll → detect → emit)
"""

from cdc_lite_spark.engine import CdcEngine

__all__ = ["CdcEngine"]
__version__ = "0.1.0"
