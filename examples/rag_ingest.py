"""End-to-end RAG ingest on the bundled testdata, runnable:

    python examples/rag_ingest.py [sf_dir]

Chunks documents, embeds each chunk with the integer-exact feature-hash
vectorizer (the model-call stand-in whose Spark plumbing is the real
deliverable), answers sparse cosine top-k for a probe set, and then
demonstrates the CDC tie-in: retrieval statistics (per-term df / corpus N)
maintained incrementally from document change records instead of
recomputing over the corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_lite_spark.operators.incremental import apply_text_delta, dfreq_state
from cdc_lite_spark.operators.similarity import (
    chunk_docs,
    feature_hash_embed,
    rag_chunk_topk,
)
from cdc_lite_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("rag_ingest", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    chunks = chunk_docs(docs)
    sparse = feature_hash_embed(chunks)
    print(
        f"chunked {docs.count()} docs -> {chunks.count()} chunks -> "
        f"{sparse.count()} sparse postings"
    )

    print("\nsparse cosine top-5 for the probe chunks:")
    rag_chunk_topk(docs).orderBy("q_doc", "rank").show(15, truncate=False)

    # CDC tie-in: keep df/N current by folding change records
    state = dfreq_state(docs)
    changes = spark.createDataFrame(
        [
            ("INSERT", 100000, "fresh spark document arriving now", None),
            ("DELETE", 0, None, docs.filter(F.col("doc_id") == 0).first()["text"]),
        ],
        "operation string, doc_id long, text string, prev_text string",
    )
    maintained = apply_text_delta(state, changes)
    n = maintained.agg(F.max("n_docs")).first()[0]
    print(f"\nmaintained index stats after +1/-1 docs: corpus N = {n}")
    maintained.orderBy(F.desc("df_count")).show(5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
