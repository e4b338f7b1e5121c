"""End-to-end corpus preparation on the bundled testdata — the README
pipeline, runnable:

    python examples/corpus_prep.py [sf_dir] [out_dir]

Reads documents.parquet, runs encoding gate → PII redaction → exact +
near-dup removal → heavy-duplication gate → language filter → quality
filter → fingerprints + token counts → train/val/test split, writes the
prepared corpus as parquet partitioned by split, and prints a per-stage
row-count funnel plus a BPE token budget.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_lite_spark.pipeline import CorpusPipeline
from cdc_lite_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_ready"
    spark = get_spark("corpus_prep", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    funnel = [("input", docs.count())]

    p = CorpusPipeline(docs).filter_encoding().redact_pii()
    funnel.append(("encoding gate", p.count()))
    p = p.drop_exact_dups().drop_near_dups(threshold=0.8).drop_contained()
    funnel.append(("dedup", p.count()))
    p = p.drop_heavily_duplicated(max_fraction=0.95)
    funnel.append(("dup-ngram gate", p.count()))
    p = p.filter_language({"en"}).filter_quality()
    funnel.append(("language+quality", p.count()))
    p = p.drop_blocklisted()
    funnel.append(("blocklist gate", p.count()))
    p = p.with_fingerprints().with_token_counts().split()

    for stage, n in funnel:
        print(f"{stage:>18}: {n} docs")

    from cdc_lite_spark.operators.text import bpe_token_counts

    budget = bpe_token_counts(p.df).agg({"n_bpe_tokens": "sum"}).collect()[0][0]
    print(f"{'BPE token budget':>18}: {budget}")

    p.write(out_dir, partition_by="split")
    print(f"{'written':>18}: {out_dir} (partitioned by split)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
