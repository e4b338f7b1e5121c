"""Measured scaling probe: do the headline plans actually scale?

Replicates the sf0.1 FACT tables xN into /tmp with shifted primary keys
(dimension tables stay x1 — the realistic 100 TB shape: facts grow, dims
don't), then times the headline queries at x1 and xN.  The point is
evidence, not simulation: a plan whose wall time grows ~linearly in fact
rows on local[32] is shuffle/agg-bound the same way it will be on 1000
executors; one that grows super-linearly has a hidden all-pairs or
unbounded-state term the small-SF bench can't see.

Replica construction details that keep the queries MEANINGFUL at xN:
- orders/lineitem: shift o_orderkey/l_orderkey per replica (join keys
  still line up replica-internally); customer/supplier/part FKs unchanged
  so star joins hit the same x1 dims.
- events: shift event_id; user_id unchanged (bounded user population —
  windows get deeper per key, the hard direction).
- documents: shift doc_id AND tag the text with the replica index —
  otherwise every doc has N-1 byte-identical copies and the LSH probe
  measures the degenerate-bucket cap instead of realistic growth.
- embeddings: shift id, keep vectors (top-k over x10 corpus).

Usage: python scripts/scale_probe.py [N] [query ...]   (default 10, all
headline queries; name queries to probe a subset — e.g. a second scale
point on just the steepest plans)
Appends nothing; prints a markdown table to stdout for SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_lite_spark.queries import REGISTRY
from cdc_lite_spark.session import get_spark
from cdc_lite_spark.sources.tables import DEFAULT_SF_DIR, TABLES, load_table

SRC = DEFAULT_SF_DIR
WORK = "/tmp/scale_probe"

#: fact table -> (id columns to shift, text column to tag or None)
FACTS = {
    "orders": (["o_orderkey"], None),
    "lineitem": (["l_orderkey"], None),
    "events": (["event_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}

QUERIES = [
    "pricing_summary",        # scan + hash agg (lineitem)
    "revenue_by_nation",      # star join, broadcast dims
    "cdc_table_checksums",    # full-table fingerprints
    "latest_event_per_user",  # top-1 per key window
    "sessionization",         # gap windows over deep per-user history
    "topk_orders_per_customer",  # WindowGroupLimit top-k
    "near_dup_pairs_lsh",     # MinHash/LSH dedup
    "cosine_topk_bruteforce", # similarity scan
    "exact_dedup_docs",       # hash-groupBy dedup
    "near_dup_clusters",      # CC over LSH pairs (r4 size-gated union-find)
    "containment_pairs",      # r4 asymmetric containment verify
    "cdc_replay_reconstruction",  # diff + fold (r4 fast-hash + ckpt)
    "dup_ngram_coverage",     # r4 corpus n-gram DF (count window, 1 shingle pass)
    "winnow_overlap_pairs",   # r4 sketch self-join (checkpointed, fp cap)
    "pq_encode",              # r4 broadcast-codebook argmin
    "bm25_scores",            # r4 pruned postings + broadcast stats
    "incremental_gram_novelty",  # r4 O(batch) vs maintained state
    "forecast_revenue_change",   # r4 Q6: pure scan pushdown agg
    "order_priority_exists",     # r4 Q4: fact-fact semi join + residual
    "market_share",              # r4 Q8: snowflake dims + two fact shuffles
    "large_volume_customers",    # r4 Q18: agg-then-join tail
    "sketch_distinct_rollup",    # r4 HLL sketch state build + merge rollup
    "blocklist_filter_docs",     # r4 scan-side policy filter
    "weighted_sample_docs",      # r4 A-ES race + global top-k heads
]


def build_replica(spark, n: int) -> str:
    out = f"{WORK}/x{n}"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        # per-table resume marker: a crashed build leaves a partial dir, so
        # "directory exists" is not "table written"
        if os.path.exists(f"{out}/{t}.parquet/_SUCCESS"):
            continue
        df = load_table(spark, SRC, t)
        if t in FACTS and n > 1:
            ids, text_col = FACTS[t]
            shift = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in ids}
            parts = []
            for i in range(n):
                rep = df
                for c in ids:
                    rep = rep.withColumn(c, F.col(c) + F.lit(i * shift[c]))
                if text_col is not None and i > 0:
                    rep = rep.withColumn(
                        text_col, F.concat(F.lit(f"r{i} "), F.col(text_col))
                    )
                parts.append(rep)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        else:
            df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def time_query(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    queries = sys.argv[2:] or QUERIES
    spark = get_spark("scale_probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    d1 = build_replica(spark, 1)
    dn = build_replica(spark, n)

    # warm everything once
    for q in queries:
        time_query(spark, q, d1, reps=1)

    print(f"| query | t(x1) s | t(x{n}) s | ratio | per-row scaling |")
    print("|---|---|---|---|---|")
    import math

    for q in queries:
        t1 = time_query(spark, q, d1)
        tn = time_query(spark, q, dn)
        ratio = tn / t1
        # exponent e s.t. ratio = n^e; e<=1 is at-most-linear
        e = math.log(ratio) / math.log(n)
        print(f"| {q} | {t1:.2f} | {tn:.2f} | {ratio:.1f}x | n^{e:.2f} |")

    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
