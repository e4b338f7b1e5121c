"""Regenerate PLANS.md — formatted physical-plan snapshots of the headline
queries at sf0.001 (tree part only; the load-bearing properties are asserted
by tests/test_plans.py on every run, this file is the human-readable copy).

Usage: python scripts/gen_plans.py
"""

from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF = "/root/testdata/sf0.001"

#: query -> one-line "why this plan is the right one" caption
HEADLINERS: dict[str, str] = {
    "scan_filter_project": "pushdown: filters + 6/11-column ReadSchema reach the parquet scan",
    "cdc_table_checksums": "fingerprint: all 6 scans union into ONE partial agg; a single exchange carries per-table (count,sum) partials",
    "cdc_snapshot_diff": "CDC diff: one sort-merge full-outer join; row hashes computed below the shuffle",
    "revenue_by_nation": "star join: all three dimensions broadcast, zero join shuffles",
    "latest_event_per_user": "latest-per-key as max_by hash aggregate - no window sort",
    "topk_orders_per_customer": "top-k: WindowGroupLimit prunes to k rows per partition before the shuffle",
    "ann_topk_sign_lsh": "ANN: bucket equi-join replaces the cross join; query side broadcast",
    "near_dup_pairs_lsh": "LSH near-dup: band-bucket window cap + bounded self-join + candidate-only verify",
    "edit_distance_pairs": "bounded levenshtein(a,b,k) on LSH candidates only — never all-pairs",
    "containment_pairs": "asymmetric containment verify on LSH candidates — same bounded-join shape as the Jaccard tier",
    "encoding_quality_stats": "pure scan-side expression plan: no exchange at all",
    "cdc_replay_reconstruction": "diff materialized via localCheckpoint, then ONE merge join folds it into prev",
    "cluster_canonical_docs": "survivor window over |clustered docs| (broadcast clusters back), not |corpus|",
    "contamination_check": "holdout gram set broadcast; per-doc gram dedup in-array (r7) — corpus side reaches the join with zero exchanges",
    "cdc_wide_decimal_checksum": "same single-exchange fingerprint shape over a decimal(38,10) column built past 2^53 — exact rendering, no double round-trip",
    "cdc_array_checksum": "array<float> canonicalized by a JVM-side transform below the partial agg — fingerprinting a complex column adds no exchange",
    "schema_drift_report": "schemas are metadata: the whole drift computation is a LocalTableScan, zero jobs against the data",
    "concurrent_sessions_peak": "two-level prefix sum: the only unpartitioned window runs over O(hour-bucket) totals and returns via BroadcastExchange — the boundary stream is never globally sorted",
    "salted_join_segments": "(key, salt) scatter: the salt rides the join keys so one hot key spreads over 8 tasks; replicated dim broadcasts at this SF",
    # bucketed_join_revenue returns a materialized (localCheckpoint) result,
    # so its snapshot here would be Scan ExistingRDD; the zero-Exchange
    # SortMergeJoin property is plan-asserted in tests/test_layout.py
    "embedding_quantize": "pure scan-side map: zero Exchange",
    "pack_training_batches": "one window per shard — single Exchange for the partitionBy",
    "repetition_stats": "word-count shape: partial+final HashAggregate pairs for words and bigrams",
    "domain_mix_weights": "tiny weights table; scalar totals broadcast via BroadcastNestedLoop on 1 row",
    "kmeans_refine_centroids": "per-iteration centroids localCheckpoint-ed; corpus scanned once per iteration",
    "unigram_logprob_score": "top-V vocab + 1-row totals broadcast; corpus side never shuffles for the join",
    "shuffle_shards": "per-shard window sort — hash partition by shard, no global range sort",
    "chunk_dedup": "agg keyed on the 60-bit chunk hash; text projected away before every Exchange",
    "label_centroids": "posexplode + partial/final agg: shuffle carries |labels|x|dims| partial sums",
    "incremental_near_dup": "two-sided LSH: batch-vs-corpus bucket equi-join, corpus never self-joins",
    "incremental_agg_maintenance": "O(delta): change records aggregate then full-outer merge with prior state",
    "salted_agg_skew": "explicit two-phase agg: (key, salt) partial then final merge",
    "bloom_prefilter_join": "bloom word-map broadcast; probe scan-side before the join shuffle",
    "zorder_bucket_stats": "Morton key in the scan projection; single partial+final agg",
    "sole_latest_supplier": "Q21 shape: one lineitem scan, window on the pre-agg, dim broadcast",
    "idle_rich_customers": "Q22 shape: broadcast scalar threshold + key-only LeftAnti",
    "domain_quota_sample": "per-domain window rank; quotas are scalars, one shuffle on source",
    "inverted_index_postings": "pairs dedup then term agg; bounded head block, no unbounded arrays",
    "dup_ngram_coverage": "corpus n-gram DF via count WINDOW — shingle lineage computed once, no self-join",
    "winnowing_fingerprints": "fingerprint sketch entirely scan-side: zero exchanges",
    "embedding_dim_stats": "posexplode fans rows out, but the exchange carries only |dims| partial-agg keys",
    "semdedup_prune": "|labels| centroids broadcast; one window per cluster — no pairwise similarity join",
    "incremental_gram_novelty": "batch grams join the pre-aggregated state — corpus never rescanned",
    "source_overlap_matrix": "gram self-join capped per gram (stop-phrase bomb defused like LSH hot buckets)",
    "bpe_token_counts": "segmented vocab broadcasts; documents explode to words, never touch Python",
    "pq_adc_topk": "distance tables broadcast; corpus side is m-byte codes, never full vectors",
    "embedding_drift_psi": "two dims×bins count tables — constant-size reduction at any corpus size",
    "bm25_scores": "postings pruned to query terms scan-side; corpus stats broadcast as scalars",
    "forecast_revenue_change": "Q6: all four predicates in PushedFilters; no join, one partial+final agg",
    "order_priority_exists": "Q4: EXISTS as LeftSemi with the datediff residual riding the join",
    "returned_item_revenue": "Q10: TakeOrderedAndProject top-20 — per-partition heads, no global sort",
    "disjunctive_predicate_revenue": "Q19: OR-of-ANDs CNF-extracted into both scans' PushedFilters",
    "large_volume_customers": "Q18: HAVING aggregate below the join — build side is qualifying keys only",
    "sketch_distinct_rollup": "HLL sketches partial-agg map-side; rollup merges |months| sketches, no rescan",
    "blocklist_filter_docs": "policy filter as scan-side array_intersect: zero exchanges",
    "weighted_sample_docs": "A-ES race key in the scan projection + TakeOrderedAndProject heads",
    "dsir_importance_sample": "both LMs broadcast (top-V vocab + 1-row totals); raw corpus token-scanned once",
    "recursive_transition_paths": "UnionLoop recursion over the distinct type-edge list, never the raw stream",
    "table_profile_stats": "two single-row agg passes (distinct / sketch) broadcast-joined — mixing them trips a combinatorial Expand",
    "audio_wav_features": "two Arrow hops: synth WAV bytes, then real RIFF/PCM parse; payloads never shuffle",
    "video_y4m_frame_digests": "1→N Arrow demux of real Y4M frames; digests computed in-hop, payload projected away",
    "textrank_keywords": "fixed-point power iteration: final plan reads the last localCheckpoint — no lineage replay",
    "word_graph_triangles": "degree-oriented wedges; closure probe is a hash LeftSemi on the canonical edge set",
    "bigram_lm_perplexity": "pair model equi-joined back to the pair stream; 1-row vocab scalar broadcast",
    "rolling_anomaly_flags": "hourly pre-agg collapses facts; ONE window, no joins",
    "audience_overlap_matrix": "pairs explode from per-user type sets — no per-pair fact-table joins",
    "rag_chunk_topk": "sparse cosine: dimension-index equi-join, probe side broadcast; integer dot products",
    "filter_funnel_report": "whole funnel = one scan collapsing to a 1-row agg, unpivoted executor-side",
    "hybrid_rank_rrf": "both rankers candidate-bounded; fusion is a full-outer of two rank lists + top-N",
    "cdc_struct_checksum": "struct/map canonicalized by scan-side expressions (getField/map_entries/array_sort) below the single-exchange fingerprint agg",
    "incremental_join_maintenance": "O(delta) view refresh: every join against the delta/affected set is a BroadcastHashJoin — view, fact, and dim never shuffle",
    "incremental_join_agg_maintenance": "join+agg maintained from view-level I/D records: delta fold + group-key-domain merge; the tables are never re-joined",
    "incremental_quantile_maintenance": "quantile state fold: bucket counts collapse map-side (partial agg), quantile windows run over |keys|x|bins| state rows only",
    "ivf_topk": "map-side IVF (r7): broadcast centroid array folded per row — the only corpus-sized exchange is the final query-keyed top-k",
    "incremental_distinct_maintenance": "HLL state fold (r8): sketches collapse map-side to |keys| KB rows before any exchange; fold==rebuild flag compares |keys| state rows only",
    "incremental_minmax_maintenance": "extrema fold (r8): |inserts| aggregate map-side, merge joins the group-key domain — monotone under inserts, exact",
    "incremental_moments_maintenance": "moments fold (r8): Σv/Σv² abelian — delta aggregates map-side, merge joins the group-key domain; retracting ticks fold, never rebuild",
    "incremental_dfreq_maintenance": "term_df fold (r8): only CHANGED docs explode to tokens; the merge joins the vocabulary key — the corpus is never re-tokenized",
}


def main() -> None:
    from cdc_lite_spark.plans.inspect import explain_str
    from cdc_lite_spark.queries import REGISTRY
    from cdc_lite_spark.session import get_spark

    spark = get_spark("gen_plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical plans of the headline queries (sf0.001, "
        ".explain('formatted') tree)",
        "",
        "tests/test_plans.py asserts the load-bearing properties of these plans "
        "on every run;",
        "this file is a generated snapshot for review "
        "(regenerate: python scripts/gen_plans.py).",
        "",
    ]
    for name, caption in HEADLINERS.items():
        plan = explain_str(REGISTRY[name].builder(spark, SF))
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"_{caption}_", "", "```", tree, "```", ""]

    with open(os.path.join(repo, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md: {len(HEADLINERS)} plans written")


if __name__ == "__main__":
    main()
