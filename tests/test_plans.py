"""Physical-plan assertions — the optimizer properties the 100 TB design
relies on must actually hold, not be hoped for (SURVEY.md §4).

Each test pins a plan property: filter/projection pushdown to parquet,
broadcast joins for dimensions, partial aggregation, window-group-limit
top-k, agg-based (sort-free) latest-per-key.
"""

from __future__ import annotations

import pytest

from cdc_lite_spark.plans.inspect import explain_str
from cdc_lite_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return explain_str(REGISTRY[name].builder(spark, SF))


def test_filters_and_projection_pushed_to_scan(spark):
    plan = _plan(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan and "LessThan(l_shipdate" in plan
    assert "GreaterThan(l_quantity,25.0)" in plan
    # column pruning: the 11-column lineitem scan reads only the 6 needed
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert read.count(":") - 1 <= 6
    assert "l_tax" not in read and "l_returnflag" not in read


def test_star_join_is_all_broadcast(spark):
    plan = _plan(spark, "revenue_by_nation")
    tree = plan.split("\n\n")[0]  # the indented tree, before node details
    assert tree.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_aggregates_are_partial_final(spark):
    plan = _plan(spark, "pricing_summary")
    # two HashAggregates (partial map-side + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_latest_per_key_has_no_window_sort(spark):
    plan = _plan(spark, "latest_event_per_user")
    assert "Window" not in plan  # max_by aggregation, not a window sort
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_topk_uses_window_group_limit(spark):
    plan = _plan(spark, "topk_orders_per_customer")
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the sort


def test_ann_join_is_equi_not_cross(spark):
    plan = _plan(spark, "ann_topk_sign_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bruteforce_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, "cosine_topk_bruteforce")
    tree = plan.split("\n\n")[0]
    # cross join with the small query set broadcast (BuildRight); exactly
    # one broadcast — the corpus side streams
    assert "BroadcastNestedLoopJoin Cross BuildRight" in tree
    assert tree.count("BroadcastExchange") == 1


def test_whole_stage_codegen_present(spark):
    # AQE plans only annotate codegen ids after execution, so assert on the
    # exchange-free query (scan→filter→project stays one codegen stage)
    plan = _plan(spark, "scan_filter_project")
    assert "codegen id" in plan


def test_checksum_shuffles_only_partials(spark):
    plan = _plan(spark, "cdc_table_checksums")
    # fused multi-table fingerprint: all 6 scans union into ONE partial
    # aggregation (map-side), a single exchange carries only the per-table
    # (count, sum) partials, and one final aggregate emits the 6 rows.
    # (formatted explain prints every node twice: tree + detail section)
    assert plan.count("HashAggregate") == 4
    assert plan.count("Exchange") == 2
    assert plan.count("Scan parquet") == 12


def test_contamination_broadcasts_holdout(spark):
    """The holdout gram set is tiny — it must broadcast; the corpus side
    must never become the build side of a shuffled join.  r7: per-doc gram
    dedup happens in-array (array_distinct) before the explode, so the
    corpus gram stream reaches the broadcast join with ZERO exchanges —
    the plan's only shuffles are the holdout distinct and the final
    |docs|-row partial-agg exchange (tree + detail each print once → 2×2)."""
    plan = _plan(spark, "contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 4


def test_embedding_quantize_has_no_shuffle(spark):
    """normalize_quantize is a pure scan-side map: no Exchange at all."""
    plan = _plan(spark, "embedding_quantize")
    assert "Exchange" not in plan


def test_pack_sequences_single_window_pass(spark):
    """One window over (shard, id) — exactly one shuffle for the
    partitionBy, no extra sorts beyond the window's own."""
    plan = _plan(spark, "pack_training_batches")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 1
    assert tree.count("Exchange") <= 1


def test_repetition_aggs_are_partial_final(spark):
    """The (doc, gram) counts must partial-aggregate map-side before the
    shuffle (word-count shape)."""
    plan = _plan(spark, "repetition_stats")
    assert plan.count("HashAggregate") >= 4  # partial+final for words and bigrams


def test_unigram_scoring_join_is_broadcast(spark):
    """The top-V vocab and the 1-row totals both broadcast to the scoring
    explode — the corpus side never shuffles for the join."""
    plan = _plan(spark, "unigram_logprob_score")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree
    assert "BroadcastNestedLoopJoin" in tree or "CartesianProduct" not in tree


def test_shuffle_shards_has_no_global_sort(spark):
    """Window partitions by shard: per-shard parallel sorts, never a
    single-partition global ORDER BY."""
    plan = _plan(spark, "shuffle_shards")
    tree = plan.split("\n\n")[0]
    assert "Window" in tree
    # the only exchange is the hash partition by shard — no rangepartitioning
    assert "rangepartitioning" not in plan.lower()


def test_chunk_dedup_shuffles_hash_not_text(spark):
    """The aggregation key is the 60-bit chunk hash; chunk text must be
    projected away before the exchange."""
    plan = _plan(spark, "chunk_dedup")
    lines = plan.splitlines()
    # every Exchange is keyed on the hash, and its Input (the shuffled row)
    # never carries the wide text column
    exch_inputs = [
        lines[i + 1]
        for i, l in enumerate(lines)
        if l.strip().startswith("(") and l.strip().endswith("Exchange")
    ]
    args = [l for l in lines if "hashpartitioning(chunk_hash" in l]
    assert args and exch_inputs
    assert all("text#" not in inp for inp in exch_inputs)


def test_label_centroids_partial_aggregates(spark):
    """posexplode then partial+final hash agg — the shuffle carries
    |labels|x|dims| partial sums, not exploded rows."""
    plan = _plan(spark, "label_centroids")
    assert plan.count("HashAggregate") >= 2
    assert "Generate" in plan  # the posexplode


def test_curriculum_buckets_have_no_global_window(spark):
    """Decile assignment must come from broadcast percentile boundaries,
    never an ntile() global single-partition sort."""
    plan = _plan(spark, "curriculum_ntile_buckets")
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastExchange" in plan


def test_edit_distance_runs_on_candidates_only(spark):
    """Levenshtein must sit above the bounded LSH candidate join, not a
    cartesian of the corpus."""
    plan = _plan(spark, "edit_distance_pairs")
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_volume_shipping_dims_broadcast_no_cartesian(spark):
    """Q7 shape: the twice-joined nation dimension (and supplier/customer)
    must broadcast; nothing may degenerate to a cartesian product."""
    plan = _plan(spark, "volume_shipping")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    assert tree.count("BroadcastHashJoin") >= 4
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_key_skew_report_is_two_chained_aggs(spark):
    """Frequency-of-frequencies: exactly two partial+final aggregation
    pairs, no join, no sort."""
    plan = _plan(spark, "key_skew_report")
    tree = plan.split("\n\n")[0]
    assert tree.count("HashAggregate") == 4
    assert "Join" not in tree and "Sort" not in tree


def test_value_histogram_has_no_global_sort(spark):
    """Equi-width histogram: bounds arrive as a broadcast 1-row frame, the
    bucket assignment is scan-side — never a global ordering."""
    plan = _plan(spark, "value_histogram_equiwidth")
    tree = plan.split("\n\n")[0]
    assert "Sort" not in tree
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastExchange" in plan


def test_q13_outer_join_keeps_predicate_in_join(spark):
    plan = _plan(spark, "customer_order_distribution")
    # the priority filter must sit under the LEFT OUTER join (pushed to the
    # orders scan), never above it — above would drop zero-order customers
    assert "LeftOuter" in plan or "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan and "1-URGENT" in plan


def test_sole_latest_supplier_single_lineitem_scan(spark):
    plan = _plan(spark, "sole_latest_supplier")
    # the exists/not-exists pair is one windowed pass over the
    # pre-aggregation: lineitem is scanned once, supplier dim broadcasts
    assert plan.count("lineitem.parquet") <= 1 or plan.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in plan


def test_idle_rich_anti_join_on_keys(spark):
    plan = _plan(spark, "idle_rich_customers")
    assert "LeftAnti" in plan
    # anti-join build side reads only the key (+ pushed priority filter)
    read = [l for l in plan.splitlines() if "ReadSchema" in l and "o_custkey" in l]
    assert read and all("o_totalprice" not in l for l in read)


def test_transition_matrix_one_window_no_selfjoin(spark):
    plan = _plan(spark, "event_transition_matrix")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") == 1
    assert "Join" not in tree


def test_bloom_prefilter_small_side_broadcasts(spark):
    plan = _plan(spark, "bloom_prefilter_join")
    # the 1-row word-map broadcasts (nested-loop over one row), and the
    # exact join is a broadcast hash join on the pruned fact side
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zorder_key_is_scan_side_single_agg(spark):
    plan = _plan(spark, "zorder_bucket_stats")
    tree = plan.split("\n\n")[0]
    # key computed in the scan projection; one partial+final agg pair
    assert tree.count("Exchange") == 1
    assert "Window" not in tree and "Join" not in tree


def test_encoding_stats_is_pure_scan(spark):
    """Encoding-quality features are scan-side expressions: no Exchange."""
    plan = _plan(spark, "encoding_quality_stats")
    assert "Exchange" not in plan
    assert "codegen id" in plan


def test_containment_runs_on_candidates_only(spark):
    """Containment verify joins the bounded LSH candidate set, never a
    corpus cartesian."""
    plan = _plan(spark, "containment_pairs")
    assert "CartesianProduct" not in plan
    assert "array_intersect" in plan


def test_winnowing_is_scan_side_only(spark):
    """The fingerprint sketch must not shuffle — it's computed where the
    data lives (the whole point of sketching before exchanging)."""
    plan = _plan(spark, "winnowing_fingerprints")
    assert "Exchange" not in plan
    assert "codegen id" in plan


def test_dim_stats_single_constant_size_exchange(spark):
    """posexplode fans rows out, but the shuffle must carry only |dims|
    partial-agg keys — one exchange, partial+final aggregation."""
    plan = _plan(spark, "embedding_dim_stats")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert tree.count("HashAggregate") == 2


def test_dup_ngram_join_is_against_preaggregated_side(spark):
    """The doc-frequency join must consume the AGGREGATED per-gram side —
    no pairwise blowup, no cartesian product."""
    plan = _plan(spark, "dup_ngram_coverage")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # df-count partial/final + rollup


def test_semdedup_broadcasts_centroids_no_pairwise_join(spark):
    """Centroids (|labels| rows) broadcast; no similarity self-join."""
    plan = _plan(spark, "semdedup_prune")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Join") == 1  # the single corpus×centroid join


def test_gram_novelty_state_side_preaggregated(spark):
    """The novelty join consumes the aggregated (gram, doc_freq) state —
    no cartesian, no second corpus-wide shingle pass on the batch side."""
    plan = _plan(spark, "incremental_gram_novelty")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4


def test_source_overlap_join_is_capped_equi(spark):
    """Gram self-join must be an equi-join over the MATERIALIZED capped
    gram table (the cap window runs once inside the localCheckpoint, so
    the final plan joins two ExistingRDD reads — never a cartesian, never
    a re-derived shingle lineage)."""
    plan = _plan(spark, "source_overlap_matrix")
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert "ExistingRDD" in tree  # both sides read the checkpointed sketch
    assert "Scan parquet" not in tree  # nothing re-derives from the corpus


def test_bpe_token_counts_broadcasts_vocab(spark):
    """The segmented vocabulary (|word types| rows) must broadcast —
    documents never shuffle for the tokenization join."""
    plan = _plan(spark, "bpe_token_counts")
    assert "BroadcastHashJoin" in plan


def test_pq_encode_broadcasts_codebook(spark):
    """The m·k codebook must broadcast; no cartesian anywhere."""
    plan = _plan(spark, "pq_encode")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --- r04 TPC-H decision-support shapes -------------------------------------


def test_q6_pushes_every_predicate_to_the_scan(spark):
    plan = _plan(spark, "forecast_revenue_change")
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.02)",
        "LessThanOrEqual(l_discount,0.04)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in pushed
    # pure scan+agg: no join anywhere
    assert "Join" not in plan
    # column pruning down to the two summed columns
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_tax" not in read and "l_orderkey" not in read


def test_q4_exists_is_semi_join_with_residual(spark):
    plan = _plan(spark, "order_priority_exists")
    assert "LeftSemi" in plan
    assert "datediff" in plan  # the non-equi residual rides the join
    assert "CartesianProduct" not in plan


def test_q19_or_of_ands_extracts_single_side_conjuncts(spark):
    plan = _plan(spark, "disjunctive_predicate_revenue")
    # CNF extraction: each scan gets the union of its own side's bounds
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    li_pushed = next(l for l in pushed if "l_quantity" in l)
    p_pushed = next(l for l in pushed if "p_brand" in l)
    assert "GreaterThanOrEqual(l_quantity" in li_pushed
    assert "EqualTo(p_brand,Brand#2)" in p_pushed
    # part side broadcasts; the disjunction never forces a cartesian product
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_q10_topk_is_take_ordered_not_full_sort(spark):
    plan = _plan(spark, "returned_item_revenue")
    assert "TakeOrderedAndProject" in plan
    tree = plan.split("\n\n")[0]
    assert "Sort " not in tree  # no global sort node — per-partition heads


def test_q16_not_in_is_broadcast_anti_join(spark):
    plan = _plan(spark, "brand_supplier_counts")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_q18_having_filter_runs_before_the_join(spark):
    plan = _plan(spark, "large_volume_customers")
    tree = plan.split("\n\n")[0]
    # the aggregate + tail filter sit below the join with orders: the first
    # join node appears above the (deeper-indented) HashAggregate pair
    join_at = min(
        i for i, l in enumerate(tree.splitlines()) if "Join" in l
    )
    agg_at = max(
        i for i, l in enumerate(tree.splitlines()) if "HashAggregate" in l
    )
    assert agg_at > join_at  # aggregate is a descendant of the join


def test_q20_semi_join_build_side_is_aggregated(spark):
    plan = _plan(spark, "excess_supply_candidates")
    assert "LeftSemi" in plan
    # the semi join's build side carries qualifying keys, not raw lineitem:
    # an aggregate (and its tail filter) appear below the broadcast
    tree = plan.split("\n\n")[0]
    assert "HashAggregate" in tree
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered(spark):
    plan = _plan(spark, "weighted_sample_docs")
    assert "TakeOrderedAndProject" in plan
    tree = plan.split("\n\n")[0]
    assert "Sort " not in tree and "Exchange" not in tree  # scan-side race + heads


def test_dsir_models_broadcast_no_cartesian(spark):
    plan = _plan(spark, "dsir_importance_sample")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # both vocab joins broadcast
    assert "TakeOrderedAndProject" in plan  # gumbel top-k heads


def test_triangle_closure_is_equi_join_no_cartesian(spark):
    """The wedge build and the closure probe must be hash equi-joins — a
    nested-loop over the EDGE tables is the n² plan degree orientation
    exists to avoid.  (The two BroadcastNestedLoopJoin Cross nodes in this
    plan are the deliberate 1-row scalar count joins, not edge joins.)"""
    plan = _plan(spark, "word_graph_triangles")
    assert "CartesianProduct" not in plan
    # closure probe: a hash LeftSemi against the canonical edge set
    assert "BroadcastHashJoin LeftSemi" in plan or "ShuffledHashJoin LeftSemi" in plan or "SortMergeJoin LeftSemi" in plan
    # only the two 1-row scalar assemblies may nested-loop (count in the
    # tree section; the node-details section repeats each node)
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 2


def test_audience_overlap_scans_events_once_per_branch_no_pair_joins(spark):
    """The pair counts come from exploding per-user type sets — never from
    a per-pair join over the fact table (no nested-loop, no cartesian;
    the only cross join allowed is none at all here)."""
    plan = _plan(spark, "audience_overlap_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_textrank_iterations_root_at_the_edge_checkpoint(spark):
    """Small-graph regime: the k iterations compose into one nested plan
    whose every edge reference reads the ONE checkpointed edge list (Scan
    ExistingRDD) — the corpus scan/explode must appear nowhere in the
    final plan, and nothing may degenerate to a cartesian."""
    from cdc_lite_spark.operators.rank import RANK_ITERS

    plan = _plan(spark, "textrank_keywords")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan ExistingRDD") == RANK_ITERS + 1  # e per iteration + init
    assert "Scan parquet" not in plan  # corpus touched only at checkpoint build
    assert "CartesianProduct" not in plan


def test_rolling_anomaly_single_window_exchange(spark):
    """Hourly pre-agg collapses facts before the window: the plan holds
    exactly one Window node and the frame sums ride it (no self-join)."""
    plan = _plan(spark, "rolling_anomaly_flags")
    assert plan.count("Window") >= 1
    assert "Join" not in plan


def test_bigram_lm_no_cartesian(spark):
    """Scoring is equi-joins of the pair stream against the model; the
    single nested-loop Cross is the 1-row vocab-size scalar broadcast."""
    plan = _plan(spark, "bigram_lm_perplexity")
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 1


def test_salted_join_shuffles_on_key_and_salt(spark):
    """The skew rewrite's point: the join's hash partitioning includes
    __salt, so a hot key's rows spread over n_salts partitions instead of
    one straggler (forced shuffle path — the tiny dim would broadcast at
    test SF and hide the salted exchange)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "salted_join_segments")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "__salt" in plan
    part_lines = [
        l for l in plan.splitlines() if "hashpartitioning" in l and "__salt" in l
    ]
    assert part_lines, plan  # the exchange keys are (k, __salt), not k alone
    assert "CartesianProduct" not in plan


def test_concurrent_sessions_offsets_broadcast(spark):
    """The sweep's O(buckets) offsets return via broadcast; the boundary
    stream itself is never globally range-sorted."""
    plan = _plan(spark, "concurrent_sessions_peak")
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan.lower()


def test_dup_span_stats_single_md5_pass(spark):
    """The md5 tokenizer pass must appear exactly once in the plan.
    InferFiltersFromGenerate + predicate pushdown can drag an inferred
    size(__sh)>0 filter through the staging projections, inlining the
    word-hash transform into a scan-level filter where the rolling
    combine's element_at references re-run the md5 pass per shingle
    position — O(tokens^2) md5, measured 16x slower at sf0.1 (52s vs
    3.3s).  Guarded by filtering on tokens() before hashing and by
    posexplode_outer (the infer rule skips outer generates)."""
    plan = _plan(spark, "dup_span_stats")
    assert plan.count("md5") == 1, plan


def test_changelog_guard_classify_broadcasts_batch_keys(spark):
    """The foreign-log guard rides ONE broadcast join per side (r11): the
    replica and tombstone scans stay map-side — batch keys broadcast, the
    replica never shuffles — so the guard adds no exchange to the epoch."""
    import pyspark.sql.functions as F

    from cdc_lite_spark.streaming.view_stream import (
        _advance_replica,
        _classify,
    )

    replica = spark.range(100_000).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") * 1.0).alias("v"),
        F.current_timestamp().alias("__ts"),
    )
    latest = spark.range(8).select(
        (F.col("id") * 1000).alias("id"), F.lit("UPDATE").alias("operation"),
        F.lit("x").alias("grp"), F.lit(-1.0).alias("v"),
        F.current_timestamp().alias("__ts"),
    )
    tombs = spark.range(4).select(
        (F.col("id") * 13).alias("id"), F.current_timestamp().alias("__ts")
    )
    joined = _classify(latest, replica, ["id"], ["grp", "v"], tombs)
    plan = explain_str(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    advanced = _advance_replica(replica, latest, ["id"], ["grp", "v"])
    plan = explain_str(advanced)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_engine_bucketed_fold_prunes_mold_and_stays_broadcast(spark, tmp_path):
    """The engine's bucketed join-view fold (r12): the pruned m_old read
    touches ONLY the affected keys' bucket files (inputFiles-proven
    pruning, not hope), and the fold plan over the pruned state keeps
    every join broadcast — no sort-merge/shuffled-hash anywhere, so the
    epoch adds no table shuffle."""
    import pyspark.sql.functions as F

    from cdc_lite_spark.operators.incremental import (
        affected_join_keys,
        maintain_join_with_changes,
    )
    from cdc_lite_spark.streaming.bucketed import BucketedReplica

    ddl = "fid bigint, fk bigint, amt double, did bigint, label string"
    m0 = spark.range(20_000).select(
        F.col("id").alias("fid"), (F.col("id") % 5000).alias("fk"),
        (F.col("id") * 1.0).alias("amt"), (F.col("id") % 5000).alias("did"),
        (F.col("id") % 7).cast("string").alias("label"),
    )
    brep = BucketedReplica(spark, str(tmp_path / "jstate"), 8, ["fid"], ddl)
    brep.init(m0)
    man = brep.current_manifest()

    fact_new = m0.select("fid", "fk", "amt")
    dim_new = m0.select("did", "label").distinct()
    fact_changes = spark.range(3).select((F.col("id") * 701).alias("fid"))
    dim_changes = spark.range(1).select((F.col("id") + 7).alias("did"))
    affected = affected_join_keys(
        fact_new, fact_changes, dim_changes, ["fid"], ["fk"], ["did"]
    )
    plan = explain_str(affected)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    touched = brep.touched_ids(affected)
    assert 0 < len(touched) < 8  # a delta tick must not touch every bucket
    pruned = brep.read(man, touched)
    pfiles = pruned.inputFiles()
    allfiles = brep.read(man, None).inputFiles()
    assert len(pfiles) < len(allfiles)
    assert all(any(f"__b={b}/" in p for b in touched) for p in pfiles)

    state, _, _ = maintain_join_with_changes(
        pruned, fact_new, dim_new, fact_changes, dim_changes,
        ["fid"], ["fk"], ["did"], with_changes=False, affected=affected,
    )
    plan = explain_str(state)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
