from cdc_lite_spark.operators.asof import as_of_join, range_join
from cdc_lite_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter_join,
    might_contain,
)
from cdc_lite_spark.operators.checksum import (
    multi_table_checksum,
    partition_checksums,
    table_checksum,
    table_checksum_value,
)
from cdc_lite_spark.operators.dedup import (
    containment_verify,
    dedup_clusters,
    exact_dedup,
    jaccard_verify,
    lsh_candidate_pairs,
    lsh_pairs_between,
    minhash_signatures,
    simhash_signatures,
)
from cdc_lite_spark.operators.lm import bigram_counts, unigram_logprob
from cdc_lite_spark.operators.multimodal import (
    attach_payload,
    decode_payload,
    frame_sample,
    media_features,
    resize_images,
)
from cdc_lite_spark.operators.maintenance import compact_parquet, dir_stats
from cdc_lite_spark.operators.quality import (
    boilerplate_filter,
    domain_mix_weights,
    contamination_check,
    pack_sequences,
    repetition_stats,
)
from cdc_lite_spark.operators.diff import inserted_keys, persisted_keys, snapshot_diff
from cdc_lite_spark.operators.incremental import apply_delta, sum_count_state
from cdc_lite_spark.operators.latest import latest_per_key, running_agg, with_change_flag
from cdc_lite_spark.operators.schema_drift import schema_drift, schema_json, schema_map
from cdc_lite_spark.operators.replay import apply_changes
from cdc_lite_spark.operators.sampling import dataset_split, hash_sample, stratified_cap
from cdc_lite_spark.operators.scd2 import scd2_as_of, scd2_history
from cdc_lite_spark.operators.similarity import (
    normalize_quantize,
    ann_topk,
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    kmeans_refine,
)
from cdc_lite_spark.operators.skew import salted_join, two_phase_agg
from cdc_lite_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    text_stats,
    tf_idf,
    token_counts,
)
from cdc_lite_spark.operators.topk import top_k_per_group
from cdc_lite_spark.operators.zorder import (
    zorder_key,
    zorder_key_sql,
    zorder_repartition,
)

__all__ = [
    "as_of_join",
    "range_join",
    "bloom_build",
    "bloom_prefilter_join",
    "might_contain",
    "zorder_key",
    "zorder_key_sql",
    "zorder_repartition",
    "multi_table_checksum",
    "partition_checksums",
    "table_checksum",
    "table_checksum_value",
    "containment_verify",
    "exact_dedup",
    "jaccard_verify",
    "lsh_candidate_pairs",
    "lsh_pairs_between",
    "minhash_signatures",
    "simhash_signatures",
    "inserted_keys",
    "persisted_keys",
    "snapshot_diff",
    "apply_delta",
    "sum_count_state",
    "latest_per_key",
    "running_agg",
    "with_change_flag",
    "apply_changes",
    "dataset_split",
    "hash_sample",
    "stratified_cap",
    "scd2_as_of",
    "scd2_history",
    "ann_topk",
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "ivf_topk",
    "kmeans_refine",
    "normalize_quantize",
    "repetition_stats",
    "attach_payload",
    "bigram_counts",
    "boilerplate_filter",
    "decode_payload",
    "frame_sample",
    "media_features",
    "resize_images",
    "unigram_logprob",
    "contamination_check",
    "pack_sequences",
    "domain_mix_weights",
    "dedup_clusters",
    "compact_parquet",
    "dir_stats",
    "salted_join",
    "two_phase_agg",
    "doc_fingerprint",
    "lang_id",
    "text_stats",
    "tf_idf",
    "token_counts",
    "top_k_per_group",
    "schema_drift",
    "schema_json",
    "schema_map",
]
