from cdc_lite_spark.operators.checksum import table_checksum, table_checksum_value
from cdc_lite_spark.operators.diff import snapshot_diff
from cdc_lite_spark.operators.latest import latest_per_key, with_change_flag
from cdc_lite_spark.operators.topk import top_k_per_group

__all__ = [
    "table_checksum",
    "table_checksum_value",
    "snapshot_diff",
    "latest_per_key",
    "with_change_flag",
    "top_k_per_group",
]
