from cdc_lite_spark.functions.hashes import (
    canonical_row_sql,
    canonical_row_string,
    portable_hash64,
    portable_hash64_sql,
)
from cdc_lite_spark.functions.timeutils import epoch_day, epoch_sec, epoch_us

__all__ = [
    "portable_hash64",
    "portable_hash64_sql",
    "canonical_row_string",
    "canonical_row_sql",
    "epoch_us",
    "epoch_sec",
    "epoch_day",
]
