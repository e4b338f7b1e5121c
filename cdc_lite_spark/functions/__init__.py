from cdc_lite_spark.functions.hashes import (
    canonical_row_sql,
    canonical_row_string,
    portable_hash64,
    portable_hash64_sql,
)

__all__ = [
    "portable_hash64",
    "portable_hash64_sql",
    "canonical_row_string",
    "canonical_row_sql",
]
