"""Python UDTF surface (SURVEY.md §2i).

The reference exposes no user-extensible functions, and this engine's
policy is built-ins first: every production operator here is a column
expression or Arrow-batched pandas transform.  This module exists for the
cases a user genuinely needs a one-row→many-rows python function Spark
can plan as a table source — the escape hatch, documented as the SLOW
path (row-at-a-time python, no codegen, no pushdown through it).

``ChunkText`` mirrors the column-expression chunker used by the
``doc_chunking`` query (explode+substring, queries.py) so tests can
assert the two paths agree — if you can express it with explode, do;
reach for the UDTF only when per-row logic has real control flow.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: bigint, chunk_text: string, char_offset: bigint")
class ChunkText:
    """Overlapping fixed-size character chunking as a lateral table
    function: ``chunk_text(text, size, overlap)``."""

    def eval(self, text: str, size: int, overlap: int):
        if size <= overlap:
            raise ValueError("size must exceed overlap")
        if text is None:
            return
        stride = size - overlap
        n = max(1, -(-(len(text) - overlap) // stride))  # ceil
        for i in range(n):
            off = i * stride
            yield i, text[off : off + size], off


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface on a session (SQL name: ``chunk_text``)."""
    spark.udtf.register("chunk_text", ChunkText)
