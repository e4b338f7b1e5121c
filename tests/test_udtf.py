"""Python UDTF escape hatch (functions/udtfs.py) — must agree with the
column-expression chunking path it mirrors."""

from __future__ import annotations

from cdc_lite_spark.functions.udtfs import register_udtfs
from cdc_lite_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_chunk_udtf_matches_explode_chunker(spark):
    register_udtfs(spark)
    from cdc_lite_spark.queries import _CHUNK_OVERLAP, _CHUNK_SIZE

    docs = REGISTRY["doc_chunking"].builder(spark, SF)
    expect = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["char_offset"])
        for r in docs.collect()
    }
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView("__docs")
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["char_offset"])
        for r in spark.sql(
            f"""SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.char_offset
                FROM __docs d,
                     LATERAL chunk_text(d.text, {_CHUNK_SIZE}, {_CHUNK_OVERLAP}) c"""
        ).collect()
    }
    assert got == expect


def test_chunk_udtf_null_and_short_text(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT c.* FROM VALUES (NULL), ('ab') AS t(x), LATERAL chunk_text(t.x, 10, 2) c"
    ).collect()
    # NULL text yields no rows; short text yields exactly one whole chunk
    assert [(r["chunk_idx"], r["chunk_text"]) for r in rows] == [(0, "ab")]
