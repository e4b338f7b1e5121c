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
    """Without PIL on the workers, fake=False on a non-PPM payload names
    the missing codec (the vendored codec only covers PPM/PGM)."""
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


def _ppm_bytes(width, height, rgb_fn):
    """Build a binary P6 PPM from a per-pixel (r,g,b) function."""
    body = bytearray()
    for y in range(height):
        for x in range(width):
            body.extend(rgb_fn(x, y))
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(body)


def _media_df(spark, payload: bytes):
    return spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image").alias("media_type"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("content_md5"),
        ).alias("media_meta"),
    )


def test_real_decode_ppm_without_pil(spark):
    """The real bytes→pixels branch runs dependency-free on PPM payloads:
    actual dimensions and an actual luma histogram, not hash-derived fakes
    (r03 verdict #4 — this test must never skip)."""
    # left half pure black, right half pure white → histogram mass splits
    # between bins 0 and 7 exactly
    ppm = _ppm_bytes(20, 10, lambda x, y: (0, 0, 0) if x < 10 else (255, 255, 255))
    row = decode_payload(_media_df(spark, ppm), fake=False).collect()[0]
    assert (row["width"], row["height"]) == (20, 10)
    assert row["n_bytes"] == len(ppm)
    assert row["feature"][0] == pytest.approx(0.5, abs=1e-6)
    assert row["feature"][7] == pytest.approx(0.5, abs=1e-6)
    assert sum(row["feature"][1:7]) == 0


def test_real_resize_ppm_without_pil(spark):
    """Real resize on PPM payloads: nearest-neighbor downsample of a
    quadrant image keeps each quadrant's color in the right place."""
    from cdc_lite_spark.functions.ppm import MiniImage
    from cdc_lite_spark.operators.multimodal import resize_images

    def quad(x, y):
        if x < 8 and y < 4:
            return (255, 0, 0)
        if x >= 8 and y < 4:
            return (0, 255, 0)
        if x < 8:
            return (0, 0, 255)
        return (255, 255, 0)

    ppm = _ppm_bytes(16, 8, quad)
    df = spark.createDataFrame([(1, bytearray(ppm))], "doc_id long, payload binary")
    row = resize_images(df, 4, 2, fake=False).collect()[0]
    assert (row.width, row.height) == (4, 2)
    out = MiniImage.open(bytes(row.resized_payload))
    assert out.size == (4, 2)
    px = out.pixels
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[0, 3]) == (0, 255, 0)
    assert tuple(px[1, 0]) == (0, 0, 255)
    assert tuple(px[1, 3]) == (255, 255, 0)


def test_ppm_codec_roundtrip_and_header_quirks():
    """Codec unit coverage: comments in headers, PGM (grayscale), and
    encode→decode round-trip."""
    from cdc_lite_spark.functions.ppm import MiniImage, sniff

    ppm = b"P6\n# a comment line\n2 1\n255\n" + bytes([1, 2, 3, 250, 251, 252])
    img = MiniImage.open(ppm)
    assert img.size == (2, 1)
    assert tuple(img.pixels[0, 1]) == (250, 251, 252)
    again = MiniImage.open(img.to_bytes())
    assert (again.pixels == img.pixels).all()

    pgm = b"P5\n3 1\n255\n" + bytes([0, 128, 255])
    g = MiniImage.open(pgm)
    assert g.size == (3, 1)
    assert g.gray_histogram()[128] == 1
    assert sniff(pgm) and not sniff(b"\x89PNG....")


def test_ppm_decode_matches_pil_when_available(spark):
    """Luma parity: on the same PPM the vendored path and PIL produce the
    same histogram feature (runs only where PIL exists)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from cdc_lite_spark.functions.ppm import MiniImage

    ppm = _ppm_bytes(9, 7, lambda x, y: ((x * 37) % 256, (y * 91) % 256, (x * y) % 256))
    mini = MiniImage.open(ppm).gray_histogram()
    with Image.open(io.BytesIO(ppm)) as img:
        pil = img.convert("L").histogram()
    assert mini == pil


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


# --- real WAV audio decode ---------------------------------------------------


def test_wav_codec_roundtrip():
    from cdc_lite_spark.functions.wav import parse_wav, sniff, synth_square_wav

    raw = synth_square_wav(n_samples=1600, amplitude=1200, rate=16000)
    assert sniff(raw)
    f = parse_wav(raw)
    assert f["sample_rate"] == 16000 and f["n_channels"] == 1
    assert f["n_samples"] == 1600 and f["duration_ms"] == 100
    assert f["rms"] == 1200.0 and f["peak"] == 1200  # square wave: rms==peak==A


def test_wav_codec_rejects_non_wav():
    import pytest as _pytest

    from cdc_lite_spark.functions.wav import parse_wav

    with _pytest.raises(ValueError):
        parse_wav(b"not a riff payload at all....")


def test_audio_features_real_decode_end_to_end(spark):
    """Real bytes → real parse through two Arrow hops on executors — the
    audio twin of the PPM real-decode image test (never skips)."""
    from cdc_lite_spark.operators.multimodal import audio_features, synth_wav_payload

    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    out = {r["doc_id"]: r for r in audio_features(synth_wav_payload(docs)).collect()}
    assert len(out) == 20
    for i, r in out.items():
        assert r["n_samples"] == 800 + i % 50
        assert r["rms"] == float(1000 + (i % 7) * 100)
        assert r["peak"] == 1000 + (i % 7) * 100
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1


# --- real Y4M video demux ----------------------------------------------------


def test_y4m_codec_roundtrip():
    from cdc_lite_spark.functions.y4m import parse_y4m, sniff, synth_y4m

    raw = synth_y4m(16, 16, [10, 20, 30])
    assert sniff(raw)
    w, h, frames = parse_y4m(raw)
    assert (w, h) == (16, 16) and len(frames) == 3
    assert frames[1][:256] == bytes([20]) * 256  # luma plane
    assert frames[1][256:] == bytes([100]) * 128  # 4:2:0 chroma planes


def test_y4m_codec_rejects_bad_payloads():
    import pytest as _pytest

    from cdc_lite_spark.functions.y4m import parse_y4m, synth_y4m

    with _pytest.raises(ValueError):
        parse_y4m(b"not a y4m stream")
    with _pytest.raises(ValueError):
        parse_y4m(synth_y4m(16, 16, [10])[:-5])  # truncated frame
    with _pytest.raises(ValueError):
        synth_y4m(16, 16, [200])  # non-ASCII plane byte


def test_frame_sample_real_y4m_demux_end_to_end(spark):
    """Real container bytes → real frames through the 1→N Arrow explode —
    the video twin of the PPM/WAV real-decode tests (never skips)."""
    import hashlib

    from cdc_lite_spark.operators.multimodal import frame_sample, synth_y4m_payload

    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    rows = frame_sample(synth_y4m_payload(docs), every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(8):
        n_frames = 5 + i % 4
        got = sorted(r["frame_idx"] for r in by_doc[i])
        assert got == list(range(0, n_frames, 2))
        for r in by_doc[i]:
            expected = bytes([(i * 7 + r["frame_idx"] * 13) % 120]) * 256 + bytes([100]) * 128
            assert bytes(r["frame_payload"]) == expected
            assert r["frame_md5"] == hashlib.md5(expected).hexdigest()


def test_frame_sample_unknown_format_still_raises(spark):
    from cdc_lite_spark.operators.multimodal import attach_payload, frame_sample

    df = attach_payload(
        spark.createDataFrame([(1, "not video bytes")], "doc_id long, text string")
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="ffmpeg|PyAV|Y4M"):
        frame_sample(df, fake=False).collect()
