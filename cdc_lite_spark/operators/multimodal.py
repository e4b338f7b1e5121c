"""Multimodal column plumbing (SURVEY.md §2j X5).

Images / audio / video ride through the engine as opaque ``binary`` payload
columns with a typed metadata struct.  The Spark-side machinery — schema,
partition sizing, Arrow-batched UDF signatures, batch shapes — is real and
tested; the codec step uses PIL when it is importable on the workers
(real image decode), and otherwise raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces
hash-derived features so the distributed plumbing is exercised end-to-end
in codec-less environments like this container.

Scale notes: payloads dominate row width, so operators here
(1) never shuffle payload bytes unless the operator requires it,
(2) use ``mapInPandas`` (Arrow batches) for the Python hops, and
(3) compute features scan-side then immediately project the payload away.

Real-decode fallback: when PIL is absent the decode/resize operators still
handle binary PPM/PGM payloads via the vendored dependency-free codec
(functions/ppm.py), audio decodes real RIFF/PCM WAV (functions/wav.py),
and video demuxes real YUV4MPEG2 clips (functions/y4m.py) — so every
modality's real bytes→content branch is exercised even in codec-less
containers; only formats that genuinely need codec libraries (JPEG/PNG/
H.264/MP3) raise ``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_md5", T.StringType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _real_decode(raw: bytes, pil_image) -> tuple[int, int, list[int]]:
    """(width, height, 256-bin grayscale histogram) from real image bytes —
    PIL when available, the vendored PPM/PGM codec otherwise."""
    if pil_image is not None:
        import io

        with pil_image.open(io.BytesIO(raw)) as img:
            width, height = img.size
            return width, height, img.convert("L").histogram()
    from cdc_lite_spark.functions.ppm import MiniImage, sniff

    if not sniff(raw):
        raise NotImplementedError(
            "real media decode of this format requires codec libraries "
            "(PIL/ffmpeg) not importable on this worker; only binary "
            "PPM/PGM decode is built in — pass fake=True for the "
            "deterministic plumbing-test decoder"
        )
    img = MiniImage.open(raw)
    width, height = img.size
    return width, height, img.gray_histogram()


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", media_type: str = "image"
) -> DataFrame:
    """Deterministic fake ingestion: derive a binary payload from the text
    column (UTF-8 bytes) plus the typed metadata struct.  In production this
    is the column read from parquet/lakehouse — binary with metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ).alias("media_meta"),
    )


def decode_payload(df: DataFrame, fake: bool = False, batch_hint: int = 256) -> DataFrame:
    """Decode payloads → per-item features via an Arrow-batched
    ``mapInPandas``.

    ``fake=False``: decode real images — PIL when it is importable on the
    worker, else the vendored PPM/PGM codec (functions/ppm.py) for payloads
    in those formats (width/height + an 8-bin grayscale histogram feature,
    identical luma math on both paths); a payload neither path can read
    raises NotImplementedError naming the missing codec.
    ``fake=True``: a deterministic md5-derived fake decode exercising the
    identical distributed path (schema in/out, Arrow batch shapes,
    payload-projection, partition parallelism) in codec-less environments.
    """

    cols = ["doc_id", "media_type", "n_bytes", "width", "height", "feature"]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil_image = None
        if not fake:
            try:
                from PIL import Image as pil_image  # noqa: N813 — worker-side
            except ImportError:
                pil_image = None
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                raw = bytes(payload)
                if fake:
                    digest = hashlib.md5(raw).digest()
                    # hash-derived deterministic "decode": dimensions + a
                    # tiny feature vector, stable across engines/runs
                    width = 16 + digest[0] % 64
                    height = 16 + digest[1] % 64
                    feature = [round(b / 255.0, 6) for b in digest[:8]]
                else:
                    width, height, gray = _real_decode(raw, pil_image)
                    total = max(1, sum(gray))
                    feature = [
                        round(sum(gray[b * 32 : (b + 1) * 32]) / total, 6)
                        for b in range(8)
                    ]
                out.append(
                    (doc_id, meta["media_type"], len(raw), width, height, feature)
                )
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(_decode, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def frame_sample(df: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Video frame sampling: one input row (payload) → many output rows
    (doc_id, frame_idx, frame_payload, frame_md5), every ``every_n``-th
    frame.  The 1→N batch shape is the part Spark has to get right — a
    ``mapInPandas`` block may emit more rows than it receives, and the
    payload column is projected away after the explode so downstream
    stages never shuffle video bytes.

    ``fake=True``: a deterministic splitter that treats the payload as a
    byte stream of 64-byte "frames" — exercises the full distributed
    explode path in codec-less environments.  The real path demuxes
    Y4M/YUV4MPEG2 payloads via the vendored codec (functions/y4m.py) —
    real container parse, real frame bytes — and raises
    ``NotImplementedError`` for formats that need video codec libraries
    (ffmpeg/PyAV) until one is importable on the workers.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "frame_idx", "frame_payload", "frame_md5"]
        frame_bytes = 64
        if not fake:
            from cdc_lite_spark.functions.y4m import parse_y4m, sniff

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if fake:
                    n_frames = max(1, len(raw) // frame_bytes)
                    frames = [
                        raw[i * frame_bytes : (i + 1) * frame_bytes]
                        for i in range(n_frames)
                    ]
                elif sniff(raw):
                    _w, _h, frames = parse_y4m(raw)
                else:
                    raise NotImplementedError(
                        "frame sampling of this format requires video codecs "
                        "(ffmpeg/PyAV) not importable on this worker; only "
                        "Y4M demux is built in — pass fake=True for the "
                        "deterministic plumbing-test splitter"
                    )
                for idx in range(0, len(frames), every_n):
                    frame = frames[idx]
                    out.append(
                        (doc_id, idx, frame, hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(_sample, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized_payload", T.BinaryType(), False),
        T.StructField("resized_md5", T.StringType(), False),
    ]
)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, fake: bool = False
) -> DataFrame:
    """Image resize: (payload) → (doc_id, width, height, resized_payload).

    Real path: PIL when importable on the workers (thumbnail re-encoded as
    PNG), else the vendored PPM/PGM codec — nearest-neighbor resample
    re-encoded as PPM (functions/ppm.py); other formats raise
    ``NotImplementedError`` naming the missing codec.  ``fake=True``
    derives a deterministic ``width*height``-byte pseudo-bitmap from the
    payload hash — same schema, same Arrow batch shape, same
    payload-in/payload-out memory profile.  Either way the input payload
    column is dropped from the output, so only the (smaller) resized bytes
    flow downstream.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil_image = None
        if not fake:
            try:
                from PIL import Image as pil_image  # noqa: N813 — worker-side
            except ImportError:
                pil_image = None
        cols = ["doc_id", "width", "height", "resized_payload", "resized_md5"]
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if fake:
                    seed = hashlib.md5(raw).digest()
                    reps = (width * height) // len(seed) + 1
                    resized = (seed * reps)[: width * height]
                elif pil_image is not None:
                    import io

                    with pil_image.open(io.BytesIO(raw)) as img:
                        small = img.resize((width, height))
                        buf = io.BytesIO()
                        small.save(buf, format="PNG")
                        resized = buf.getvalue()
                else:
                    from cdc_lite_spark.functions.ppm import MiniImage, sniff

                    if not sniff(raw):
                        raise NotImplementedError(
                            "image resize of this format requires PIL, not "
                            "importable on this worker; only binary PPM/PGM "
                            "is built in — pass fake=True for the "
                            "deterministic plumbing-test resizer"
                        )
                    resized = MiniImage.open(raw).resize((width, height)).to_bytes()
                out.append(
                    (doc_id, width, height, resized, hashlib.md5(resized).hexdigest())
                )
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


def media_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """End-to-end fake pipeline: attach payload → decode (fake) → project
    payload away.  The oracle-checkable projection of the plumbing."""
    with_payload = attach_payload(df, text_col=text_col, id_col=id_col)
    return decode_payload(with_payload, fake=True)


#: deterministic synth parameters — the SQL oracles derive their
#: closed-form expectations from these same constants (queries.py), so
#: editing one side cannot silently break content verification
WAV_RATE = 8000
WAV_BASE_SAMPLES, WAV_SAMPLES_MOD = 800, 50
WAV_BASE_AMP, WAV_AMP_STEP, WAV_AMP_MOD = 1000, 100, 7
Y4M_SIDE = 16
Y4M_BASE_FRAMES, Y4M_FRAMES_MOD = 5, 4
Y4M_LUMA_A, Y4M_LUMA_B, Y4M_LUMA_MOD = 7, 13, 120
Y4M_CHROMA = 100

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def synth_wav_payload(
    df: DataFrame, id_col: str = "doc_id", rate: int = WAV_RATE
) -> DataFrame:
    """Deterministic audio ingestion stand-in: synthesize a real mono
    16-bit PCM WAV payload per row (square wave whose length/amplitude
    derive from the id), carried exactly like any other binary payload.
    In production this column comes off parquet; the synthesizer exists so
    the REAL decode path has real bytes to chew in codec-less containers."""
    from cdc_lite_spark.functions.wav import synth_square_wav

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": [
                        synth_square_wav(
                            WAV_BASE_SAMPLES + int(i) % WAV_SAMPLES_MOD,
                            WAV_BASE_AMP + (int(i) % WAV_AMP_MOD) * WAV_AMP_STEP,
                            rate,
                        )
                        for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _synth, schema
    )


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio decode: parse each WAV payload's header and PCM frames
    (stdlib codec, functions/wav.py) into (rate, channels, samples,
    duration, rms, peak).  Arrow-batched ``mapInPandas``, payload bytes
    projected away immediately after — same discipline as the image path.
    Non-WAV payloads raise, matching the image gate: formats needing codec
    libraries are not silently faked."""
    from cdc_lite_spark.functions.wav import parse_wav

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [parse_wav(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                    "peak": [f["peak"] for f in feats],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, AUDIO_FEATURE_SCHEMA
    )


def synth_y4m_payload(
    df: DataFrame, id_col: str = "doc_id", width: int = Y4M_SIDE, height: int = Y4M_SIDE
) -> DataFrame:
    """Deterministic video ingestion stand-in: a real YUV4MPEG2 clip per
    row — ``5 + id%4`` constant-luma frames with luma ``(id*7 + k*13) %
    120`` for frame k — so the REAL demux path has genuine container
    bytes, and frame digests have closed forms an SQL oracle reproduces
    (every plane byte is ASCII-range; see functions/y4m.py)."""
    from cdc_lite_spark.functions.y4m import synth_y4m

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": [
                        synth_y4m(
                            width,
                            height,
                            [
                                (int(i) * Y4M_LUMA_A + k * Y4M_LUMA_B) % Y4M_LUMA_MOD
                                for k in range(Y4M_BASE_FRAMES + int(i) % Y4M_FRAMES_MOD)
                            ],
                            chroma=Y4M_CHROMA,
                        )
                        for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _synth, schema
    )
