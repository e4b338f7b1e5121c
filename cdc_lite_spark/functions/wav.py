"""Dependency-free WAV (RIFF PCM) encode/parse — the audio counterpart of
the vendored PPM/PGM image codec (functions/ppm.py): real bytes→samples
decode with nothing but the standard library, so the multimodal audio
branch is exercised end-to-end in codec-less containers.  Formats that
genuinely need codec libraries (MP3/AAC/...) stay behind the
NotImplementedError gate in operators/multimodal.py.
"""

from __future__ import annotations

import io
import math
import struct
import wave
from array import array


def synth_square_wav(
    n_samples: int, amplitude: int, rate: int = 8000, period: int = 8
) -> bytes:
    """Mono 16-bit PCM square wave: sample i is +amplitude when
    ``(i // (period/2)) % 2 == 0`` else -amplitude.  Every sample has
    magnitude exactly ``amplitude``, so RMS == peak == amplitude in closed
    form — which is what lets an SQL oracle content-verify a real decode."""
    half = max(1, period // 2)
    samples = array(
        "h",
        ((amplitude if (i // half) % 2 == 0 else -amplitude) for i in range(n_samples)),
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def sniff(raw: bytes) -> bool:
    return len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"


def parse_wav(raw: bytes) -> dict:
    """Parse header + PCM frames: (sample_rate, n_channels, n_samples,
    duration_ms, rms, peak).  16-bit PCM only (the format this engine
    synthesizes); anything else raises ``ValueError``."""
    if not sniff(raw):
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(raw), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate, channels, n = w.getframerate(), w.getnchannels(), w.getnframes()
        frames = w.readframes(n)
    samples = array("h")
    samples.frombytes(frames)
    if struct.pack("h", 1) != struct.pack("<h", 1):  # pragma: no cover
        samples.byteswap()  # WAV PCM is little-endian; normalize on BE hosts
    n_samples = len(samples) // channels if channels else 0
    if samples:
        rms = math.sqrt(sum(s * s for s in samples) / len(samples))
        peak = max(abs(s) for s in samples)
    else:
        rms, peak = 0.0, 0
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000 + rate // 2) // rate if rate else 0,  # integer half-up: engine-portable, no banker's rounding
        "rms": float(rms),
        "peak": int(peak),
    }
