"""Minimal pure-Python image codec: binary PPM (P6) / PGM (P5).

The multimodal operators (operators/multimodal.py, SURVEY.md §2j X5) decode
real image bytes with PIL when it is importable on the workers.  This
container has no PIL, which previously left the real-decode branch reachable
only behind skip-guarded tests (r03 verdict #4).  PPM/PGM are simple enough
to decode dependency-free — an ASCII header (magic, width, height, maxval)
followed by raw samples — so this module vendors a tiny decoder/encoder and
nearest-neighbor resizer that the real branch falls back to.  Formats that
genuinely need codec libraries (JPEG/PNG/video) still raise
``NotImplementedError`` naming the missing dependency.

Deliberate PIL-parity choices so the two real paths agree on P6 inputs:
grayscale uses the same ITU-R 601-2 integer luma PIL's ``convert("L")``
applies (L = (R*299 + G*587 + B*114) / 1000), and only 8-bit (maxval ≤ 255)
images are supported.
"""

from __future__ import annotations

import numpy as np

#: magic → samples per pixel
_MAGICS = {b"P6": 3, b"P5": 1}


def sniff(raw: bytes) -> bool:
    """True if ``raw`` looks like a binary PPM/PGM payload."""
    return raw[:2] in _MAGICS


def _parse_header(raw: bytes) -> tuple[bytes, list[int], int]:
    """Parse (magic, [width, height, maxval], data_offset).

    The header is whitespace-separated tokens; ``#`` starts a comment that
    runs to end-of-line.  Exactly one whitespace byte separates the maxval
    token from the sample data.
    """
    magic = raw[:2]
    if magic not in _MAGICS:
        raise ValueError(f"not a binary PPM/PGM payload (magic {magic!r})")
    fields: list[int] = []
    i = 2
    n = len(raw)
    while len(fields) < 3:
        while i < n and raw[i : i + 1].isspace():
            i += 1
        if i < n and raw[i : i + 1] == b"#":
            while i < n and raw[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < n and not raw[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM/PGM header")
        fields.append(int(raw[start:i]))
    return magic, fields, i + 1  # single whitespace after maxval


class MiniImage:
    """A decoded image: ``pixels`` is uint8 ndarray of shape (h, w, channels)."""

    def __init__(self, pixels: np.ndarray):
        if pixels.ndim == 2:
            pixels = pixels[:, :, np.newaxis]
        self.pixels = pixels

    @classmethod
    def open(cls, raw: bytes) -> "MiniImage":
        magic, (width, height, maxval), off = _parse_header(raw)
        if maxval > 255:
            raise ValueError("16-bit PPM/PGM not supported")
        ch = _MAGICS[magic]
        need = width * height * ch
        data = np.frombuffer(raw, dtype=np.uint8, count=need, offset=off)
        return cls(data.reshape(height, width, ch))

    @property
    def size(self) -> tuple[int, int]:
        h, w, _ = self.pixels.shape
        return (w, h)

    def gray_histogram(self) -> list[int]:
        """256-bin grayscale histogram, PIL ``convert("L").histogram()``
        parity: ITU-R 601-2 luma with PIL's integer rounding."""
        px = self.pixels.astype(np.uint32)
        if px.shape[2] == 3:
            gray = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
        else:
            gray = px[:, :, 0]
        return np.bincount(gray.ravel(), minlength=256).tolist()[:256]

    def resize(self, size: tuple[int, int]) -> "MiniImage":
        """Nearest-neighbor resample to (width, height) — PIL's pixel-center
        convention: source index = floor((i + 0.5) * src/dst)."""
        w2, h2 = size
        h, w, _ = self.pixels.shape
        rows = np.minimum(((np.arange(h2) + 0.5) * h / h2).astype(np.int64), h - 1)
        cols = np.minimum(((np.arange(w2) + 0.5) * w / w2).astype(np.int64), w - 1)
        return MiniImage(self.pixels[rows[:, np.newaxis], cols[np.newaxis, :], :])

    def to_bytes(self) -> bytes:
        """Serialize back to binary PPM (3-channel) or PGM (1-channel)."""
        h, w, ch = self.pixels.shape
        magic = b"P6" if ch == 3 else b"P5"
        header = b"%s\n%d %d\n255\n" % (magic, w, h)
        return header + self.pixels.tobytes()
