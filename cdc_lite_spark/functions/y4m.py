"""Dependency-free Y4M (YUV4MPEG2) video encode/parse — the video member
of the vendored codec trio (ppm.py images, wav.py audio): a real container
format whose header is plain text and whose frames are raw planar YUV, so
real bytes→frames demuxing runs with nothing but the standard library.
Formats that genuinely need codec libraries (H.264/VP9/...) stay behind
the NotImplementedError gate in operators/multimodal.py.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2 "


def synth_y4m(
    width: int, height: int, lumas: list[int], chroma: int = 100, fps: str = "25:1"
) -> bytes:
    """A tiny 4:2:0 clip: frame k is a constant-luma plane ``lumas[k]``
    with constant-chroma planes.  Keep every byte ≤127 so an SQL oracle
    can reproduce frame digests with ``md5(repeat(chr(v), …))`` (UTF-8
    turns >127 codepoints into two bytes — see test coverage)."""
    if not all(0 <= v <= 127 for v in lumas) or not 0 <= chroma <= 127:
        raise ValueError("plane bytes must stay in the ASCII range")
    y_n, c_n = width * height, (width // 2) * (height // 2)
    out = [MAGIC + f"W{width} H{height} F{fps} Ip A1:1 C420jpeg\n".encode()]
    for v in lumas:
        out.append(b"FRAME\n")
        out.append(bytes([v]) * y_n + bytes([chroma]) * c_n * 2)
    return b"".join(out)


def sniff(raw: bytes) -> bool:
    return raw[: len(MAGIC)] == MAGIC


def parse_y4m(raw: bytes) -> tuple[int, int, list[bytes]]:
    """(width, height, [frame bytes]) — header parse + frame demux.
    4:2:0 only (the subsampling this engine synthesizes)."""
    if not sniff(raw):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = raw.index(b"\n")
    header = raw[len(MAGIC) : nl].decode("ascii")
    width = height = None
    for tok in header.split():
        if tok.startswith("W"):
            width = int(tok[1:])
        elif tok.startswith("H"):
            height = int(tok[1:])
        elif tok.startswith("C") and not tok.startswith("C420"):
            raise ValueError(f"unsupported chroma subsampling {tok}")
    if not width or not height:
        raise ValueError("missing W/H in Y4M header")
    frame_len = width * height + 2 * ((width // 2) * (height // 2))
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(raw):
        fnl = raw.index(b"\n", pos)
        if not raw[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed FRAME marker")
        start = fnl + 1
        frame = raw[start : start + frame_len]
        if len(frame) != frame_len:
            raise ValueError("truncated frame")
        frames.append(frame)
        pos = start + frame_len
    return width, height, frames
