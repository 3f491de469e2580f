"""Pure-Python Y4M (YUV4MPEG2) codec (zero dependencies beyond numpy).

Y4M is the uncompressed video interchange format every ffmpeg pipeline can
emit: an ASCII stream header (``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``),
then per frame an ASCII ``FRAME`` marker and raw planar YUV bytes. With
4:2:0 subsampling a frame is w·h luma bytes + 2·(w/2·h/2) chroma bytes.
Trivial struct layout → real frame demux/extract needs no ffmpeg, which
gives the multimodal VIDEO path an actually executable leg in this
container (mirroring functions/bmp.py for images and functions/wav.py for
audio); compressed containers (MP4/WebM) genuinely need external codecs
and stay env-gated.

Format layout from the public YUV4MPEG2 specification (mjpegtools,
ubiquitous in video tooling); no third-party codec code was consulted.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def y4m_encode(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """n×h×w uint8 luma-plane stack → Y4M bytes (4:2:0, neutral chroma).

    Chroma planes are filled with 128 (grey) — the luma plane carries the
    signal, which is what frame-level analytics read back."""
    if frames.ndim != 3:
        raise ValueError(f"expected n×h×w luma stack, got shape {frames.shape}")
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = bytearray(header)
    for i in range(n):
        out += b"FRAME\n"
        out += np.ascontiguousarray(frames[i], dtype=np.uint8).tobytes()
        out += chroma + chroma
    return bytes(out)


def y4m_decode(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M bytes → (n×h×w uint8 luma stack, (fps_num, fps_den)).

    Parses the stream header tags, then walks FRAME markers; only C420
    (the default) is supported — like the WAV/BMP codecs, anything else
    raises rather than silently mis-parsing."""
    nl = data.index(b"\n")
    fields = data[:nl].split(b" ")
    if fields[0] != _MAGIC:
        raise ValueError("not a Y4M payload (missing YUV4MPEG2 magic)")
    w = h = None
    fps = (25, 1)
    for tag in fields[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"F":
            num, den = tag[1:].split(b":")
            fps = (int(num), int(den))
        elif tag[:1] == b"C" and tag != b"C420":
            raise ValueError(f"only C420 supported, got {tag.decode()}")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H tags")
    frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("expected FRAME marker")
        body = fnl + 1
        luma = np.frombuffer(data, dtype=np.uint8, count=h * w, offset=body)
        frames.append(luma.reshape(h, w))
        pos = body + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps
