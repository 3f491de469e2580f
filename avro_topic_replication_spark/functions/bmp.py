"""Pure-Python 24-bit BMP codec (zero dependencies beyond numpy).

BMP (Windows V3, BITMAPINFOHEADER) is a trivial struct format — 14-byte
file header, 40-byte info header, bottom-up rows of BGR triples padded to
4-byte boundaries — so real pixel decode/encode needs no PIL/cv2. This
gives the multimodal operators (queries/llm_multimodal.py) an actually
executable image path in this container: payloads are REAL image bytes and
the features are REAL pixel math, while formats that genuinely need
external codecs (JPEG, MP4) stay env-gated.

Format layout from the public Windows bitmap specification (the format is
ubiquitous and stable since 1990); no third-party codec code was consulted.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, px offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")
_HEADER_BYTES = _FILE_HEADER.size + _INFO_HEADER.size  # 54


def row_stride(width: int) -> int:
    """Bytes per stored row: 3·width padded up to a multiple of 4."""
    return (3 * width + 3) // 4 * 4


def encoded_size(width: int, height: int) -> int:
    """Total file size of a 24-bit BMP with the given dimensions."""
    return _HEADER_BYTES + height * row_stride(width)


def bmp_encode(pixels: np.ndarray) -> bytes:
    """h×w×3 uint8 RGB array → 24-bit uncompressed BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected h×w×3 RGB array, got shape {pixels.shape}")
    h, w, _ = pixels.shape
    stride = row_stride(w)
    size = encoded_size(w, h)
    out = bytearray(size)
    _FILE_HEADER.pack_into(out, 0, b"BM", size, 0, 0, _HEADER_BYTES)
    _INFO_HEADER.pack_into(
        out, _FILE_HEADER.size,
        40, w, h,  # header size, width, positive height → bottom-up rows
        1, 24,     # planes, bits per pixel
        0, h * stride,  # BI_RGB (uncompressed), image size
        2835, 2835,     # 72 DPI in pixels/metre
        0, 0,           # palette sizes (none for 24-bit)
    )
    bgr = np.ascontiguousarray(pixels[::-1, :, ::-1], dtype=np.uint8)  # bottom-up, BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    out[_HEADER_BYTES:] = rows.tobytes()
    return bytes(out)


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → h×w×3 uint8 RGB array."""
    magic, _, _, _, px_offset = _FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    hdr_size, w, h, planes, bpp, compression = _INFO_HEADER.unpack_from(
        data, _FILE_HEADER.size
    )[:6]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = row_stride(w)
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=px_offset)
    bgr = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb
