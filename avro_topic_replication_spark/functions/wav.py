"""Pure-Python 16-bit PCM WAV codec (zero dependencies beyond numpy).

WAV (RIFF/WAVE, canonical 44-byte header + little-endian PCM frames) is a
trivial struct format, so real audio decode/encode needs no soundfile or
ffmpeg. This gives the multimodal operators (queries/llm_multimodal.py) an
actually executable AUDIO path in this container — payloads are REAL WAV
bytes and the features are REAL sample math — mirroring what
``functions/bmp.py`` did for the image leg. Compressed audio (MP3/AAC/OGG)
genuinely needs external codecs and stays env-gated.

Format layout from the public RIFF/WAVE specification (Microsoft/IBM 1991,
ubiquitous and stable); no third-party codec code was consulted.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = struct.Struct("<4sI4s")  # 'RIFF', chunk size, 'WAVE'
_FMT = struct.Struct("<4sIHHIIHH")  # 'fmt ', 16, pcm, ch, sr, brate, align, bits
_DATA = struct.Struct("<4sI")  # 'data', byte count
HEADER_BYTES = _RIFF.size + _FMT.size + _DATA.size  # 44


def encoded_size(n_samples: int, channels: int = 1) -> int:
    return HEADER_BYTES + 2 * n_samples * channels


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 mono sample array → canonical 44-byte-header WAV bytes."""
    if samples.ndim != 1:
        raise ValueError(f"expected 1-D mono samples, got shape {samples.shape}")
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    out = bytearray(HEADER_BYTES + len(pcm))
    _RIFF.pack_into(out, 0, b"RIFF", 36 + len(pcm), b"WAVE")
    _FMT.pack_into(
        out, _RIFF.size,
        b"fmt ", 16,          # PCM fmt chunk is always 16 bytes
        1, 1,                 # audio format 1 = PCM, mono
        sample_rate, sample_rate * 2,  # byte rate = sr · block align
        2, 16,                # block align (2 bytes/frame), bits per sample
    )
    _DATA.pack_into(out, _RIFF.size + _FMT.size, b"data", len(pcm))
    out[HEADER_BYTES:] = pcm
    return bytes(out)


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (1-D int16 sample array, sample_rate).

    Walks RIFF chunks, so files with extra chunks (LIST, fact) between
    fmt and data also parse; only 16-bit mono PCM payloads are accepted.
    """
    riff, _, wave = _RIFF.unpack_from(data, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos = _RIFF.size
    sample_rate = channels = bits = None
    while pos + 8 <= len(data):
        cid, csize = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt_code, channels, sample_rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            if fmt_code != 1:
                raise ValueError(f"only PCM WAV supported (format={fmt_code})")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            if channels != 1 or bits != 16:
                raise ValueError(
                    f"only 16-bit mono supported (ch={channels}, bits={bits})"
                )
            samples = np.frombuffer(data, dtype="<i2", count=csize // 2, offset=body)
            return samples, sample_rate
        pos = body + csize + (csize & 1)  # RIFF chunks pad to even offsets
    raise ValueError("no data chunk found")
