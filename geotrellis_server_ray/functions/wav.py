"""Minimal RIFF/WAVE PCM16 codec (public Microsoft/IBM RIFF spec).

The audio twin of functions/jpeg.py: gives the engine a REAL second-modality
decode path (reference analog: opaque asset byte reads,
stac/.../StacAssetRasterSource.scala:29-67). PCM is lossless, so unlike the
JPEG path no quantization argument is needed — encode->decode round-trips
samples bit-for-bit, which makes decoded audio statistics exactly
SQL-expressible for the oracle.

Only the shapes this engine produces are supported: mono, 16-bit PCM,
little-endian, one fmt + one data chunk (extra chunks are skipped per the
RIFF chunk-walk rules).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 mono samples, sample_rate). Walks chunks
    (skipping unknown ones, honoring the RIFF even-byte padding rule)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + ln > len(data):
            raise ValueError(
                f"truncated {cid!r} chunk: declares {ln} bytes, "
                f"{len(data) - pos - 8} remain")
        if cid == b"data" and ln % 2:
            raise ValueError("PCM16 data chunk has odd byte length")
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            audio_format, channels, sample_rate, _br, _ba, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if audio_format != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return samples, int(sample_rate)
