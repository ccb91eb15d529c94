"""Minimal real WAV (RIFF/WAVE PCM) codec on stdlib struct — no external
audio libraries.

Scope (the subset a training-data pipeline's audio lane needs to prove the
plumbing end-to-end on genuine container bytes): integer PCM (format tag
1), 8-bit unsigned and 16-bit signed samples, mono or stereo, arbitrary
extra RIFF chunks skipped on decode (LIST/INFO, fact, padding). Float PCM,
ADPCM and compressed formats raise ``NotImplementedError`` — the explicit
seam for an ffmpeg/soundfile-backed decoder.

The decoder is pinned against the INDEPENDENT stdlib ``wave`` module in
tests/test_wav.py (both directions: ``wave``-written bytes decoded here,
and bytes encoded here read back by ``wave``), plus adversarial fixtures
with interleaved unknown chunks and odd-length chunk padding.

Format reference: the public RIFF/WAVE specification (Multimedia
Programming Interface and Data Specifications 1.0), reimplemented from
the spec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(samples: np.ndarray, sample_rate: int,
               bits: int = 16) -> bytes:
    """samples → RIFF/WAVE bytes.

    ``samples`` is (n,) mono or (n, channels) int16 (for ``bits=16``) or
    uint8 (for ``bits=8``); interleaved little-endian PCM, canonical
    44-byte header.
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"unsupported sample array shape {samples.shape}")
    n, channels = a.shape
    if bits == 16:
        body = a.astype("<i2").tobytes()
    elif bits == 8:
        body = a.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    data_pad = b"\x00" if len(body) % 2 else b""
    riff_body = (b"WAVE"
                 + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                 + b"data" + struct.pack("<I", len(body)) + body + data_pad)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, samples).

    ``samples`` is int16, shape (n,) for mono and (n, channels) otherwise;
    8-bit unsigned input is rescaled to the int16 range ((x-128)<<8, the
    conventional lossless widening). Walks the chunk list, skipping unknown
    chunks and honoring the spec's odd-length pad byte.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    pos, fmt_fields, data = 12, None, None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt_fields = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)        # chunks are word-aligned
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt_fields
    if audio_format != 1:
        raise NotImplementedError(
            f"WAVE format tag {audio_format} not supported (PCM only); "
            "swap decode_wav for an ffmpeg/soundfile-backed implementation")
    if channels < 1:
        raise ValueError("bad channel count")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2",
                          count=len(data) // 2).astype(np.int16)
    elif bits == 8:
        u = np.frombuffer(data, dtype=np.uint8)
        x = ((u.astype(np.int16) - 128) << 8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n = len(x) // channels
    x = x[:n * channels]
    return sample_rate, (x if channels == 1 else x.reshape(n, channels))
