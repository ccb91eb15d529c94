"""RIFF/WAVE PCM codec: round-trips pinned against the INDEPENDENT stdlib
``wave`` module in both directions, plus adversarial chunk layouts."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from miru_ray.functions.wav import decode_wav, encode_wav


def test_roundtrip_mono16():
    x = np.random.default_rng(1).integers(-32768, 32768, 5000).astype(np.int16)
    sr, y = decode_wav(encode_wav(x, 16000))
    assert sr == 16000
    assert np.array_equal(x, y)


def test_stdlib_wave_reads_our_bytes():
    """Independent oracle direction 1: stdlib wave parses our encoder."""
    x = np.random.default_rng(2).integers(-32768, 32768, 3001).astype(np.int16)
    wf = wave.open(io.BytesIO(encode_wav(x, 8000)))
    assert (wf.getframerate(), wf.getnchannels(), wf.getsampwidth(),
            wf.getnframes()) == (8000, 1, 2, 3001)
    z = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    assert np.array_equal(z, x)


def test_we_read_stdlib_wave_bytes_stereo():
    """Independent oracle direction 2: we parse stdlib-wave-written bytes."""
    st = np.random.default_rng(3).integers(-32768, 32768, (100, 2)).astype(np.int16)
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(44100)
    w.writeframes(st.astype("<i2").tobytes())
    w.close()
    sr, y = decode_wav(buf.getvalue())
    assert sr == 44100
    assert y.shape == (100, 2)
    assert np.array_equal(y, st)


def test_8bit_widening():
    u8 = np.random.default_rng(4).integers(0, 256, 777).astype(np.uint8)
    sr, y = decode_wav(encode_wav(u8, 8000, bits=8))
    assert np.array_equal(y, (u8.astype(np.int16) - 128) << 8)


def test_unknown_chunks_and_odd_padding_skipped():
    """Adversarial layout: LIST chunk before fmt, an odd-length junk chunk
    (spec pad byte), fmt with trailing extension bytes — decode must walk
    past all of it to the data chunk."""
    x = np.arange(-50, 50, dtype=np.int16)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16) + b"\x00\x00"
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 10) + b"INFOjunk.."
            + b"odd " + struct.pack("<I", 3) + b"abc\x00"   # pad to word
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", x.nbytes) + x.astype("<i2").tobytes())
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, y = decode_wav(payload)
    assert sr == 8000
    assert np.array_equal(y, x)


def test_explicit_seams():
    with pytest.raises(ValueError):
        decode_wav(b"nope")
    # float PCM (format tag 3) is an explicit NotImplementedError seam
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
