"""Baseline JPEG codec: quantization-bounded round-trips, the codec's
matrix DCT pinned against the spec's O(N^4) cosine-sum formula implemented
independently HERE, marker-walk structural validation, byte-stuffing /
restart-interval / 4:2:0 adversarial fixtures, explicit seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from miru_ray.functions.jpeg import (_D, _fdct_quant, decode_jpeg,
                                     encode_jpeg)


def _spec_dct(block: np.ndarray) -> np.ndarray:
    """ITU-T T.81 A.3.3 forward DCT as the literal O(N^4) cosine sum —
    the independent oracle for the codec's matrix form."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = sum(block[x, y]
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    * np.cos((2 * y + 1) * v * np.pi / 16)
                    for x in range(8) for y in range(8))
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_matrix_dct_matches_spec_formula():
    rng = np.random.default_rng(20)
    block = rng.integers(0, 256, (8, 8)).astype(np.float64) - 128.0
    assert np.allclose(_D @ block @ _D.T, _spec_dct(block), atol=1e-9)


def test_fdct_quant_zigzag_dc_position():
    # a constant block has ONLY a DC coefficient, and zigzag puts it first
    const = np.full((8, 8), 200, np.uint8)
    zz = _fdct_quant(const, np.ones((8, 8), np.int32))
    assert zz.shape == (1, 64)
    assert zz[0, 0] == round((200 - 128) * 8)   # orthonormal DC gain = 8
    assert not zz[0, 1:].any()


def test_gray_roundtrip_bounds():
    rng = np.random.default_rng(21)
    smooth = np.clip(np.add.outer(np.arange(40) * 3, np.arange(56) * 2),
                     0, 255).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(smooth, 100)), smooth)
    noise = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    err100 = np.abs(decode_jpeg(encode_jpeg(noise, 100)).astype(int)
                    - noise.astype(int)).max()
    assert err100 <= 1                          # all-ones table: roundoff only
    err50 = np.abs(decode_jpeg(encode_jpeg(smooth, 50)).astype(int)
                   - smooth.astype(int)).max()
    assert err50 <= 8                           # bounded by the quant step


def test_color_roundtrip_and_odd_dims():
    rng = np.random.default_rng(22)
    c = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)   # non-8-multiple
    y = decode_jpeg(encode_jpeg(c, 95))
    assert y.shape == c.shape
    assert np.abs(y.astype(int) - c.astype(int)).max() <= 16  # YCbCr+quant
    flat = np.zeros((16, 16, 3), np.uint8)
    flat[:, :8] = [200, 30, 60]
    flat[:, 8:] = [10, 180, 220]
    y = decode_jpeg(encode_jpeg(flat, 100))
    assert np.abs(y.astype(int) - flat.astype(int)).max() <= 2


def test_420_subsampling():
    # grey-chroma content survives 4:2:0 exactly at quality 100
    sm = np.clip(np.add.outer(np.arange(32) * 4, np.arange(48) * 2),
                 0, 255).astype(np.uint8)
    smc = np.stack([sm, sm, sm], -1)
    assert np.array_equal(decode_jpeg(encode_jpeg(smc, 100, subsample=True)),
                          smc)
    # colored content: bounded, and the stream is genuinely smaller
    rng = np.random.default_rng(23)
    base = rng.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    img = base.repeat(16, axis=0).repeat(16, axis=1)   # chroma-smooth blocks
    y = decode_jpeg(encode_jpeg(img, 100, subsample=True))
    inner = (slice(1, -1), slice(1, -1))               # off the block seams
    assert np.abs(y[inner].astype(int) - img[inner].astype(int)).max() <= 8
    assert len(encode_jpeg(img, 90, subsample=True)) < \
        len(encode_jpeg(img, 90))


def test_restart_intervals():
    rng = np.random.default_rng(24)
    g = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    blob = encode_jpeg(g, 100, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
    assert np.abs(decode_jpeg(blob).astype(int) - g.astype(int)).max() <= 1
    c = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(c, 90, subsample=True, restart_interval=2))
    b = decode_jpeg(encode_jpeg(c, 90, subsample=True))
    assert np.array_equal(a, b)   # restarts change framing, not pixels


def test_byte_stuffing_present_and_handled():
    # random noise at low quality emits 0xFF entropy bytes → stuffed 0xFF00
    rng = np.random.default_rng(25)
    for seed in range(8):
        g = np.random.default_rng(seed).integers(0, 256, (64, 64)) \
            .astype(np.uint8)
        blob = encode_jpeg(g, 30)
        scan = blob[blob.rindex(b"\xff\xda"):]
        if b"\xff\x00" in scan:
            decode_jpeg(blob)     # must decode through the stuffing
            return
    pytest.fail("no byte-stuffed 0xFF landed in any fixture scan")


def test_marker_walk_structure():
    """Independent container check: walk segment lengths from SOI and
    require a legal marker sequence ending at the scan."""
    blob = encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8), 90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    pos, seen = 2, []
    while True:
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        seen.append(marker)
        if marker == 0xDA:
            break
        size = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
        pos += 2 + size
    assert seen[0] == 0xE0                    # JFIF APP0 first
    assert 0xDB in seen and 0xC0 in seen and seen.count(0xC4) == 2


def test_explicit_seams():
    with pytest.raises(ValueError):
        decode_jpeg(b"GIF89a")
    # progressive (SOF2) is an explicit NotImplementedError seam
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    blob[blob.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker —
    libjpeg emits them. Decoding must be identical with padding inserted
    before every non-scan segment marker."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    blob = encode_jpeg(img, 90)
    ref = decode_jpeg(blob)
    padded, pos = [blob[:2]], 2
    while True:
        marker = blob[pos + 1]
        padded.append(b"\xff\xff\xff")           # three fill bytes
        if marker == 0xDA:
            padded.append(blob[pos:])
            break
        size = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
        padded.append(blob[pos:pos + 2 + size])
        pos += 2 + size
    assert np.array_equal(decode_jpeg(b"".join(padded)), ref)


def test_truncated_scan_raises_valueerror():
    """A payload cut mid-entropy-data must raise the codec's documented
    ValueError, not escape as IndexError."""
    blob = encode_jpeg(np.arange(4096, dtype=np.int64).astype(np.uint8)
                       .reshape(64, 64), 90)
    with pytest.raises(ValueError):
        decode_jpeg(blob[:len(blob) - len(blob) // 4])
