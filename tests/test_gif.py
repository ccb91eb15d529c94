"""Animated-GIF codec: encoder/decoder round-trips across every LZW code
width and the 4096-entry table reset, a hand-packed bitstream assembled in
the TEST as an independent spec oracle, interlace, sub-block splits, and
offset/transparency/disposal compositing fixtures."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from miru_ray.functions.gif import (_lzw_decode, _lzw_encode, decode_gif,
                                    decode_gif_gray, encode_gif)


def test_lzw_roundtrip_width_boundaries_and_reset():
    rng = np.random.default_rng(10)
    # random bytes barely compress: 20k pixels crosses the 512/1024/2048/
    # 4096 code-width boundaries and forces at least one table reset
    for n in [1, 2, 255, 256, 257, 511, 513, 1024, 4096, 20000]:
        x = rng.integers(0, 256, n).astype(np.uint8)
        assert np.array_equal(_lzw_decode(_lzw_encode(x, 8), 8, n), x), n
    for mcs in [2, 4, 8]:       # variable min code sizes
        x = rng.integers(0, 1 << mcs, 5000).astype(np.uint8)
        assert np.array_equal(_lzw_decode(_lzw_encode(x, mcs), mcs, 5000), x)


def test_lzw_hand_packed_spec_oracle():
    """Independent oracle: pack the spec-derived code sequence for pixels
    [0,1,2,2,1] at min code size 2 BY HAND (clear=4, eoi=5; codes
    4,0,1,2 at 3 bits — the table reaches 8 entries after (2,2) so the
    width grows — then 2,1,5 at 4 bits, LSB-first), and require both our
    decoder to invert it and our encoder to produce those exact bytes."""
    codes = [(4, 3), (0, 3), (1, 3), (2, 3), (2, 4), (1, 4), (5, 4)]
    acc = nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    hand = bytes(out)
    pixels = np.array([0, 1, 2, 2, 1], dtype=np.uint8)
    assert np.array_equal(_lzw_decode(hand, 2, 5), pixels)
    assert _lzw_encode(pixels, 2) == hand


def test_lzw_kwkwk_case():
    # aaa... streams hit the code==next_code (KwKwK) branch immediately
    x = np.zeros(1000, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(x, 8), 8, 1000), x)


def test_gif_roundtrip_and_interlace():
    rng = np.random.default_rng(11)
    for shape in [(1, 1, 1), (1, 3, 2), (2, 16, 16), (3, 64, 64),
                  (2, 128, 128)]:     # last forces in-frame table resets
        frames = rng.integers(0, 256, shape).astype(np.uint8)
        for interlace in (False, True):
            blob = encode_gif(frames, interlace=interlace)
            dec, palette = decode_gif(blob)
            assert np.array_equal(dec, frames), (shape, interlace)
            # greyscale palette → luma view is the identity
            assert np.array_equal(decode_gif_gray(blob), frames)
            assert np.array_equal(palette[:, 0],
                                  np.arange(256, dtype=np.uint8))


def test_gif_one_byte_sub_blocks():
    """Adversarial container: the same LZW stream re-split into 1-byte
    sub-blocks must decode identically (sub-block boundaries carry no
    meaning)."""
    frames = np.random.default_rng(12).integers(0, 256, (1, 9, 7)).astype(np.uint8)
    blob = bytearray(encode_gif(frames))
    # locate the image data: header(6)+LSD(7)+GCT(768)+GCE(8)+desc(10)+mcs(1)
    start = 6 + 7 + 768 + 8 + 10 + 1
    stream = bytearray()
    pos = start
    while blob[pos]:
        size = blob[pos]
        stream += blob[pos + 1:pos + 1 + size]
        pos += 1 + size
    resplit = b"".join(bytes([1, b]) for b in stream) + b"\x00"
    evil = bytes(blob[:start]) + resplit + bytes(blob[pos + 1:])
    assert np.array_equal(decode_gif(evil)[0], frames)


def _minimal_gif(w, h, bg, frames_spec):
    """Hand-assemble a GIF with per-frame (left, top, fw, fh, indices,
    transparent_idx, disposal) sub-rect frames over a grey GCT."""
    out = [b"GIF89a", struct.pack("<HHBBB", w, h, 0x80 | 0x07, bg, 0),
           np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1).tobytes()]
    for left, top, fw, fh, idx, transparent, disposal in frames_spec:
        gc_packed = (disposal << 2) | (1 if transparent >= 0 else 0)
        out.append(b"\x21\xf9\x04"
                   + struct.pack("<BHB", gc_packed, 0, max(transparent, 0))
                   + b"\x00")
        out.append(b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0))
        data = _lzw_encode(np.asarray(idx, np.uint8).ravel(), 8)
        out.append(b"\x08" + bytes([len(data)]) + data + b"\x00")
    out.append(b"\x3b")
    return b"".join(out)


def test_gif_offset_composite_transparency_disposal():
    """Frame 2 is a 2x2 sub-rect at (1,1) whose value-9 pixels are
    transparent: they must show frame 1 underneath. Frame 2 uses disposal
    2 (restore-to-background), so frame 3's untouched region reverts to
    the background color."""
    f1 = np.arange(12, dtype=np.uint8).reshape(3, 4) + 100
    patch = np.array([[9, 50], [60, 9]], np.uint8)
    f3 = np.array([[1]], np.uint8)
    blob = _minimal_gif(4, 3, bg=0, frames_spec=[
        (0, 0, 4, 3, f1, -1, 0),
        (1, 1, 2, 2, patch, 9, 2),
        (0, 0, 1, 1, f3, -1, 0),
    ])
    frames, _ = decode_gif(blob)
    assert np.array_equal(frames[0], f1)
    exp2 = f1.copy()
    exp2[1, 2] = 50
    exp2[2, 1] = 60      # the two 9s stay f1's values
    assert np.array_equal(frames[1], exp2)
    exp3 = exp2.copy()
    exp3[1:3, 1:3] = 0   # disposal 2 wiped frame 2's rect to bg
    exp3[0, 0] = 1
    assert np.array_equal(frames[2], exp3)


def test_gif_explicit_seams():
    with pytest.raises(ValueError):
        decode_gif(b"PNG...")
    # disposal 3 (restore-previous) is the explicit NotImplementedError seam
    blob = _minimal_gif(2, 2, 0, [
        (0, 0, 2, 2, np.zeros((2, 2), np.uint8), -1, 3),
        (0, 0, 2, 2, np.ones((2, 2), np.uint8), -1, 0),
    ])
    with pytest.raises(NotImplementedError):
        decode_gif(blob)


def _local_palette_gif(w, h, bg, frames_spec):
    """Like _minimal_gif but each frame carries (..., palette_or_None):
    a (256, 3) LOCAL color table, or None to use the grey global one."""
    out = [b"GIF89a", struct.pack("<HHBBB", w, h, 0x80 | 0x07, bg, 0),
           np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1).tobytes()]
    for left, top, fw, fh, idx, transparent, disposal, pal in frames_spec:
        gc_packed = (disposal << 2) | (1 if transparent >= 0 else 0)
        out.append(b"\x21\xf9\x04"
                   + struct.pack("<BHB", gc_packed, 0, max(transparent, 0))
                   + b"\x00")
        fpacked = 0 if pal is None else (0x80 | 0x07)
        out.append(b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, fpacked))
        if pal is not None:
            out.append(np.asarray(pal, np.uint8).tobytes())
        data = _lzw_encode(np.asarray(idx, np.uint8).ravel(), 8)
        out.append(b"\x08" + bytes([len(data)]) + data + b"\x00")
    out.append(b"\x3b")
    return b"".join(out)


def test_gif_single_frame_local_palette():
    """A lone frame with a non-grey LOCAL color table decodes through that
    table: index 200 on a red ramp (R=i, G=B=0) → luma 299*200//1000."""
    red = np.zeros((256, 3), np.uint8)
    red[:, 0] = np.arange(256)
    blob = _local_palette_gif(2, 2, 0, [
        (0, 0, 2, 2, np.full((2, 2), 200, np.uint8), -1, 0, red)])
    frames, palette = decode_gif(blob)
    assert np.array_equal(palette, red)
    assert np.array_equal(decode_gif_gray(blob),
                          np.full((1, 2, 2), 299 * 200 // 1000, np.uint8))


def test_gif_conflicting_palettes_luma_composite():
    """Frame 1 uses the grey global palette, frame 2 a red-ramp LOCAL one
    with transparency: the index view cannot express two palettes (its
    explicit seam), but the luma view composites per frame — transparent
    pixels keep frame 1's GREY luma while opaque ones take the RED luma."""
    red = np.zeros((256, 3), np.uint8)
    red[:, 0] = np.arange(256)
    f1 = np.full((2, 2), 100, np.uint8)
    f2 = np.array([[9, 200], [200, 9]], np.uint8)   # 9s transparent
    blob = _local_palette_gif(2, 2, 0, [
        (0, 0, 2, 2, f1, -1, 0, None),
        (0, 0, 2, 2, f2, 9, 0, red),
    ])
    with pytest.raises(NotImplementedError):
        decode_gif(blob)
    gray = decode_gif_gray(blob)
    assert np.array_equal(gray[0], f1)              # grey palette identity
    red200 = 299 * 200 // 1000
    assert np.array_equal(gray[1], np.array([[100, red200],
                                             [red200, 100]], np.uint8))


def test_gif_three_byte_gce_ignores_transparency():
    """A malformed 3-byte graphic-control sub-block (packed + delay, no
    transparent-index byte) must NOT read the following byte as the
    transparent index — the flag is ignored when the byte is absent."""
    idx = np.full((2, 2), 7, np.uint8)
    out = [b"GIF89a", struct.pack("<HHBBB", 2, 2, 0x80 | 0x07, 0, 0),
           np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1).tobytes(),
           # GCE with block size 3: packed(flag set) + 2-byte delay only
           b"\x21\xf9\x03" + struct.pack("<BH", 0x01, 0) + b"\x00",
           b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)]
    data = _lzw_encode(idx.ravel(), 8)
    out.append(b"\x08" + bytes([len(data)]) + data + b"\x00\x3b")
    frames, _ = decode_gif(b"".join(out))
    assert np.array_equal(frames[0], idx)        # no pixel went transparent
