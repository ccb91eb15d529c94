"""Minimal real animated-GIF codec — pure stdlib/numpy, no imaging libs.

Scope (the subset a training-data pipeline's video lane needs to prove the
plumbing end-to-end on genuine compressed container bytes): GIF87a/GIF89a
decode with full GIF-variant LZW (variable code width 3..12 bits, clear /
end-of-information codes, 4096-entry table reset), global and local color
tables, multi-frame animations with graphic-control extensions, frame
sub-rectangles composited onto the logical screen, transparency, disposal
methods 0/1 (leave) and 2 (restore-to-background), and four-pass interlace
deinterlacing. ENCODE writes GIF89a animations with a 256-entry greyscale
palette (index == intensity, so greyscale frames round-trip exactly),
optionally interlaced. Disposal method 3 (restore-previous) raises
``NotImplementedError`` — the explicit seam for a PIL/ffmpeg decoder.

Correctness pins (tests/test_gif.py): encoder→decoder golden-pixel
round-trips across code-width growth and table-reset boundaries, a
hand-packed LZW bitstream assembled in the TEST from the spec's algorithm
as an independent oracle, and adversarial sub-block splits / interlace /
offset-composite fixtures.

Format reference: the public GIF89a specification (CompuServe, 1990),
reimplemented from the spec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif", "decode_gif_gray"]

_GRAY_PALETTE = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> np.ndarray:
    """Row output order of an interlaced frame (four passes)."""
    return np.concatenate([np.arange(start, height, step)
                           for start, step in _INTERLACE_PASSES])


# --- LZW (GIF variant: LSB-first bit packing, growing code width) --------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, code_size)
    data = indices.astype(np.int64).ravel()
    current = int(data[0])
    for k in map(int, data[1:]):
        hit = table.get((current, k))
        if hit is not None:
            current = hit
            continue
        emit(current, code_size)
        if next_code < 4096:
            table[(current, k)] = next_code
            next_code += 1
            # the decoder's table lags one entry behind at read time (its
            # first add happens on the THIRD code), so the encoder widens
            # one entry later than the decoder's == (1 << code_size) rule
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table.clear()
            next_code = eoi + 1
            code_size = min_code_size + 1
        current = k
    emit(current, code_size)
    emit(eoi, code_size)
    if nbits:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


def _lzw_decode(payload: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in payload:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = table[:eoi + 1]
                next_code = eoi + 1
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                nbits = 0
                acc = 0
                break
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]     # the KwKwK case
            else:
                raise ValueError("LZW code out of range")
            out += entry
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= n_expected:
                break
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError(f"LZW stream short: {len(out)} < {n_expected}")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def _sub_blocks(data: bytes, block: int = 255) -> bytes:
    parts = [bytes([len(data[i:i + block])]) + data[i:i + block]
             for i in range(0, len(data), block)]
    return b"".join(parts) + b"\x00"


# --- container ------------------------------------------------------------

def encode_gif(frames: np.ndarray, delay_cs: int = 4,
               interlace: bool = False) -> bytes:
    """(n, h, w) or (h, w) uint8 greyscale frames → animated GIF89a bytes
    (256-entry greyscale global palette, full-screen frames)."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 2:
        a = a[None]
    if a.ndim != 3:
        raise ValueError(f"unsupported frame array shape {frames.shape}")
    n, h, w = a.shape
    out = [b"GIF89a",
           struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0),  # GCT, 256 entries
           _GRAY_PALETTE.tobytes()]
    for f in a:
        out.append(b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0)
                   + b"\x00")                      # GCE: disposal 0, opaque
        out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                         0x40 if interlace else 0))
        rows = f[_interlace_order(h)] if interlace else f
        out.append(b"\x08" + _sub_blocks(_lzw_encode(rows, 8)))
    out.append(b"\x3b")
    return b"".join(out)


def _parse_gif(payload: bytes):
    """Walk the container: → (w, h, bg, global_palette, items) where each
    item is (left, top, idx (fh, fw) uint8, effective_palette (256, 3),
    transparent, disposal). Compositing is left to the caller so the index
    view and the luma view can each do it in the right value space."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette = np.zeros((256, 3), dtype=np.uint8)
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        palette[:size] = np.frombuffer(
            payload[pos:pos + 3 * size], dtype=np.uint8).reshape(size, 3)
        pos += 3 * size
    items = []
    disposal, transparent = 0, -1
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                        # trailer
            break
        if block == 0x21:                        # extension
            label = payload[pos]
            pos += 1
            while payload[pos]:                  # sub-blocks
                size = payload[pos]
                if label == 0xF9 and size >= 3:  # graphic control
                    gc_packed = payload[pos + 1]
                    disposal = (gc_packed >> 2) & 0x07
                    # the transparent index is the FOURTH data byte — only
                    # present when size >= 4 (a truncated 3-byte GCE must
                    # not read the next sub-block's length as an index)
                    transparent = (payload[pos + 4]
                                   if gc_packed & 1 and size >= 4 else -1)
                pos += 1 + size
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB",
                                                   payload[pos:pos + 9])
        pos += 9
        pal = palette
        if fpacked & 0x80:                       # local color table
            size = 2 << (fpacked & 0x07)
            pal = palette.copy()
            pal[:size] = np.frombuffer(
                payload[pos:pos + 3 * size], dtype=np.uint8).reshape(size, 3)
            pos += 3 * size
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            size = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + size])
            pos += 1 + size
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code_size,
                          fw * fh).reshape(fh, fw)
        if fpacked & 0x40:                       # deinterlace
            un = np.empty_like(idx)
            un[_interlace_order(fh)] = idx
            idx = un
        if disposal == 3:
            raise NotImplementedError(
                "GIF disposal method 3 (restore-previous) not supported; "
                "swap decode_gif for a PIL/ffmpeg-backed implementation")
        items.append((left, top, idx, pal, transparent, disposal))
        disposal, transparent = 0, -1
    if not items:
        raise ValueError("GIF contains no image frames")
    return w, h, bg, palette, items


def decode_gif(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes → ((n, h, w) uint8 palette indices composited onto the
    logical screen, (256, 3) uint8 palette). Frames smaller than the screen
    composite over the previous frame per the disposal method. An animation
    whose frames use CONFLICTING palettes cannot be expressed as
    shared-palette indices — that raises the explicit decoder seam; the
    luma view (decode_gif_gray) handles it by compositing per frame."""
    w, h, bg, palette, items = _parse_gif(payload)
    for _, _, _, pal, _, _ in items:
        if pal is not palette and not np.array_equal(pal, palette):
            if len(items) == 1:
                palette = pal                    # single frame: just use it
            else:
                raise NotImplementedError(
                    "multi-frame GIF with conflicting local palettes has no "
                    "shared-palette index form; use decode_gif_gray or swap "
                    "in a PIL/ffmpeg-backed decoder")
    screen = np.full((h, w), bg, dtype=np.uint8)
    frames: list[np.ndarray] = []
    for left, top, idx, _, transparent, disposal in items:
        fh, fw = idx.shape
        region = screen[top:top + fh, left:left + fw]
        if transparent >= 0:
            region = np.where(idx == transparent, region, idx)
        else:
            region = idx
        screen[top:top + fh, left:left + fw] = region
        frames.append(screen.copy())
        if disposal == 2:                        # restore to background
            screen[top:top + fh, left:left + fw] = bg
    return np.stack(frames), palette


def _luma(palette: np.ndarray) -> np.ndarray:
    from miru_ray.functions.color import bt601_luma
    return bt601_luma(palette)


def decode_gif_gray(payload: bytes) -> np.ndarray:
    """GIF bytes → (n, h, w) uint8 luma frames (integer BT.601 over each
    frame's EFFECTIVE palette; identity for the greyscale palette
    encode_gif writes). Composites in luma space, so frames with differing
    local palettes — which the index view cannot express — decode
    correctly: pixels showing through transparency keep the luma of the
    palette they were drawn with."""
    w, h, bg, palette, items = _parse_gif(payload)
    bg_luma = _luma(palette)[bg]
    screen = np.full((h, w), bg_luma, dtype=np.uint8)
    frames: list[np.ndarray] = []
    for left, top, idx, pal, transparent, disposal in items:
        fh, fw = idx.shape
        gray = _luma(pal)[idx]
        region = screen[top:top + fh, left:left + fw]
        if transparent >= 0:
            region = np.where(idx == transparent, region, gray)
        else:
            region = gray
        screen[top:top + fh, left:left + fw] = region
        frames.append(screen.copy())
        if disposal == 2:                        # restore to background
            screen[top:top + fh, left:left + fw] = bg_luma
    return np.stack(frames)
