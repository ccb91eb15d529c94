"""Minimal real baseline JPEG (JFIF) codec — pure numpy, no imaging libs.

Scope (the last named image-format seam in the media lane): baseline
sequential DCT, 8-bit, Huffman entropy coding. ENCODE writes greyscale or
4:4:4 YCbCr color JFIF with self-describing DQT/DHT segments (fixed-width
canonical Huffman tables — valid, if suboptimal, baseline JPEG) and a
frequency-weighted quality-scaled quantization table. DECODE is a general
baseline decoder: arbitrary DQT/DHT from the stream, greyscale / 4:4:4 /
4:2:0 chroma subsampling, restart markers (DRI/RSTn), byte unstuffing.
Progressive JPEG and arithmetic coding raise ``NotImplementedError`` —
the explicit seam for a PIL/libjpeg decoder.

Correctness pins (tests/test_jpeg.py): encode→decode round-trips bounded
by the quantization step (near-lossless at the all-ones table), the
codec's matrix DCT checked against the spec's O(N^4) cosine-sum formula
implemented independently in the TEST, marker-walk structural validation,
byte-stuffing and restart-interval adversarial fixtures.

JPEG is lossy: round-trips are bounded, not exact (contrast
functions/png.py / functions/gif.py, whose round-trips are bit-exact).

Format reference: the public JPEG specification (ITU-T T.81 / ISO 10918-1)
and the JFIF container spec, reimplemented from the spec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# 8x8 orthonormal DCT-II matrix: F = D @ block @ D.T
_K = np.arange(8)
_D = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) / 2.0
_D[0, :] = 1.0 / np.sqrt(8.0)

_ZIGZAG = sorted(((i, j) for i in range(8) for j in range(8)),
                 key=lambda t: (t[0] + t[1],
                                t[1] if (t[0] + t[1]) % 2 else t[0]))
_ZZ_ROWS = np.array([i for i, _ in _ZIGZAG])
_ZZ_COLS = np.array([j for _, j in _ZIGZAG])


def _quant_table(quality: int) -> np.ndarray:
    """Frequency-weighted quantization table: DC fine, high AC coarse.
    quality=100 → all-ones (near-lossless); lower → linearly coarser."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    slope = (100 - quality) / 10.0
    base = 1.0 + slope * (_K[:, None] + _K[None, :])
    return np.clip(np.round(base), 1, 255).astype(np.int32)


# --- canonical Huffman tables (self-describing via DHT) -------------------

def _fixed_tables() -> tuple[dict, dict, bytes, bytes]:
    """Fixed-width canonical tables: 12 DC size symbols at 4 bits, all 162
    AC run/size symbols at 8 bits. Valid baseline JPEG (Kraft < 1, no
    all-ones code); both sides derive from the same BITS/HUFFVAL bytes."""
    dc_vals = list(range(12))
    dc_bits = [0] * 16
    dc_bits[3] = 12                       # 12 codes of length 4
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)             # 162 codes of length 8
    dc_enc = _build_encode_table(dc_bits, dc_vals)
    ac_enc = _build_encode_table(ac_bits, ac_vals)
    dc_seg = bytes(dc_bits) + bytes(dc_vals)
    ac_seg = bytes(ac_bits) + bytes(ac_vals)
    return dc_enc, ac_enc, dc_seg, ac_seg


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# --- bit I/O ---------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:              # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_and_mark(self, rst_n: int) -> None:
        """Pad to a byte boundary with 1-bits and emit RSTn."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        self.out += bytes([0xFF, 0xD0 + (rst_n % 8)])

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG scan truncated mid-entropy-data")
        byte = self.data[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG scan truncated mid-entropy-data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:               # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:     # restart marker mid-fill
                raise _Restart()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read(self, length: int) -> int:
        while self.nbits < length:
            self._fill()
        self.nbits -= length
        v = (self.acc >> self.nbits) & ((1 << length) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_and_skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2


class _Restart(Exception):
    pass


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size, size-bit code) per the spec's extend convention."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _extend(code: int, size: int) -> int:
    return code if code >= (1 << (size - 1)) else code - (1 << size) + 1


# --- block transforms -------------------------------------------------------

def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(h, w) uint8, dims multiple of 8 → (n_blocks, 64) int32 zigzagged
    quantized coefficients, blocks in raster order."""
    h, w = plane.shape
    blocks = (plane.astype(np.float64) - 128.0) \
        .reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _D, blocks, _D)
    q = np.round(coef / qt).astype(np.int32)
    return q[:, :, _ZZ_ROWS, _ZZ_COLS].reshape(-1, 64)


def _dequant_idct(zz: np.ndarray, qt: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """(n_blocks, 64) zigzagged coefficients → (bh*8, bw*8) uint8 plane."""
    coef = np.zeros((len(zz), 8, 8), dtype=np.float64)
    coef[:, _ZZ_ROWS, _ZZ_COLS] = zz
    coef *= qt
    px = np.einsum("ji,ajk,kl->ail", _D, coef, _D) + 128.0
    px = np.clip(np.round(px), 0, 255).astype(np.uint8)
    return px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def _encode_blocks(writer: _BitWriter, zz: np.ndarray, dc_pred: int,
                   dc_enc: dict, ac_enc: dict) -> int:
    for block in zz:
        diff = int(block[0]) - dc_pred
        dc_pred = int(block[0])
        size, mag = _magnitude(diff)
        code, length = dc_enc[size]
        writer.write(code, length)
        if size:
            writer.write(mag, size)
        nz = np.nonzero(block[1:])[0]
        prev = 0
        for idx in nz:
            run = idx - prev
            prev = idx + 1
            while run >= 16:
                code, length = ac_enc[0xF0]       # ZRL
                writer.write(code, length)
                run -= 16
            size, mag = _magnitude(int(block[1 + idx]))
            code, length = ac_enc[(run << 4) | size]
            writer.write(code, length)
            writer.write(mag, size)
        if prev < 63:
            code, length = ac_enc[0x00]           # EOB
            writer.write(code, length)
    return dc_pred


def _decode_block(reader: _BitReader, dc_pred: int, dc_tab: dict,
                  ac_tab: dict) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    size = _huff_decode(reader, dc_tab)
    diff = _extend(reader.read(size), size) if size else 0
    dc_pred += diff
    zz[0] = dc_pred
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_tab)
        if sym == 0x00:                           # EOB
            break
        if sym == 0xF0:                           # ZRL
            k += 16
            continue
        k += sym >> 4
        size = sym & 0x0F
        if k >= 64:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _extend(reader.read(size), size)
        k += 1
    return zz, dc_pred


# --- color ------------------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.round(np.stack([y, cb, cr], -1)), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge")


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


# --- public API -------------------------------------------------------------

def encode_jpeg(arr: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w) greyscale or (h, w, 3) RGB uint8 → baseline JFIF bytes
    (fixed canonical Huffman tables, quality-scaled DQT). ``subsample``
    writes 4:2:0 chroma (2x2-mean downsample) instead of 4:4:4;
    ``restart_interval`` > 0 writes DRI + RSTn markers every that many
    MCUs."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim not in (2, 3) or (a.ndim == 3 and a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    gray = a.ndim == 2
    planes = [a] if gray else [_rgb_to_ycbcr(a)[..., i] for i in range(3)]
    sub = subsample and not gray
    if sub:
        # pad Y to a multiple of 16 so MCUs tile it with 2x2 blocks
        y = np.pad(planes[0], ((0, -h % 16), (0, -w % 16)), mode="edge")
        chroma = [np.pad(p, ((0, -h % 2), (0, -w % 2)), mode="edge")
                  .astype(np.float64) for p in planes[1:]]
        chroma = [np.clip(np.round((c[0::2, 0::2] + c[0::2, 1::2]
                                    + c[1::2, 0::2] + c[1::2, 1::2]) / 4.0),
                          0, 255).astype(np.uint8) for c in chroma]
        planes = [y] + [_pad_to_8(c) for c in chroma]
        samps = [0x22, 0x11, 0x11]
    else:
        planes = [_pad_to_8(p) for p in planes]
        samps = [0x11] * len(planes)
    qt = _quant_table(quality)
    dc_enc, ac_enc, dc_seg, ac_seg = _fixed_tables()

    out = [b"\xff\xd8",                                       # SOI
           _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
           _seg(0xDB, b"\x00" + qt[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()),
           _seg(0xC0, struct.pack(">BHHB", 8, h, w, len(planes))
                + b"".join(struct.pack(">BBB", cid + 1, samps[cid], 0)
                           for cid in range(len(planes)))),
           _seg(0xC4, b"\x00" + dc_seg),                      # DC table 0
           _seg(0xC4, b"\x10" + ac_seg)]                      # AC table 0
    if restart_interval:
        out.append(_seg(0xDD, struct.pack(">H", restart_interval)))
    out.append(_seg(0xDA, struct.pack(">B", len(planes))
                    + b"".join(struct.pack(">BB", cid + 1, 0x00)
                               for cid in range(len(planes)))
                    + b"\x00\x3f\x00"))
    writer = _BitWriter()
    blocks = [_fdct_quant(p, qt) for p in planes]
    preds = [0] * len(planes)
    if sub:
        mcux, mcuy = planes[1].shape[1] // 8, planes[1].shape[0] // 8
        ybw = planes[0].shape[1] // 8
    else:
        mcux, mcuy = planes[0].shape[1] // 8, planes[0].shape[0] // 8
    rst_n = 0
    for mcu in range(mcuy * mcux):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.pad_and_mark(rst_n)
            rst_n += 1
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, zz in enumerate(blocks):
            if sub and ci == 0:     # 2x2 Y blocks, raster within the MCU
                for dy in range(2):
                    for dx in range(2):
                        bi = (2 * my + dy) * ybw + (2 * mx + dx)
                        preds[ci] = _encode_blocks(writer, zz[bi:bi + 1],
                                                   preds[ci], dc_enc, ac_enc)
            else:
                bi = my * mcux + mx
                preds[ci] = _encode_blocks(writer, zz[bi:bi + 1], preds[ci],
                                           dc_enc, ac_enc)
    out.append(writer.flush())
    out.append(b"\xff\xd9")                                   # EOI
    return b"".join(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w) uint8 (greyscale) or (h, w, 3) uint8
    RGB. Supports arbitrary stream DQT/DHT, 4:4:4 and 4:2:0 sampling, and
    restart intervals; progressive/arithmetic raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them so libjpeg-padded streams parse
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("JPEG truncated at marker")
        marker = payload[pos + 1]
        if marker == 0xD9:                       # EOI
            break
        size = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + size]
        pos += 2 + size
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type 0xFF{marker:02x} (progressive/arithmetic/"
                "lossless) not supported; swap decode_jpeg for a "
                "PIL/libjpeg-backed implementation")
        if marker == 0xDB:                       # DQT (possibly several)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                t = np.zeros((8, 8), dtype=np.int32)
                t[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    body[bp + 1:bp + 65], dtype=np.uint8).astype(np.int32)
                qts[tq] = t
                bp += 65
        elif marker == 0xC4:                     # DHT (possibly several)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1:bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17:bp + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _build_decode_table(bits, vals)
                bp += 17 + n
        elif marker == 0xC0:                     # SOF0 baseline
            _, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
            frame = (fh, fw, comps)
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:                     # SOS → entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tabs = {body[1 + 2 * i]: (body[2 + 2 * i] >> 4,
                                           body[2 + 2 * i] & 0x0F)
                         for i in range(ns)}
            return _decode_scan(payload, pos, frame, qts, dc_tabs, ac_tabs,
                                scan_tabs, restart_interval)
    raise ValueError("no scan found in JPEG stream")


def _decode_scan(payload, pos, frame, qts, dc_tabs, ac_tabs, scan_tabs,
                 restart_interval):
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all((c["h"], c["v"]) in ((1, 1), (2, 2)) for c in comps):
        raise NotImplementedError("only 1x1 and 2x2 sampling factors supported")
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(payload, pos)
    per_comp_blocks: list[list[np.ndarray]] = [[] for _ in comps]
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.align_and_skip_restart()
            preds = [0] * len(comps)
        try:
            for ci, c in enumerate(comps):
                dt, at = scan_tabs[c["id"]]
                for _ in range(c["h"] * c["v"]):
                    zz, preds[ci] = _decode_block(reader, preds[ci],
                                                  dc_tabs[dt], ac_tabs[at])
                    per_comp_blocks[ci].append(zz)
        except _Restart:
            raise ValueError("restart marker inside an MCU") from None
    planes = []
    for ci, c in enumerate(comps):
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        zz = np.stack(per_comp_blocks[ci])
        # reorder MCU-major block order → raster block order
        idx = np.arange(len(zz)).reshape(mcuy, mcux, c["v"], c["h"]) \
            .transpose(0, 2, 1, 3).reshape(-1)
        plane = _dequant_idct(zz[idx], qts[c["tq"]], bh, bw)
        if c["h"] == 1 and hmax == 2:     # 4:2:0 chroma → upsample 2x
            plane = plane.repeat(2, axis=0).repeat(2, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return planes[0]
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
