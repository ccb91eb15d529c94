"""Per-term bloom filters over paired values — vectorized, OR-mergeable.

Re-expresses the reference's BloomIndex
(miru-plugin/.../index/BloomIndex.java:34-140: per-(field,term) bloom of
paired values, Guava optimal-bits/hashes sizing, ``mightContain``
candidate pruning; built at index time by
miru-service/.../stream/MiruIndexBloom.java:24-86). The Ray shape:

- hashing is md5-based double hashing (Kirsch–Mitzenmacher): one md5
  per DISTINCT value gives (h1, h2); bit index i = (h1 + i*h2) mod m.
  Engine-independent and deterministic — no dependence on a process
  seed, a hash-library version, or build parallelism.
- blooms are OR-mergeable: a per-batch partial bloom OR a per-partition
  bloom equals the single-pass bloom BIT-FOR-BIT, so they combine like
  the HLL registers (events.py distinct_count_hll) — the shuffle moves
  fixed-size byte rows per key, never the value sets.
- all kernels are numpy-vectorized over (key, value) pair arrays; the
  only per-element python is one md5 per distinct value (md5 has no
  vectorized kernel; value cardinality ≪ pair cardinality).

Sizing uses the same public formulas the reference does
(BloomIndex.java:64-73): m = -n·ln(p)/ln²2, k = max(1, round(m/n·ln2)).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

__all__ = [
    "optimal_num_bits", "optimal_num_hashes", "value_hash_pairs",
    "build_blooms", "might_contain", "DEFAULT_EXPECTED", "DEFAULT_FPP",
]

# fixed sizing for the paired-value blooms (expected distinct values per
# key, target false-positive rate) — fixed so bloom BYTES are a pure
# function of the pair set, independent of corpus statistics
DEFAULT_EXPECTED = 16
DEFAULT_FPP = 0.01


def optimal_num_bits(n: int, p: float) -> int:
    """BloomIndex.optimalNumOfBits (the public Guava formula)."""
    if p <= 0.0:
        p = 1e-300
    return max(8, int(-n * math.log(p) / (math.log(2) ** 2)))


def optimal_num_hashes(n: int, m: int) -> int:
    """BloomIndex.optimalNumOfHashFunctions."""
    return max(1, round(m / n * math.log(2)))


def value_hash_pairs(values) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 per value; md5-derived, h2 forced odd so the
    double-hash probe sequence cycles the whole bit space."""
    vals = list(values)
    h1 = np.empty(len(vals), dtype=np.uint64)
    h2 = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        d = hashlib.md5(str(v).encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:16], "little") | 1
    return h1, h2


def _bit_positions(h1: np.ndarray, h2: np.ndarray,
                   num_hashes: int, num_bits: int) -> np.ndarray:
    """(len(h1), num_hashes) bit indexes — (h1 + i*h2) mod m, vectorized."""
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(num_bits)).astype(np.int64)


def build_blooms(key_idx: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                 n_keys: int,
                 num_bits: int | None = None,
                 num_hashes: int | None = None) -> np.ndarray:
    """(n_keys, ceil(m/8)) uint8 bloom matrix from (key_idx, value-hash)
    pair arrays. ``key_idx`` is a factorized 0..n_keys-1 key per pair;
    (h1, h2) are the pair's VALUE hashes (``value_hash_pairs`` gathered
    through an inverse index — one md5 per distinct value)."""
    if num_bits is None:
        num_bits = optimal_num_bits(DEFAULT_EXPECTED, DEFAULT_FPP)
    if num_hashes is None:
        num_hashes = optimal_num_hashes(DEFAULT_EXPECTED, num_bits)
    nbytes = (num_bits + 7) // 8
    out = np.zeros((n_keys, nbytes), dtype=np.uint8)
    if len(key_idx) == 0:
        return out
    bits = _bit_positions(h1, h2, num_hashes, num_bits)       # (pairs, k)
    rows = np.repeat(key_idx.astype(np.int64), num_hashes)
    flat = bits.ravel()
    np.bitwise_or.at(out, (rows, flat >> 3),
                     np.left_shift(np.uint8(1), (flat & 7).astype(np.uint8)))
    return out


def might_contain(blooms: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                  num_bits: int | None = None,
                  num_hashes: int | None = None) -> np.ndarray:
    """Probe row i of ``blooms`` for value-hash (h1[i], h2[i]) → bool
    array. No false negatives by construction; false positives at the
    sized fpp. Vectorized over all probes at once."""
    if num_bits is None:
        num_bits = optimal_num_bits(DEFAULT_EXPECTED, DEFAULT_FPP)
    if num_hashes is None:
        num_hashes = optimal_num_hashes(DEFAULT_EXPECTED, num_bits)
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    bits = _bit_positions(h1, h2, num_hashes, num_bits)       # (probes, k)
    rows = np.repeat(np.arange(len(h1), dtype=np.int64), num_hashes)
    flat = bits.ravel()
    got = blooms[rows, flat >> 3] & np.left_shift(
        np.uint8(1), (flat & 7).astype(np.uint8))
    return (got != 0).reshape(len(h1), num_hashes).all(axis=1)
