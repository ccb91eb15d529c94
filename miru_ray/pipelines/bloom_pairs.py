"""Paired-value bloom sidecar: build at index time, prune candidates at
query time.

The reference attaches a bloom-of-paired-values to each (field, term)
at index build (miru-service/.../stream/MiruIndexBloom.java:24-86) and
answers "might term t pair with value v?" without touching postings
(miru-plugin/.../index/BloomIndex.java:96-140 ``mightContain``). The Ray
shape here indexes the events table's (user_id → props.k) pairs:

- **store build** (one hash-bucket shuffle, cached per source file):
  map_batches extracts k (shared vectorized jsonprops kernel) and
  locally dedups (user, k); one groupby on ``user_id % B`` then per
  bucket globally dedups, WRITES the sorted pairs parquet part (the
  exact store the verify step reads with predicate pushdown) and
  RETURNS the per-user bloom rows (77 bytes each) which stream to the
  bloom sidecar parquet. The shuffle moves locally-deduped pair rows;
  the sidecar is O(users), never O(events).
- **probe**: read ONLY the sidecar (KB per million users), test every
  (user, probe-k) candidate vectorized, then exact-verify the surviving
  candidates against the pairs store with a pushdown ``k IN probes``
  read. Bloom false positives die in the verify; false negatives are
  impossible, so the output is value-exact (the DuckDB oracle is plain
  SELECT DISTINCT). At 100 TB the win is the read asymmetry: absent
  pairs cost sidecar bytes only, and the verify read is pruned to the
  surviving k values' row groups.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from miru_ray.functions.bloom import (
    build_blooms, might_contain, optimal_num_bits, optimal_num_hashes,
    value_hash_pairs,
)
from miru_ray.functions.jsonprops import props_int_column
from miru_ray.sources.tables import read_table

__all__ = ["build_pair_bloom_store", "paired_bloom_contains",
           "PROBE_KS"]

_CACHE_ROOT = "/tmp/miru_ray_bloom"
_BUCKETS = 64
# sizing: ~49 distinct k per user on the fixture; 64 expected at 1% fpp
# → 613 bits (77 bytes), 7 hashes. Fixed so bloom bytes are a pure
# function of the pair set (parallelism- and corpus-stat-independent).
_EXPECTED = 64
_FPP = 0.01
_NUM_BITS = optimal_num_bits(_EXPECTED, _FPP)
_NUM_HASHES = optimal_num_hashes(_EXPECTED, _NUM_BITS)

# probe set for the driver entry: six present values, two absent —
# the absent ones exercise the prune-without-reading path
PROBE_KS = (0, 7, 13, 42, 77, 98, 250, 999)


def _store_dir(sf_dir: str) -> tuple[str, dict]:
    from miru_ray.state.layout import source_cache_dir
    return source_cache_dir(sf_dir, "events.parquet", "pairs", _CACHE_ROOT,
                            1, num_bits=_NUM_BITS, num_hashes=_NUM_HASHES)


_K_MISSING = np.iinfo(np.int64).min   # sentinel: props carries no 'k'


def _pair_partial(t: pa.Table) -> pa.Table:
    """Locally-deduped (bucket, user_id, k) rows for one batch. Rows
    whose props lack an integer 'k' are DROPPED (the SQL oracle's
    json_extract yields NULL there, which never matches any probe) —
    the sentinel default can't collide with a real probe value, unlike
    a 0 default which IS in PROBE_KS."""
    users = t["user_id"].to_numpy()
    ks = props_int_column(t["props"], "k", default=_K_MISSING)
    ok = ks != _K_MISSING
    users, ks = users[ok], ks[ok]
    if len(users) == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "user_id": pa.array([], pa.int64()),
                         "k": pa.array([], pa.int64())})
    pairs = np.unique(np.stack([users, ks], axis=1), axis=0)
    return pa.table({
        "bucket": pa.array(pairs[:, 0] % _BUCKETS, pa.int64()),
        "user_id": pa.array(pairs[:, 0], pa.int64()),
        "k": pa.array(pairs[:, 1], pa.int64()),
    })


def _k_hashes(ks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) per k — one md5 per DISTINCT k, gathered back."""
    uniq, inv = np.unique(ks, return_inverse=True)
    h1u, h2u = value_hash_pairs(uniq.tolist())
    return h1u[inv], h2u[inv]


def _bucket_indexer(pairs_root: str):
    """Per-bucket finisher: global pair dedup, write the pairs store
    part (sorted by user_id → row-group stats pushdown), emit bloom
    rows. A user hashes to exactly one bucket, so each user's bloom is
    built in one pass here — the OR-merge path (functions/bloom.py) is
    the cross-partition combine for layouts where that doesn't hold,
    and is pytest-verified bit-identical."""

    def index_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        bucket = int(g["bucket"].iloc[0])
        pairs = np.unique(
            np.stack([g["user_id"].to_numpy(), g["k"].to_numpy()], axis=1),
            axis=0)    # sorts by (user_id, k)
        users, ks = pairs[:, 0], pairs[:, 1]
        tmp = os.path.join(pairs_root, f".part-{bucket:03d}.tmp")
        pq.write_table(pa.table({"user_id": pa.array(users, pa.int64()),
                                 "k": pa.array(ks, pa.int64())}), tmp)
        os.replace(tmp, os.path.join(pairs_root, f"part-{bucket:03d}.parquet"))
        uq_users, key_idx = np.unique(users, return_inverse=True)
        h1, h2 = _k_hashes(ks)
        blooms = build_blooms(key_idx, h1, h2, len(uq_users),
                              _NUM_BITS, _NUM_HASHES)
        return pd.DataFrame({"user_id": uq_users,
                             "bloom": [b.tobytes() for b in blooms]})

    return index_bucket


def build_pair_bloom_store(sf_dir: str) -> str:
    """Build (or reuse) the pairs store + bloom sidecar for ``sf_dir``.
    Cached on the source file's (size, mtime) like the ANN indexes;
    commit is the last-written meta.json (crash → rebuilt)."""
    root, tag = _store_dir(sf_dir)
    meta_p = os.path.join(root, "meta.json")
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            if json.load(f) == tag:
                return root
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "pairs"), exist_ok=True)
    ds = read_table(sf_dir, "events", columns=["user_id", "props"])
    bloom_ds = (ds.map_batches(_pair_partial, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(_bucket_indexer(os.path.join(root, "pairs")),
                              batch_format="pandas"))
    bloom_ds.write_parquet(os.path.join(root, "blooms"))
    with open(meta_p + ".tmp", "w") as f:
        json.dump(tag, f)
    os.replace(meta_p + ".tmp", meta_p)
    return root


def paired_bloom_contains(sf_dir: str,
                          probe_ks: tuple[int, ...] = PROBE_KS) -> pa.Table:
    """(user_id, k) pairs among ``users × probe_ks`` that exist in the
    events table — bloom-sidecar prefilter, then exact verify of the
    survivors only. Sorted (user_id, k); value-exact vs SELECT DISTINCT."""
    root = build_pair_bloom_store(sf_dir)
    side = pq.read_table(os.path.join(root, "blooms"))
    users = side["user_id"].to_numpy()
    if len(users) == 0:   # empty corpus: empty result, not np.stack error
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "k": pa.array([], pa.int64())})
    blooms = np.stack([np.frombuffer(b, dtype=np.uint8)
                       for b in side["bloom"].to_pylist()])
    probes = np.asarray(sorted(probe_ks), dtype=np.int64)
    h1p, h2p = _k_hashes(probes)
    n_u = len(users)
    # probe per k value (≤ len(probe_ks) passes) over the SHARED bloom
    # matrix — never materialize the users×probes cross-product: peak
    # memory stays O(users), not O(users·probes) duplicated bloom rows
    cand_u_parts, cand_k_parts = [], []
    for j, kval in enumerate(probes):
        m = might_contain(blooms, np.full(n_u, h1p[j], dtype=h1p.dtype),
                          np.full(n_u, h2p[j], dtype=h2p.dtype),
                          _NUM_BITS, _NUM_HASHES)
        cand_u_parts.append(users[m])
        cand_k_parts.append(np.full(int(m.sum()), kval, dtype=np.int64))
    cand_u = (np.concatenate(cand_u_parts) if cand_u_parts
              else np.array([], np.int64))
    cand_k = (np.concatenate(cand_k_parts) if cand_k_parts
              else np.array([], np.int64))
    # exact verify: pushdown read of ONLY the probed k values' rows
    import pyarrow.dataset as pads
    truth = pq.read_table(
        os.path.join(root, "pairs"),
        filters=pads.field("k").isin(probes.tolist()))
    # injective pair key for |user| < 2^31, |k| < 2^31 (fixture contract)
    enc = lambda u, k: (u.astype(np.int64) << 32) ^ (k.astype(np.int64)
                                                     & 0xFFFFFFFF)
    keep = np.isin(enc(cand_u, cand_k),
                   enc(truth["user_id"].to_numpy(), truth["k"].to_numpy()))
    out = np.unique(np.stack([cand_u[keep], cand_k[keep]], axis=1), axis=0)
    return pa.table({"user_id": pa.array(out[:, 0], pa.int64()),
                     "k": pa.array(out[:, 1], pa.int64())})
