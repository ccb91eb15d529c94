"""Deduplication operator family over ``documents``.

- exact      — hash-partitioned exact dedup: groupby(fingerprint) → keep
  min doc_id (reference dual: timestamp-keyed dedupe in
  MiruPartitionAccessor.java:594-650, latest/first-wins semantics).
- minhash LSH — near-dup candidates: word-shingles → 64 minhashes →
  16 bands × 4 rows → groupby(band bucket) → candidate pairs → exact
  Jaccard verify. Shuffle moves (band_key, doc_id) rows only.
- simhash    — 64-bit simhash per doc (tf-weighted token hashes).
- ngram Jaccard — exact pairwise verify used by the LSH path and exposed
  for small candidate sets.

All hashes derive from md5 (stable across processes/versions — no Python
hash()).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min

from miru_ray.functions.tokenize import tokenize
from miru_ray.sources.tables import read_table

__all__ = ["dedup_exact", "minhash_near_dups", "simhash64", "shingle_set",
           "jaccard", "NUM_HASHES", "NUM_BANDS", "SHINGLE_K"]

NUM_HASHES = 64
NUM_BANDS = 16          # 16 bands × 4 rows
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
SHINGLE_K = 3
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(1234)
_A = _rng.integers(1, _MERSENNE, NUM_HASHES, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, NUM_HASHES, dtype=np.int64).astype(np.uint64)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def shingle_set(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Sorted uint64 hashes of word k-shingles."""
    toks = tokenize(text)
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([_md5_64(s) for s in joined], dtype=np.uint64))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_sig(shingles: np.ndarray) -> np.ndarray:
    """64 minhash values (uint64) for a shingle-hash set."""
    if len(shingles) == 0:
        return np.full(NUM_HASHES, np.uint64(_MERSENNE), dtype=np.uint64)
    # (h*a + b) mod p, vectorized over (shingles × hashes); uint64 wrap-mul
    # then mod keeps determinism (same op order everywhere)
    prod = shingles[:, None] * _A[None, :] + _B[None, :]
    return (prod % np.uint64(_MERSENNE)).min(axis=0)


def dedup_exact(sf_dir: str) -> pa.Table:
    """(doc_id, n_copies) — one survivor (min doc_id) per distinct text."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
               for t in batch["text"].to_pylist()]
        return pa.table({"fingerprint": pa.array(fps, pa.string()),
                         "doc_id": batch["doc_id"]})

    out = (ds.map_batches(fp, batch_format="pyarrow")
             .groupby("fingerprint")
             .aggregate(Min("doc_id", alias_name="doc_id"),
                        Count(alias_name="n_copies")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                     "n_copies": t["n_copies"].cast(pa.int64())})


def _band_rows(batch: pa.Table) -> pa.Table:
    """doc → NUM_BANDS (band_key, doc_id) rows; band_key folds band index +
    the band's minhash slice."""
    out_keys: list[str] = []
    out_ids: list[int] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sig = minhash_sig(shingle_set(text))
        for band in range(NUM_BANDS):
            sl = sig[band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND]
            out_keys.append(f"{band}:{sl[0]:x}:{sl[1]:x}:{sl[2]:x}:{sl[3]:x}")
            out_ids.append(doc_id)
    return pa.table({"band_key": pa.array(out_keys, pa.string()),
                     "doc_id": pa.array(out_ids, pa.int64())})


def _pairs_from_bucket(group: pd.DataFrame) -> pd.DataFrame:
    ids = np.unique(group["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})


def minhash_near_dups(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """(doc_a, doc_b, jaccard) — MinHash-LSH candidates verified by exact
    shingle Jaccard ≥ threshold. doc_a < doc_b; sorted output."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cand = (ds.map_batches(_band_rows, batch_format="pyarrow")
              .groupby("band_key").map_groups(_pairs_from_bucket,
                                              batch_format="pandas"))
    pairs = cand.to_pandas().drop_duplicates().sort_values(["doc_a", "doc_b"])
    if len(pairs) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    # verify: gather texts for the (small) candidate set, exact jaccard
    need = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import os
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"],
                        filters=pads.field("doc_id").isin(need))
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    sh = {d: shingle_set(texts[d]) for d in need}
    rows = {"doc_a": [], "doc_b": [], "jaccard": []}
    for da, db in zip(pairs["doc_a"], pairs["doc_b"]):
        j = jaccard(sh[int(da)], sh[int(db)])
        if j >= threshold:
            rows["doc_a"].append(int(da))
            rows["doc_b"].append(int(db))
            rows["jaccard"].append(round(j, 6))
    return pa.table({"doc_a": pa.array(rows["doc_a"], pa.int64()),
                     "doc_b": pa.array(rows["doc_b"], pa.int64()),
                     "jaccard": pa.array(rows["jaccard"], pa.float64())})


def simhash64(sf_dir: str) -> pa.Table:
    """(doc_id, simhash) — 64-bit tf-weighted simhash, hex string."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        from collections import Counter
        out = []
        for text in batch["text"].to_pylist():
            acc = np.zeros(64, dtype=np.int64)
            for tok, tf in Counter(tokenize(text)).items():
                h = _md5_64(tok)
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), tf, -tf)
            sim = np.uint64(0)
            for i in np.flatnonzero(acc > 0):
                sim |= np.uint64(1) << np.uint64(i)
            out.append(f"{int(sim):016x}")
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(out, pa.string())})

    out = ds.map_batches(f, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
