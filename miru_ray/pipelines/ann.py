"""Similarity search over the ``embeddings`` table (list<float> column).

- brute-force cosine top-k: the query matrix is broadcast once via
  ``ray.put``; every batch does one numpy matmul. The baseline and the
  correctness oracle.
- LSH-bucketed ANN: random-hyperplane signatures (deterministic seed)
  bucket vectors; a query probes its own bucket (+ optional neighbors) —
  the scale path where brute force stops fitting; recall is measured
  against brute force in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from miru_ray.sources.tables import read_table

__all__ = ["ann_topk_bruteforce", "ann_topk_lsh", "lsh_buckets",
           "embedding_near_dups"]

_LSH_PLANES = 6   # 64 buckets; multi-probe Hamming<=2 → ~1/3 of space scanned


def _embedding_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    emb = batch["embedding"].combine_chunks() if isinstance(
        batch["embedding"], pa.ChunkedArray) else batch["embedding"]
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = emb.offsets.to_numpy(zero_copy_only=False)
    dim = offsets[1] - offsets[0]
    mat = flat.reshape(len(emb), dim)
    ids = batch["vec_id"].to_numpy()
    return ids, mat


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.dataset as pads
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=pads.field("vec_id") == vec_id)
    return np.array(t["embedding"][0].as_py(), dtype=np.float64)


def ann_topk_bruteforce(sf_dir: str, vec_id: int = 0, k: int = 20) -> pa.Table:
    """(vec_id, sim) top-k by cosine to the query vector (query excluded);
    order (sim desc, vec_id asc); sim rounded to 6 dp."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _embedding_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qv) / norms
        # per-batch partial top-k: never ship full score columns
        keep = min(k + 1, len(ids))
        top = np.argpartition(-sims, keep - 1)[:keep]
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()),
                         "sim": pa.array(sims[top], pa.float64())})

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    partials = partials[partials["vec_id"] != vec_id]
    order = np.lexsort((partials["vec_id"].to_numpy(),
                        -partials["sim"].to_numpy()))[:k]
    sel = partials.iloc[order]
    return pa.table({"vec_id": pa.array(sel["vec_id"].to_numpy(), pa.int64()),
                     "sim": pa.array(np.round(sel["sim"].to_numpy(), 6), pa.float64())})


def embedding_near_dups(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """(vec_a, vec_b, sim) — embedding-cosine near-duplicate pairs
    (vec_a < vec_b, sim ≥ threshold, rounded 6 dp; sorted by pair).

    The full normalized matrix is broadcast once (ray.put); each batch does
    one batch×corpus matmul and emits only above-threshold pairs — the
    brute-force O(n²) tier of the dedup ladder (LSH bucketing is the scale
    path, see ann_topk_lsh / dedup.minhash_near_dups).
    """
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    all_ids, all_mat = _embedding_matrix(tbl)
    norms = np.linalg.norm(all_mat, axis=1)
    norms[norms == 0] = 1.0
    all_n = all_mat / norms[:, None]
    mat_ref = ray.put((all_ids.astype(np.int64), all_n))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(mat_ref)
        ids, mat = _embedding_matrix(batch)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        sims = (mat / nrm[:, None]) @ m_all.T
        rows, cols = np.nonzero(sims >= threshold)
        a = ids[rows].astype(np.int64)
        b = ids_all[cols]
        keep = a < b
        return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                         "vec_b": pa.array(b[keep], pa.int64()),
                         "sim": pa.array(sims[rows, cols][keep], pa.float64())})

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.table({"vec_a": pa.array(out["vec_a"].to_numpy(), pa.int64()),
                     "vec_b": pa.array(out["vec_b"].to_numpy(), pa.int64()),
                     "sim": pa.array(np.round(out["sim"].to_numpy(), 6), pa.float64())})


def lsh_buckets(mat: np.ndarray, dim: int) -> np.ndarray:
    """Random-hyperplane signature per row (uint32 bucket id)."""
    planes = np.random.default_rng(99).standard_normal((dim, _LSH_PLANES))
    bits = (mat @ planes) > 0
    weights = (1 << np.arange(_LSH_PLANES)).astype(np.uint32)
    return (bits.astype(np.uint32) * weights).sum(axis=1).astype(np.uint32)


def ann_topk_lsh(sf_dir: str, vec_id: int = 0, k: int = 20) -> pa.Table:
    """LSH-bucketed approximate top-k: score only vectors whose signature
    is within Hamming distance 1 of the query's bucket."""
    q = query_vector(sf_dir, vec_id)
    dim = len(q)
    qn = q / np.linalg.norm(q)
    q_sig = int(lsh_buckets(qn[None, :], dim)[0])
    probe = {q_sig}
    for i in range(_LSH_PLANES):          # multi-probe: Hamming distance <= 2
        probe.add(q_sig ^ (1 << i))
        for j in range(i + 1, _LSH_PLANES):
            probe.add(q_sig ^ (1 << i) ^ (1 << j))
    probe_arr = np.array(sorted(probe), dtype=np.uint32)
    refs = ray.put((qn, probe_arr))

    def score(batch: pa.Table) -> pa.Table:
        qv, probes = ray.get(refs)
        ids, mat = _embedding_matrix(batch)
        sigs = lsh_buckets(mat, mat.shape[1])
        mask = np.isin(sigs, probes)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sub = mat[mask]
        norms = np.linalg.norm(sub, axis=1)
        norms[norms == 0] = 1.0
        sims = (sub @ qv) / norms
        return pa.table({"vec_id": pa.array(ids[mask], pa.int64()),
                         "sim": pa.array(sims, pa.float64())})

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    partials = partials[partials["vec_id"] != vec_id]
    order = np.lexsort((partials["vec_id"].to_numpy(),
                        -partials["sim"].to_numpy()))[:k]
    sel = partials.iloc[order]
    return pa.table({"vec_id": pa.array(sel["vec_id"].to_numpy(), pa.int64()),
                     "sim": pa.array(np.round(sel["sim"].to_numpy(), 6), pa.float64())})
