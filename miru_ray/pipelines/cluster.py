"""Distributed spherical k-means + SemDeDup over the embeddings table.

Beyond-reference LLM-curation operators (the reference's only
probabilistic structure is the bloom index — SURVEY §2.8 lists
near-dedup as "none"): topic clustering of an embedding corpus and
semantic deduplication within clusters, after Abbas et al. 2023
("SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"): cluster the corpus, then inside each cluster drop all
but one member of every cosine-ball of near-identical embeddings.

Scale / determinism design
--------------------------
- **Lloyd iterations run distributed and ORDER-INVARIANT.** Each
  iteration is one ``map_batches`` pass emitting per-batch partial
  sums; the partials are integer-quantized (``rint(x * 2**_QSCALE)``)
  so the reduction is exact int64 addition — associative and
  commutative — and the reduced centroids are therefore BIT-IDENTICAL
  at any parallelism level / block structure (the float-sum-order
  problem the docID prefix sum also designs around). Headroom: int64
  holds ≤ 2**(62 - _QSCALE_BITS) vectors per cluster exactly
  (2**30 ≈ 1e9 at the default 32 bits; drop ``_QSCALE_BITS`` for
  hotter clusters — exactness, not correctness, is what the bound
  guards).
- **The corpus is scanned once, not once per iteration**: the pruned
  (vec_id, embedding) read is ``materialize()``-pinned in the object
  store, and every Lloyd pass iterates those blocks (Ray spills them
  to disk past memory — the streaming-friendly way to loop a Dataset).
- **Init is deterministic farthest-point** (greedy max-min cosine,
  rng-free) over a bounded ``vec_id`` prefix — O(1) in corpus size via
  parquet predicate pushdown, bit-stable across runs, and covers every
  dense region a random draw can double-book or miss (the k-means++
  property).
- **Assignment is a pure function** of (embedding, centroids): one
  embarrassingly-parallel ``map_batches``, no exchange; ties break to
  the lowest cluster id (``argmax`` takes the first maximum).
- **SemDeDup is per-cluster work**: ``groupby(cluster).map_groups``
  ships each cluster's vectors to one task; the greedy keep-first scan
  is O(m²·d) in the CLUSTER size only. The paper's scale assumption is
  the same: k grows with the corpus so m = n/k stays bounded; a hot
  cluster is split by raising k.

Greedy rule (deterministic): walk members by vec_id ascending; a member
is a duplicate iff its max cosine to an already-KEPT member meets
``tau`` (``>=``, matching the embedding near-dup tiers, so every
(dup, dup_of) edge is also an ``embedding_near_dups`` pair); ``dup_of``
is the argmax kept member (ties → earliest kept).
The pytest oracle (tests/test_cluster.py) replays the identical
algorithm single-node in numpy and pins centroids, assignments and
keep/dup_of decisions exactly; repartitioned re-runs pin the
parallelism invariance.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from miru_ray.sources.tables import read_table

KMEANS_K = 10          # fixture embeddings carry 10 planted label groups
KMEANS_ITERS = 8
_TRAIN_ROWS = 4096     # init sample bound (vec_id prefix, pushdown read)
_QSCALE_BITS = 32
_QSCALE = float(1 << _QSCALE_BITS)
# SemDeDup ball radius: the engine's one embedding near-dup threshold
# (ADVICE r4 #5: thresholds interpolate from a single shared constant)
from miru_ray.pipelines.ann import (EMBED_NEAR_DUP_THRESHOLD,  # noqa: E402
                                    _embedding_matrix)

__all__ = ["kmeans_fit", "semantic_clusters", "semantic_clusters_ds",
           "semdedup", "semdedup_ds", "KMEANS_K", "KMEANS_ITERS"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(mat, axis=1)
    nrm[nrm == 0] = 1.0
    return mat / nrm[:, None]


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic farthest-point init over a bounded vec_id prefix
    (one pushdown read, no corpus scan — the IVF trainer's sample
    bound). Greedy max-min: start at the lowest vec_id, then repeatedly
    take the sample point with the smallest max-cosine to the chosen
    set (ties → lowest vec_id). Unlike a seeded random choice this
    cannot double-book one dense region while missing another — the
    k-means++ coverage property, made rng-free so the recipe is trivial
    for the single-node oracle to replay."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=pads.field("vec_id") < _TRAIN_ROWS)
    ids, mat = _embedding_matrix(t)
    order = np.argsort(ids, kind="stable")   # file order is not a contract
    x = _normalize(mat)[order]
    k = min(k, len(x))
    chosen = [0]
    best = x @ x[0]                          # max cos to the chosen set
    for _ in range(1, k):
        nxt = int(np.argmin(best))           # farthest point, first tie
        chosen.append(nxt)
        np.maximum(best, x @ x[nxt], out=best)
    return x[chosen].copy()


def _partial_fn(cent_ref, k: int, dim: int):
    """Per-batch Lloyd partial: quantized int64 per-cluster sums + counts.
    One row per (batch, cluster) — k rows of d int64s, tiny vs the batch."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        _ids, mat = _embedding_matrix(batch)
        x = _normalize(mat)
        assign = np.argmax(x @ cent.T, axis=1)
        q = np.rint(x * _QSCALE).astype(np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, assign, q)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        return pa.table({
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "count": pa.array(counts),
            "qsum": pa.array(list(sums), pa.list_(pa.int64())),
        })
    return partial


def kmeans_fit(sf_dir: str, k: int = KMEANS_K,
               iters: int = KMEANS_ITERS) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) over the full embeddings
    corpus. Returns the (k×d float64) centroid matrix — bit-identical
    across runs and parallelism levels (quantized-int accumulation)."""
    import ray

    from miru_ray.state.layout import stat_validated_memo
    src = os.path.join(sf_dir, "embeddings.parquet")

    def build() -> np.ndarray:
        cent = _init_centroids(sf_dir, k)
        kk, dim = cent.shape
        ds = read_table(sf_dir, "embeddings",
                        columns=["vec_id", "embedding"]).materialize()
        for _ in range(iters):
            cent_ref = ray.put(cent)
            part = ds.map_batches(_partial_fn(cent_ref, kk, dim),
                                  batch_format="pyarrow").to_pandas()
            # int64 reduction: exact in any order
            sums = np.zeros((kk, dim), dtype=np.int64)
            counts = np.zeros(kk, dtype=np.int64)
            for c, n, qs in zip(part["cluster"], part["count"], part["qsum"]):
                sums[c] += np.asarray(qs, dtype=np.int64)
                counts[c] += n
            nxt = cent.copy()            # empty clusters keep their centroid
            nz = counts > 0
            mean = (sums[nz] / _QSCALE) / counts[nz, None]
            nrm = np.linalg.norm(mean, axis=1)
            nrm[nrm == 0] = 1.0
            nxt[nz] = mean / nrm[:, None]
            cent = nxt
        return cent

    return stat_validated_memo(_KM_CACHE, (os.path.abspath(src), k, iters),
                               src, build, max_entries=4)


_KM_CACHE: dict[tuple, tuple[tuple, np.ndarray]] = {}


def semantic_clusters_ds(sf_dir: str, k: int = KMEANS_K,
                         iters: int = KMEANS_ITERS):
    """Lazy Dataset of (vec_id, cluster, sim): nearest trained centroid
    per vector + its cosine (rounded 6 dp). Pure per-batch function of
    the broadcast centroids — no exchange."""
    import ray
    cent = kmeans_fit(sf_dir, k, iters)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, mat = _embedding_matrix(batch)
        x = _normalize(mat)
        sims = x @ c.T
        a = np.argmax(sims, axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
            "sim": pa.array(np.round(sims[np.arange(len(a)), a], 6),
                            pa.float64()),
        })

    return read_table(sf_dir, "embeddings",
                      columns=["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow")


def semantic_clusters(sf_dir: str, k: int = KMEANS_K,
                      iters: int = KMEANS_ITERS) -> pa.Table:
    """Driver-side collected form of :func:`semantic_clusters_ds`
    (vec_id asc). The collected table is a driver-contract adapter —
    assignment itself never leaves the workers."""
    df = semantic_clusters_ds(sf_dir, k, iters).to_pandas()
    df = df.sort_values("vec_id").reset_index(drop=True)
    return pa.table({"vec_id": pa.array(df["vec_id"].to_numpy(), pa.int64()),
                     "cluster": pa.array(df["cluster"].to_numpy(), pa.int64()),
                     "sim": pa.array(df["sim"].to_numpy(), pa.float64())})


def _greedy_keep(g, tau: float):
    """One cluster → (vec_id, cluster, keep, dup_of). Greedy keep-first
    by vec_id; dup_of = argmax-cosine kept member (ties → earliest)."""
    import pandas as pd
    ids = g["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    emb = np.stack([np.asarray(e, dtype=np.float64)
                    for e in g["embedding"].to_numpy()[order]])
    x = _normalize(emb)
    m = len(ids)
    keep = np.ones(m, dtype=bool)
    dup_of = np.full(m, -1, dtype=np.int64)
    kept_rows: list[int] = [0] if m else []
    for i in range(1, m):
        sims = x[kept_rows] @ x[i]
        j = int(np.argmax(sims))
        if sims[j] >= tau:   # same >= as the embedding near-dup tiers
            keep[i] = False
            dup_of[i] = ids[kept_rows[j]]
        else:
            kept_rows.append(i)
    return pd.DataFrame({"vec_id": ids,
                         "cluster": np.full(m, int(g["cluster"].iloc[0]),
                                            dtype=np.int64),
                         "keep": keep, "dup_of": dup_of})


def semdedup_ds(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                tau: float = EMBED_NEAR_DUP_THRESHOLD):
    """Lazy Dataset of (vec_id, cluster, keep, dup_of) — SemDeDup over
    the trained clusters. One groupby(cluster) exchange ships each
    cluster's vectors to one greedy task; work is O(m²·d) per CLUSTER."""
    import functools

    import ray
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # attach the cluster id to the embedding rows without a join: the
    # assignment is a pure function of the broadcast centroids, so
    # recompute it in the same pass (cheaper than shuffling an
    # (id, cluster) table against the vectors)
    cent = kmeans_fit(sf_dir, k, iters)
    cent_ref = ray.put(cent)

    def stamp(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        _ids, mat = _embedding_matrix(batch)
        a = np.argmax(_normalize(mat) @ c.T, axis=1).astype(np.int64)
        return batch.append_column("cluster", pa.array(a))

    return (emb.map_batches(stamp, batch_format="pyarrow")
               .groupby("cluster")
               .map_groups(functools.partial(_greedy_keep, tau=tau),
                           batch_format="pandas"))


def semdedup(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS,
             tau: float = EMBED_NEAR_DUP_THRESHOLD) -> pa.Table:
    """Driver-side collected form of :func:`semdedup_ds` (vec_id asc)."""
    df = semdedup_ds(sf_dir, k, iters, tau).to_pandas()
    df = df.sort_values("vec_id").reset_index(drop=True)
    return pa.table({"vec_id": pa.array(df["vec_id"].to_numpy(), pa.int64()),
                     "cluster": pa.array(df["cluster"].to_numpy(), pa.int64()),
                     "keep": pa.array(df["keep"].to_numpy(), pa.bool_()),
                     "dup_of": pa.array(df["dup_of"].to_numpy(), pa.int64())})
