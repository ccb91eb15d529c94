"""Distributed k-means + SemDeDup (pipelines/cluster.py) vs a single-node
numpy oracle that replays the identical algorithm — centroids, cluster
assignments and greedy keep/dup_of decisions must match EXACTLY (the
quantized-int accumulation makes the distributed reduction bit-stable,
so exact equality is the contract, not a tolerance). Also pins:
parallelism invariance (different block structure → identical
centroids) and the SemDeDup↔near-dup consistency edge (every
(dup, dup_of) edge is an embedding_near_dups pair in the same cluster).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from miru_ray.pipelines import cluster

SF = "/root/testdata/sf0.01"


def _load(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack([np.asarray(e, dtype=np.float64)
                    for e in t["embedding"].to_pylist()])
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def _oracle_normalize(mat):
    nrm = np.linalg.norm(mat, axis=1)
    nrm[nrm == 0] = 1.0
    return mat / nrm[:, None]


def _oracle_kmeans(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """Independent single-node replay: same init recipe, same quantized
    accumulation (int sums are order-free, so one flat pass suffices)."""
    ids, mat = _load(sf_dir)
    x = _oracle_normalize(mat)
    train = x[ids < cluster._TRAIN_ROWS]   # _load already vec_id-sorts
    kk = min(k, len(train))
    # deterministic farthest-point init (greedy max-min cosine)
    chosen = [0]
    best = train @ train[0]
    for _ in range(1, kk):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        np.maximum(best, train @ train[nxt], out=best)
    cent = train[chosen].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        q = np.rint(x * cluster._QSCALE).astype(np.int64)
        sums = np.zeros((kk, x.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, q)
        counts = np.bincount(assign, minlength=kk)
        # identical vectorized update to kmeans_fit: norm(axis=1) and the
        # 1D dnrm2 BLAS path round differently in the last ulp, and the
        # contract is BIT equality
        nxt = cent.copy()
        nz = counts > 0
        mean = (sums[nz] / cluster._QSCALE) / counts[nz, None]
        nrm = np.linalg.norm(mean, axis=1)
        nrm[nrm == 0] = 1.0
        nxt[nz] = mean / nrm[:, None]
        cent = nxt
    return cent


def test_kmeans_matches_oracle_exactly(ray_session):
    got = cluster.kmeans_fit(SF)
    want = _oracle_kmeans(SF, cluster.KMEANS_K, cluster.KMEANS_ITERS)
    assert got.shape == want.shape
    assert np.array_equal(got, want)   # bit-identical, not allclose


def test_kmeans_parallelism_invariant(ray_session):
    """Different block structure → identical centroids (the int64
    accumulation is associative/commutative, so the reduction cannot
    depend on how Ray blocks the corpus)."""
    import ray.data as rd
    base = cluster.kmeans_fit(SF)
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    cluster._KM_CACHE.clear()
    try:
        ctx.target_max_block_size = 16 * 1024   # force many tiny blocks
        tiny = cluster.kmeans_fit(SF)
    finally:
        ctx.target_max_block_size = old
        cluster._KM_CACHE.clear()
    assert np.array_equal(base, tiny)


def test_semantic_clusters_assignment(ray_session):
    sc = cluster.semantic_clusters(SF).to_pandas()
    ids, mat = _load(SF)
    cent = _oracle_kmeans(SF, cluster.KMEANS_K, cluster.KMEANS_ITERS)
    x = _oracle_normalize(mat)
    sims = x @ cent.T
    want_assign = np.argmax(sims, axis=1)
    assert np.array_equal(sc["vec_id"].to_numpy(), ids)
    assert np.array_equal(sc["cluster"].to_numpy(), want_assign)
    want_sim = np.round(sims[np.arange(len(ids)), want_assign], 6)
    assert np.array_equal(sc["sim"].to_numpy(), want_sim)


def _oracle_semdedup(sf_dir: str, tau: float) -> pd.DataFrame:
    ids, mat = _load(sf_dir)
    cent = _oracle_kmeans(sf_dir, cluster.KMEANS_K, cluster.KMEANS_ITERS)
    x = _oracle_normalize(mat)
    assign = np.argmax(x @ cent.T, axis=1)
    rows = []
    for c in np.unique(assign):
        sel = np.flatnonzero(assign == c)      # ids already vec_id-sorted
        kept: list[int] = []
        for i in sel:
            if not kept:
                kept.append(i)
                rows.append((ids[i], c, True, -1))
                continue
            sims = x[kept] @ x[i]
            j = int(np.argmax(sims))
            if sims[j] >= tau:
                rows.append((ids[i], c, False, ids[kept[j]]))
            else:
                kept.append(i)
                rows.append((ids[i], c, True, -1))
    df = pd.DataFrame(rows, columns=["vec_id", "cluster", "keep", "dup_of"])
    return df.sort_values("vec_id").reset_index(drop=True)


def test_semdedup_matches_oracle(ray_session):
    got = cluster.semdedup(SF).to_pandas()
    want = _oracle_semdedup(SF, cluster.EMBED_NEAR_DUP_THRESHOLD)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (~got["keep"]).sum() > 0   # the fixture plants near-dups


def test_semdedup_edges_are_near_dup_pairs(ray_session):
    """Every (dup, dup_of) edge must be an embedding_near_dups pair:
    the greedy rule uses the same >= threshold on the same cosine."""
    from miru_ray.pipelines.ann import embedding_near_dups
    sd = cluster.semdedup(SF).to_pandas()
    dups = sd[~sd["keep"]]
    pairs = embedding_near_dups(SF).to_pandas()
    pairset = {(min(a, b), max(a, b))
               for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    for _, r in dups.iterrows():
        a, b = int(r["vec_id"]), int(r["dup_of"])
        assert (min(a, b), max(a, b)) in pairset


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_semdedup_small_sf_runs(sf, ray_session):
    out = cluster.semdedup(sf).to_pandas()
    ids, _ = _load(sf)
    assert len(out) == len(ids)
    assert out["keep"].dtype == bool
