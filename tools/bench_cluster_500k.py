#!/usr/bin/env python
"""500k-vector k-means + SemDeDup robustness bench (round 5).

Generates a 500k x 64 embedding corpus with 10 planted Gaussian blobs
and 5,000 planted near-identical pairs (cosine > 0.99 within a blob),
then runs the distributed clustering operators at their scale shape:

  1. ``kmeans_fit`` (k=10) — full-corpus Lloyd over the materialized
     dataset; blob recovery is asserted (purity >= 0.99), and a second
     fit under a tiny target block size must be BIT-identical (the
     quantized-int reduction's order-invariance at scale);
  2. ``semantic_clusters_ds`` — streaming write, no driver collect;
  3. ``semdedup_ds`` (k=500) — the paper's bounded-cluster regime
     (m ~ n/k = 1000 per cluster keeps the greedy O(m^2 d) per-task
     work flat); consumed by a streaming ``write_parquet``; planted
     pair recall is asserted (>= 0.95 — a pair is only recallable when
     both ends co-cluster, the paper's accepted loss).

Driver RSS is sampled throughout. Prints one JSON line for
BENCH/BASELINE.md.

    python tools/bench_cluster_500k.py [--rows 500000] [--k-dedup 500]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
BLOBS = 10
PAIR_STRIDE = 100       # vec_id % PAIR_STRIDE == 0 duplicates vec_id-BLOBS


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def gen_embeddings(root: str, rows: int) -> None:
    """embeddings.parquet as a directory of files: blob = vec_id % 10
    (so the bounded init prefix sees every blob); vectors = unit blob
    center + 0.15 noise; every PAIR_STRIDE-th id >= PAIR_STRIDE copies
    id-BLOBS (same blob) + 1e-3 noise — a planted near-identical pair."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    done = os.path.join(root, "_DONE")
    stamp = f"{rows}/{DIM}/{BLOBS}/{PAIR_STRIDE}"
    if os.path.exists(done) and open(done).read() == stamp:
        return
    shutil.rmtree(root, ignore_errors=True)
    pdir = os.path.join(root, "embeddings.parquet")
    os.makedirs(pdir)
    # exactly-orthonormal blob centers (basis vectors): worst-case
    # cross-blob cosine is the noise floor, so blob recovery is a sharp
    # assertion, not a seed-dependent one
    centers = np.eye(DIM)[:BLOBS]
    per_file = 50_000
    noise_cache: dict[int, np.ndarray] = {}

    def noise(fidx: int) -> np.ndarray:
        if fidx not in noise_cache:
            if len(noise_cache) > 2:
                noise_cache.pop(min(noise_cache))
            noise_cache[fidx] = np.random.default_rng(
                1000 + fidx).normal(size=(per_file, DIM))
        return noise_cache[fidx]

    for fidx, lo in enumerate(range(0, rows, per_file)):
        hi = min(lo + per_file, rows)
        ids = np.arange(lo, hi, dtype=np.int64)
        frng = np.random.default_rng(5000 + fidx)   # dup-jitter stream
        mat = centers[ids % BLOBS] + 0.15 * noise(fidx)[: len(ids)]
        # planted near-identical pairs: rebuild the partner's vector from
        # ITS deterministic recipe (partner may live in the previous file)
        dup = (ids % PAIR_STRIDE == 0) & (ids >= PAIR_STRIDE)
        for i in np.flatnonzero(dup):
            src = int(ids[i]) - BLOBS     # same blob residue
            sf_idx, s_off = divmod(src, per_file)
            mat[i] = (centers[src % BLOBS] + 0.15 * noise(sf_idx)[s_off]
                      + 1e-3 * frng.normal(size=DIM))
        t = pa.table({"vec_id": pa.array(ids),
                      "embedding": pa.array(list(mat.astype(np.float32)),
                                            pa.list_(pa.float32())),
                      "label": pa.array((ids % BLOBS).astype(np.int32))})
        pq.write_table(t, os.path.join(pdir, f"part-{fidx:05d}.parquet"))
    with open(done, "w") as f:
        f.write(stamp)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--k-dedup", type=int, default=500)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from miru_ray.functions.runtime import mem_bw_gbps
    from miru_ray.pipelines import cluster

    root = "/tmp/miru_cluster_500k"
    t0 = time.perf_counter()
    gen_embeddings(root, args.rows)
    gen_s = round(time.perf_counter() - t0, 1)

    peak = {"rss": rss_mb()}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak["rss"] = max(peak["rss"], rss_mb())
            time.sleep(0.25)
    threading.Thread(target=sampler, daemon=True).start()

    out = {"rows": args.rows, "dim": DIM, "gen_s": gen_s,
           "bus_gbps": mem_bw_gbps(), "rss0_mb": round(rss_mb(), 1)}

    # 1. kmeans blob recovery + order-invariance under tiny blocks
    t0 = time.perf_counter()
    cent = cluster.kmeans_fit(root, k=BLOBS)
    out["kmeans_s"] = round(time.perf_counter() - t0, 1)
    sc = cluster.semantic_clusters_ds(root, k=BLOBS)
    import pandas as pd
    df = sc.to_pandas()            # (vec_id, cluster, sim): 500k rows, ~12 MB
    lab = df["vec_id"].to_numpy() % BLOBS
    ct = pd.crosstab(df["cluster"], lab)
    purity = float(ct.max(axis=1).sum() / len(df))
    out["purity"] = round(purity, 4)
    assert purity >= 0.99, f"blob recovery failed: purity={purity}"

    ctx = DataContext.get_current()
    old_bs = ctx.target_max_block_size
    cluster._KM_CACHE.clear()
    try:
        ctx.target_max_block_size = 1 * 1024 * 1024
        t0 = time.perf_counter()
        cent2 = cluster.kmeans_fit(root, k=BLOBS)
    finally:
        ctx.target_max_block_size = old_bs
        cluster._KM_CACHE.clear()
    out["kmeans_tinyblock_s"] = round(time.perf_counter() - t0, 1)
    assert np.array_equal(cent, cent2), "centroids depend on block plan"
    out["bit_identical_across_blocking"] = True

    # 2. streaming assignment write
    sink = "/tmp/miru_cluster_500k_assign"
    shutil.rmtree(sink, ignore_errors=True)
    t0 = time.perf_counter()
    cluster.semantic_clusters_ds(root, k=BLOBS).write_parquet(sink)
    out["assign_write_s"] = round(time.perf_counter() - t0, 1)

    # 3. SemDeDup at the bounded-cluster regime, streaming write.
    # tau=0.9: the planted pairs sit at cosine > 0.999 while the blob
    # noise floor is ~0.41 +- 0.09, so the flagged set is the planted
    # set (up to a handful of 5-sigma accidents)
    sink2 = "/tmp/miru_cluster_500k_semdedup"
    shutil.rmtree(sink2, ignore_errors=True)
    t0 = time.perf_counter()
    cluster.semdedup_ds(root, k=args.k_dedup, tau=0.9).write_parquet(sink2)
    out["semdedup_s"] = round(time.perf_counter() - t0, 1)

    import pyarrow.parquet as pq
    sd = pq.read_table(sink2).to_pandas()
    assert len(sd) == args.rows
    dups = sd[~sd["keep"]]
    planted = np.arange(PAIR_STRIDE, args.rows, PAIR_STRIDE)
    found = np.intersect1d(dups["vec_id"].to_numpy(), planted)
    recall = len(found) / len(planted)
    out["planted_pairs"] = int(len(planted))
    out["dup_rows"] = int(len(dups))
    out["planted_recall"] = round(float(recall), 4)
    assert recall >= 0.95, f"planted near-dup recall {recall}"

    stop.set()
    out["rss_peak_mb"] = round(peak["rss"], 1)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
