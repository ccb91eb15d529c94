#!/usr/bin/env python
"""1M-doc curation-ladder robustness bench (VERDICT r4 #6 + #1 evidence).

Generates a 1M-document corpus with 3,000 planted near-dup clusters of
55 identical docs each (165k dup docs → ~4.45M verified pairs, ABOVE the
4 Mi local-CC edge bound, so the distributed label-propagation tier is
exercised for real, not forced), then runs the default web-scale
curation path:

  1. ``minhash_dedup_clusters`` — LSH banding → bucketed pair dedup →
     exact verify → distributed CC (the collected adapter; the cluster
     table is bounded at 165k rows);
  2. ``dedup_keep_one_ds`` fed by the fully-lazy
     ``minhash_dedup_clusters_ds`` — consumed by a streaming
     ``write_parquet``, so NOTHING cluster- or corpus-shaped lands on
     the driver.

Driver RSS is sampled throughout; correctness is asserted exactly
(cluster count, membership, canonical labels, keep-one row count).
Prints one JSON line for BENCH/BASELINE.md.

    python tools/bench_curation_1m.py [--docs 1000000] [--clusters 3000]
        [--cluster-size 55]
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


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def gen_documents(root: str, n_docs: int, n_clusters: int,
                  cluster_size: int) -> None:
    """documents.parquet as a DIRECTORY of files: doc ids 0..n-1; the
    LAST n_clusters*cluster_size ids form identical-text clusters
    (consecutive ids per cluster — canonical label = first id); the rest
    are unique ~30-token word-soup docs over a 50k vocab (large vocab →
    negligible accidental 3-gram collisions)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    done = os.path.join(root, "_DONE")
    stamp = f"{n_docs}/{n_clusters}/{cluster_size}"
    if os.path.exists(done) and open(done).read() == stamp:
        return
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    n_dup = n_clusters * cluster_size
    n_unique = n_docs - n_dup
    assert n_unique > 0
    vocab = np.array([f"w{i:05d}" for i in range(50_000)], dtype=object)
    per_file = 100_000
    toks_per_doc = 30
    cluster_texts: dict[int, str] = {}

    def cluster_text(c: int) -> str:
        if c not in cluster_texts:
            cr = np.random.RandomState(7_000_000 + c)
            cluster_texts[c] = " ".join(
                vocab[cr.randint(0, len(vocab), toks_per_doc)])
        return cluster_texts[c]

    for lo in range(0, n_docs, per_file):
        hi = min(lo + per_file, n_docs)
        rs = np.random.RandomState(1000 + lo // per_file)
        # vectorized: ONE randint call per file, row-joins only
        mat = vocab[rs.randint(0, len(vocab), (hi - lo, toks_per_doc))]
        texts = [" ".join(row) for row in mat]
        for i, d in enumerate(range(lo, hi)):
            if d >= n_unique:
                texts[i] = cluster_text((d - n_unique) // cluster_size)
        t = pa.table({
            "doc_id": pa.array(range(lo, hi), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(t, os.path.join(root, f"docs-{lo:09d}.parquet"))
    with open(done, "w") as f:
        f.write(stamp)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--clusters", type=int, default=3_000)
    ap.add_argument("--cluster-size", type=int, default=55)
    args = ap.parse_args()

    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf = f"/tmp/miru_curation_{args.docs}"
    gen_documents(os.path.join(sf, "documents.parquet"), args.docs,
                  args.clusters, args.cluster_size)

    from miru_ray.pipelines import dedup

    n_dup = args.clusters * args.cluster_size
    n_unique = args.docs - n_dup
    expect_pairs = args.clusters * args.cluster_size * (args.cluster_size - 1) // 2

    peak = [rss_mb()]
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak[0] = max(peak[0], rss_mb())
            time.sleep(0.05)

    before = rss_mb()
    threading.Thread(target=sampler, daemon=True).start()

    # 1. clusters (distributed CC tier engages naturally: pairs > 4 Mi)
    t0 = time.perf_counter()
    clusters = dedup.minhash_dedup_clusters(sf, 0.8)
    clusters_wall = time.perf_counter() - t0
    clusters_rss = peak[0]

    # exact resolution of every planted cluster
    import numpy as np
    ids = clusters["doc_id"].to_numpy()
    labs = clusters["cluster_id"].to_numpy()
    assert len(ids) == n_dup, (len(ids), n_dup)
    want_lab = n_unique + ((ids - n_unique) // args.cluster_size) \
        * args.cluster_size
    assert np.array_equal(labs, want_lab), "cluster labels wrong"
    assert len(np.unique(labs)) == args.clusters

    # 2. keep-one, fully lazy end to end (lazy clusters -> anti-join ->
    #    streaming write): nothing corpus-shaped on the driver
    out = f"/tmp/miru_curation_keepone_{args.docs}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    dedup.dedup_keep_one_ds(
        sf, 0.8,
        clusters_ds=dedup.minhash_dedup_clusters_ds(sf, 0.8)
    ).write_parquet(out)
    keep_wall = time.perf_counter() - t0
    stop.set()
    import pyarrow.dataset as pads
    kept = sum(f.count_rows() for f in pads.dataset(out).get_fragments())
    assert kept == n_unique + args.clusters, (kept, n_unique + args.clusters)

    after = rss_mb()
    ray.shutdown()
    print(json.dumps({
        "metric": "curation-ladder 1M robustness",
        "docs": args.docs, "planted_clusters": args.clusters,
        "cluster_size": args.cluster_size,
        "verified_pairs_expected": expect_pairs,
        "distributed_cc_forced_naturally": expect_pairs > (1 << 22),
        "clusters_wall_sec": round(clusters_wall, 2),
        "clusters_rss_peak_mb": round(clusters_rss, 1),
        "keep_one_wall_sec": round(keep_wall, 2),
        "kept_rows": kept,
        "rss_before_mb": round(before, 1),
        "rss_peak_mb": round(peak[0], 1),
        "rss_after_mb": round(after, 1),
        "rss_growth_mb": round(peak[0] - before, 1),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        "correct": True,
    }))


if __name__ == "__main__":
    sys.exit(main())
