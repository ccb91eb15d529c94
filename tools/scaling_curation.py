#!/usr/bin/env python
"""Second-job scaling evidence: the near-dup curation ladder
(minhash_dedup_clusters over a planted-cluster corpus) at N vs 4N CPUs
in fresh processes on the same input — the sandbox proxy for the
two-cluster-size criterion, measured on a SHUFFLE-heavy job (LSH band
exchange -> pair dedup -> verify -> connected components) rather than
the map-heavy index build that bench.py --scaling measures.

    python tools/scaling_curation.py [--docs 200000] [--clusters 600]

Prints one JSON line (throughputs at both levels, efficiency, bracketed
memory-bus probes — the documented covariate).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leg(ncpu: int, docs: int, clusters: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_curation_1m.py"),
         "--docs", str(docs), "--clusters", str(clusters)],
        env=env, capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--clusters", type=int, default=600)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import bench
    bw_pre = bench._mem_bw_probe()
    leg(args.lo, args.docs, args.clusters)   # untimed: gen fixture, warm cache
    lo_runs, hi_runs = [], []
    for _ in range(args.repeats):            # interleaved, min-of-N per level
        lo_runs.append(leg(args.lo, args.docs, args.clusters))
        hi_runs.append(leg(args.hi, args.docs, args.clusters))
    bw_post = bench._mem_bw_probe()
    key = "clusters_wall_sec"
    lo = min(r[key] for r in lo_runs)
    hi = min(r[key] for r in hi_runs)
    tp_lo, tp_hi = args.docs / lo, args.docs / hi
    eff = (tp_hi / tp_lo) / (args.hi / args.lo)
    result = {
        "metric": f"curation-ladder scaling ({args.lo} -> {args.hi} CPUs, "
                  f"fresh processes, same planted input)",
        "docs": args.docs, "planted_clusters": args.clusters,
        "wall_lo_sec": lo, "wall_hi_sec": hi,
        "docs_per_sec_lo": round(tp_lo, 1), "docs_per_sec_hi": round(tp_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "raw_lo_sec": [r[key] for r in lo_runs],
        "raw_hi_sec": [r[key] for r in hi_runs],
        "keep_one_lo_sec": [r["keep_one_wall_sec"] for r in lo_runs],
        "keep_one_hi_sec": [r["keep_one_wall_sec"] for r in hi_runs],
        "mem_bw_gbps_pre": bw_pre, "mem_bw_gbps_post": bw_post,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "scaling_curation_latest.json"),
              "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
