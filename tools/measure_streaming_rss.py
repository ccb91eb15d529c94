#!/usr/bin/env python
"""Driver-RSS measurement for the streaming pipeline API (VERDICT r3 #2).

Generates a 1M-row events table, runs ``window_sliding_ds`` (one output
row per input row) consumed by a streaming ``write_parquet``, and samples
the DRIVER process RSS throughout. With the ``*_ds`` API the bulk result
never lands on the driver, so RSS must stay flat; for contrast,
``--collect`` runs the old driver-side ``to_pandas`` form.

    python tools/measure_streaming_rss.py [--rows 1000000] [--collect]

Prints one JSON line: rows, wall sec, rss_before/peak/after MB.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def gen_events(root: str, n_rows: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    per_file = 100_000
    base = 1_704_067_200_000_000
    types = np.array(["click", "view", "purchase", "error"], dtype=object)
    for lo in range(0, n_rows, per_file):
        hi = min(lo + per_file, n_rows)
        ids = np.arange(lo, hi, dtype=np.int64)
        rs = np.random.RandomState(lo // per_file)
        t = pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(base + rs.randint(0, 30 * 86_400_000_000,
                                             hi - lo), pa.timestamp("us")),
            "event_type": pa.array(types[ids % 4], pa.string()),
            "value": pa.array(np.round(rs.uniform(0, 100, hi - lo), 2),
                              pa.float64()),
        })
        pq.write_table(t, os.path.join(root, f"events-{lo:09d}.parquet"))
    # read_table expects sf_dir/events.parquet — a directory works too
    with open(done, "w") as f:
        f.write(str(n_rows))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--collect", action="store_true",
                    help="driver-side to_pandas form (the contrast case)")
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf = f"/tmp/miru_rss_events_{args.rows}"
    gen_events(os.path.join(sf, "events.parquet"), args.rows)

    from miru_ray.pipelines.joins import window_sliding, window_sliding_ds

    peak = [rss_mb()]
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak[0] = max(peak[0], rss_mb())
            time.sleep(0.05)

    before = rss_mb()
    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.perf_counter()
    out_dir = f"/tmp/miru_rss_out_{args.rows}"
    shutil.rmtree(out_dir, ignore_errors=True)
    if args.collect:
        tbl = window_sliding(sf)
        n_out = tbl.num_rows
    else:
        window_sliding_ds(sf).write_parquet(out_dir)
        import pyarrow.dataset as pads
        n_out = sum(f.count_rows() for f in pads.dataset(out_dir).get_fragments())
    wall = time.perf_counter() - t0
    stop.set()
    th.join()
    after = rss_mb()
    ray.shutdown()
    print(json.dumps({
        "mode": "collect" if args.collect else "stream",
        "rows": args.rows, "rows_out": n_out, "wall_sec": round(wall, 2),
        "rss_before_mb": round(before, 1), "rss_peak_mb": round(peak[0], 1),
        "rss_after_mb": round(after, 1),
        "rss_growth_mb": round(peak[0] - before, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
