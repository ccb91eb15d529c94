#!/usr/bin/env python
"""Index-build job — the ``ray job submit`` entry point.

On a real cluster (the north-rule deployment: fixed sizes N and 4N):

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/build_job.py \
        s3://bucket/pages/ /shared/index --num-parts 4096 --num-shards 512 \
        --verify-inputs

The job attaches to the cluster it was submitted to (``ray.init()`` with
no address inside a job connects to the hosting cluster); in this sandbox
it falls back to a local session. Scaling evidence between two cluster
sizes = submit the SAME job to both and compare the printed docs/sec
(single-node proxy: ``bench.py --scaling``).

Sizing guidance for 10^12 docs: num_parts ≈ corpus_docs / 2M (partitions
are the checkpoint/rebuild unit — millions of docs each, matching the
reference's partition sizing, README.md:12); num_shards ≈ 4–8× worker
count so the merge fan-out saturates the cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("source")
    p.add_argument("index_dir")
    p.add_argument("--num-parts", type=int, default=64)
    p.add_argument("--num-shards", type=int, default=32)
    p.add_argument("--store-text", action="store_true")
    p.add_argument("--verify-inputs", action="store_true")
    p.add_argument("--langs", default=None)
    p.add_argument("--partition-mode", default="hash",
                   choices=("hash", "time_range"),
                   help="hash: global url dedup; time_range: the "
                        "reference's time-ordered partitions (ts-ordered "
                        "global docIDs, partition-local dedup)")
    p.add_argument("--format", default="parquet",
                   choices=("parquet", "wet", "warc"),
                   help="parquet pages table (default), Common Crawl WET "
                        "(extracted text), or WARC (raw html captures)")
    args = p.parse_args()

    import ray
    if not ray.is_initialized():
        # inside `ray job submit` this attaches to the hosting cluster;
        # standalone it starts a local one
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from miru_ray.pipelines.build import BuildConfig, build_index
    cfg = BuildConfig(num_parts=args.num_parts, num_shards=args.num_shards,
                      store_text=args.store_text,
                      verify_inputs=args.verify_inputs,
                      partition_mode=args.partition_mode,
                      langs=args.langs.split(",") if args.langs else None)
    src = args.source
    if args.format == "wet":
        from miru_ray.sources.wet import read_wet
        src = read_wet(src)
    elif args.format == "warc":
        from miru_ray.sources.wet import read_warc
        src = read_warc(src)
    t0 = time.perf_counter()
    meta = build_index(src, args.index_dir, cfg)
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "n_docs": meta["n_docs"], "n_terms": meta.get("n_terms"),
        "elapsed_sec": round(elapsed, 2),
        "docs_per_sec": round(meta["n_docs"] / elapsed, 1) if elapsed else None,
        "skipped_parts": meta["skipped_parts"],
        "phase_sec": meta.get("phase_sec"),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
