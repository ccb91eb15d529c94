"""Incremental ingest walkthrough: sips, the delta overlay, and the fold.

A long-lived corpus index rarely rebuilds from scratch — new crawl data
arrives as time-ordered appends. This example drives the whole merge
ladder on a toy corpus:

1. base build (full merge),
2. a small sip → DELTA OVERLAY: only the changed partitions' postings
   are derived and written to one small ``segments_delta/gen=K``
   generation — the base segment files are byte-untouched,
3. a second sip → a superseding generation,
4. a wide append → automatic FOLD: the splice merge folds base+overlay
   up to current truth and the overlay disappears.

Queries are answered identically at every step (readers resolve
base+overlay transparently through ``state/segview.py``).

Run: python examples/incremental_ingest.py
"""

import glob
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from miru_ray.pipelines.build import BuildConfig, build_index
from miru_ray.pipelines.search import search
from miru_ray.sources.fixtures import generate_pages
from miru_ray.state.reader import IndexReader

SRC, IDX = "/tmp/ex_incr_src", "/tmp/ex_incr_idx"
shutil.rmtree(SRC, ignore_errors=True)
shutil.rmtree(IDX, ignore_errors=True)
os.makedirs(SRC)

full = generate_pages(0, 2000)
ts = full["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
# PIN the time bounds to the stream's full horizon: time_range partitions
# are fixed buckets, so later sips land in the trailing buckets only
bounds = (int(ts.min()), int(ts.max()) + 1)
cfg = lambda verify: BuildConfig(                       # noqa: E731
    num_parts=16, num_shards=4, partition_mode="time_range",
    time_bounds=bounds, verify_inputs=verify)


def base_digest():
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(IDX, "segments", "*.parquet"))):
        h.update(open(f, "rb").read())
    return h.hexdigest()[:12]


def step(label):
    meta = build_index(SRC, IDX, cfg(verify=True))
    hits = search(IndexReader(IDX), "needle7", k=10)
    print(f"{label:>14}: merge={meta['phase_sec']['merge_mode']:<6} "
          f"n_docs={meta['n_docs']:>5} base_files={base_digest()} "
          f"overlay={'gen=%d' % meta['delta']['gen'] if 'delta' in meta else '-':<7} "
          f"needle7_hits={hits.num_rows}")


pq.write_table(full.slice(0, 1700), os.path.join(SRC, "base.parquet"))
meta = build_index(SRC, IDX, cfg(verify=False))
print(f"{'base build':>14}: merge={meta['phase_sec']['merge_mode']:<6} "
      f"n_docs={meta['n_docs']:>5} base_files={base_digest()}")

pq.write_table(full.slice(1700, 100), os.path.join(SRC, "sip1.parquet"))
step("sip +100")          # delta: base_files digest is UNCHANGED

pq.write_table(full.slice(1800, 100), os.path.join(SRC, "sip2.parquet"))
step("sip +100")          # delta gen=1 supersedes gen=0

# a wide append (many buckets) exceeds the overlay threshold → fold
wide = generate_pages(2000, 4000)
ts2 = wide["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
bounds = (bounds[0], int(ts2.max()) + 1)
pq.write_table(wide, os.path.join(SRC, "wide.parquet"))
step("wide +2000")        # splice/full: overlay folded, base rewritten

ray.shutdown()
