"""Memory-awareness: the build completes correctly under a deliberately
tiny object store (forcing Ray to spill shuffle blocks to disk) — the
streaming-executor backpressure + spilling story (SURVEY.md §4)."""

from __future__ import annotations

import hashlib
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR", object_store_memory=%d)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from miru_ray.pipelines.build import build_index, BuildConfig
from miru_ray.sources.fixtures import pages_table
meta = build_index(pages_table(4000), sys.argv[1],
                   BuildConfig(num_parts=8, num_shards=2))
print("N_DOCS", meta["n_docs"])
ray.shutdown()
"""


def _digest(d: str) -> str:
    import pyarrow.parquet as pq
    t = pq.read_table(sorted(glob.glob(os.path.join(d, "segments", "*.parquet"))))
    t = t.sort_by("term")
    h = hashlib.sha256()
    for col in ("term", "df", "cf", "docids", "tfs"):
        for v in t[col].to_pylist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()


def _build(out: str, store_bytes: int) -> str:
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-c", _SCRIPT % store_bytes, out],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "N_DOCS" in r.stdout
    return r.stdout


def test_build_survives_tiny_object_store(tmp_path):
    # ~80MB store vs a build whose working set is several× that → spilling
    small = str(tmp_path / "small")
    _build(small, 80 * 1024 * 1024)
    big = str(tmp_path / "big")
    _build(big, 2 * 1024 * 1024 * 1024)
    assert _digest(small) == _digest(big)
