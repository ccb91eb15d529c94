"""Crash-resume integration: SIGKILL a build mid-flight in a subprocess,
resume in a fresh process, and require byte-identical segments vs a clean
build (the checkpoint criterion: per-partition manifests + atomic writes
mean a killed run only ever loses in-flight partitions)."""

from __future__ import annotations

import hashlib
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BUILD = """
import ray, sys, shutil
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from miru_ray.pipelines.build import build_index, BuildConfig
from miru_ray.sources.fixtures import pages_table
build_index(pages_table(1200), sys.argv[1], BuildConfig(num_parts=6, num_shards=2))
print("BUILD-DONE")
ray.shutdown()
"""


def _seg_digest(d: str) -> str:
    import glob
    import pyarrow.parquet as pq
    t = pq.read_table(sorted(glob.glob(os.path.join(d, "segments", "*.parquet"))))
    t = t.sort_by("term")
    h = hashlib.sha256()
    for col in ("term", "df", "cf", "docids", "tfs", "bmax"):
        for v in t[col].to_pylist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()


def _run_build(out_dir: str, kill_after: float | None = None) -> bool:
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen([sys.executable, "-c", _BUILD, out_dir], env=env,
                            cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True,
                            start_new_session=True)
    if kill_after is None:
        out, _ = proc.communicate(timeout=300)
        return "BUILD-DONE" in out
    time.sleep(kill_after)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait(timeout=60)
    return False


def test_kill_and_resume_reproduces_clean_build(tmp_path):
    clean = str(tmp_path / "clean")
    assert _run_build(clean)
    expected = _seg_digest(clean)

    crashed = str(tmp_path / "crashed")
    # kill mid-build (a few partitions may or may not have committed —
    # any partial state must resume to the same result)
    _run_build(crashed, kill_after=6.0)
    from miru_ray.state.layout import completed_parts, read_json
    done_before_resume = sorted(completed_parts(crashed))
    # resume in a fresh process to completion
    assert _run_build(crashed)
    assert _seg_digest(crashed) == expected
    # resume must have skipped exactly the partitions that committed
    # before the kill (whatever the timing produced)
    meta = read_json(os.path.join(crashed, "meta.json"))
    assert meta["skipped_parts"] == done_before_resume
    assert sorted(completed_parts(crashed)) == list(range(6))
