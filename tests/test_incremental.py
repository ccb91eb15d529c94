"""Sip/incremental build: new input rows → only affected partitions
rebuild (digest-verified), and the result equals a clean full build."""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow.parquet as pq
import pytest

from miru_ray.pipelines.build import BuildConfig, build_index
from miru_ray.sources.fixtures import generate_pages


def _digest(d: str) -> str:
    t = pq.read_table(sorted(glob.glob(os.path.join(d, "segments", "*.parquet"))))
    t = t.sort_by("term")
    h = hashlib.sha256()
    for col in ("term", "df", "cf", "docids", "tfs"):
        for v in t[col].to_pylist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()


def test_incremental_append_rebuilds_only_affected(tmp_path, ray_session):
    cfg = BuildConfig(num_parts=6, num_shards=2)
    src = tmp_path / "wal"
    src.mkdir()
    pq.write_table(generate_pages(0, 600), str(src / "a.parquet"))

    idx = str(tmp_path / "idx")
    build_index(str(src), idx, cfg)
    from miru_ray.state.layout import completed_parts
    first = {p: m["input_digest"] for p, m in completed_parts(idx).items()}
    assert len(first) == 6

    # sip: append a new file (5 new rows touch only a few partitions)
    pq.write_table(generate_pages(600, 605), str(src / "b.parquet"))
    meta = build_index(str(src), idx, BuildConfig(num_parts=6, num_shards=2,
                                                  verify_inputs=True))
    second = completed_parts(idx)
    changed = [p for p in second if second[p]["input_digest"] != first.get(p)]
    assert meta["skipped_parts"] == sorted(p for p in first if p not in changed)
    assert 0 < len(changed) < 6  # some partitions untouched by 5 new urls
    # dups in rows 0..604: i % 211 == 210 → {210, 421} → 2 dropped
    assert meta["n_docs"] == 605 - 2

    # equality with a clean build over the full input
    clean = str(tmp_path / "clean")
    build_index(str(src), clean, cfg)
    assert _digest(idx) == _digest(clean)


def test_fast_resume_does_not_redigest(tmp_path, ray_session):
    """Without verify_inputs, resume trusts manifests (crash-recovery
    semantics) even if input changed — documented fast path."""
    cfg = BuildConfig(num_parts=4, num_shards=2)
    src = tmp_path / "wal"
    src.mkdir()
    pq.write_table(generate_pages(0, 300), str(src / "a.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, cfg)
    pq.write_table(generate_pages(300, 340), str(src / "b.parquet"))
    meta = build_index(str(src), idx, cfg)   # no verify → all skipped
    assert meta["skipped_parts"] == [0, 1, 2, 3]
    assert meta["n_docs"] == 299  # stale by design on the fast path (300 rows − 1 dup)
