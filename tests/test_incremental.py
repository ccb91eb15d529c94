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

    # the append took the incremental SPLICE merge (unchanged partitions'
    # postings files never re-read), yet…
    assert meta["phase_sec"]["merge_mode"] == "splice"
    # …equality with a clean FULL build over the full input holds
    clean = str(tmp_path / "clean")
    clean_meta = build_index(str(src), clean, cfg)
    assert clean_meta["phase_sec"]["merge_mode"] == "full"
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


def test_sip_digest_cache_noop_and_append(tmp_path, ray_session):
    """Per-file digest cache: a no-op resume skips every built partition
    WITHOUT re-reading unchanged files (their cache entries are reused);
    appending a file rescans only it; a changed partition param key
    discards the cache."""
    import json
    import os

    import pyarrow.parquet as pq

    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.sources.fixtures import generate_pages

    src = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    os.makedirs(src)
    for i, lo in enumerate(range(0, 900, 300)):
        pq.write_table(generate_pages(lo, lo + 300),
                       f"{src}/part-{i:02d}.parquet")
    cfg = lambda: BuildConfig(num_parts=4, num_shards=2,   # noqa: E731
                              verify_inputs=True)
    meta = build_index(src, idx, cfg())
    n_parts = len(meta["bases"])
    cache_p = os.path.join(idx, "digest_cache.json")

    m2 = build_index(src, idx, cfg())
    assert len(m2["skipped_parts"]) == n_parts        # true no-op
    assert os.path.exists(cache_p)
    c1 = json.load(open(cache_p))
    assert len(c1["files"]) == 3

    # cache entries carry the file stats -> a third run reuses them
    # (mtimes unchanged, so the cache content must be identical)
    build_index(src, idx, cfg())
    assert json.load(open(cache_p)) == c1

    # append one file: only it is scanned (others keep cached stats),
    # and the affected partitions rebuild to the right doc count
    pq.write_table(generate_pages(900, 1000), f"{src}/part-new.parquet")
    m3 = build_index(src, idx, cfg())
    c2 = json.load(open(cache_p))
    assert len(c2["files"]) == 4
    for f, e in c1["files"].items():
        assert c2["files"][f] == e                    # untouched entries
    assert m3["n_docs"] > meta["n_docs"]

    # param change invalidates: different num_parts -> fresh cache key
    idx2 = str(tmp_path / "idx2")
    build_index(src, idx2, BuildConfig(num_parts=2, num_shards=2,
                                       verify_inputs=True))
    build_index(src, idx2, BuildConfig(num_parts=2, num_shards=2,
                                       verify_inputs=True))
    c3 = json.load(open(os.path.join(idx2, "digest_cache.json")))
    assert c3["__key__"]["num_parts"] == 2


def test_sip_digest_cache_is_trusted_not_recomputed(tmp_path, ray_session):
    """The sip property itself: a resume must USE the cached per-file
    digest instead of re-reading the file. Poisoning one cached digest
    (stats untouched) must make the affected partition look stale and
    rebuild — proof the cache value was trusted; and the poisoned entry
    must survive the resume unrecomputed (its file was never re-read)."""
    import json
    import os

    import pyarrow.parquet as pq

    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.sources.fixtures import generate_pages

    src = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    os.makedirs(src)
    for i, lo in enumerate(range(0, 600, 300)):
        pq.write_table(generate_pages(lo, lo + 300),
                       f"{src}/part-{i:02d}.parquet")
    cfg = lambda: BuildConfig(num_parts=2, num_shards=2,   # noqa: E731
                              verify_inputs=True)
    build_index(src, idx, cfg())
    build_index(src, idx, cfg())        # creates + uses the cache
    cache_p = os.path.join(idx, "digest_cache.json")
    c = json.load(open(cache_p))
    f0 = sorted(c["files"])[0]
    part0 = sorted(c["files"][f0]["parts"])[0]
    poisoned = (int(c["files"][f0]["parts"][part0]) ^ 0xDEADBEEF)
    c["files"][f0]["parts"][part0] = poisoned
    json.dump(c, open(cache_p, "w"))
    m = build_index(src, idx, cfg())
    # the poisoned digest was TRUSTED: partition part0 fell out of the
    # skip set (stale) while the other stayed skipped
    assert int(part0) not in m["skipped_parts"]
    assert len(m["skipped_parts"]) >= 1
    # and the file was not re-read: its cache entry still carries the
    # poison (stats unchanged -> not in the fresh set)
    c2 = json.load(open(cache_p))
    assert int(c2["files"][f0]["parts"][part0]) == poisoned
