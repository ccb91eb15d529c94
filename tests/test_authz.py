"""Authz index: entitlement labels indexed as a composite field; queries
AND in the OR-of-labels visibility mask (MiruAuthzIndex semantics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from miru_ray.sources.fixtures import PAGES_SCHEMA


def _authz_pages() -> pa.Table:
    base = 1_704_067_200_000_000
    rows = [
        ("https://a/0", base + 0, "common secret0", ["team-a"]),
        ("https://a/1", base + 1, "common secret1", ["team-b"]),
        ("https://a/2", base + 2, "common shared2", ["team-a", "team-b"]),
        ("https://a/3", base + 3, "common public3", ["public"]),
        ("https://a/4", base + 4, "common orphan4", []),   # no labels → invisible
    ]
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "authz": pa.array([r[3] for r in rows], pa.list_(pa.string())),
    })


def test_authz_mask(tmp_path, ray_session):
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.pipelines.search import search
    from miru_ray.state.reader import IndexReader

    idx = str(tmp_path / "idx")
    build_index(_authz_pages(), idx, BuildConfig(num_parts=2, num_shards=2))
    r = IndexReader(idx)

    def urls(hits):
        return sorted(hits["url"].to_pylist())

    # no authz arg → unrestricted (trusted internal caller)
    assert len(urls(search(r, "common", k=10))) == 5
    # single label sees its docs only
    assert urls(search(r, "common", k=10, authz=["team-a"])) == [
        "https://a/0", "https://a/2"]
    # multiple labels = OR
    assert urls(search(r, "common", k=10, authz=["team-a", "public"])) == [
        "https://a/0", "https://a/2", "https://a/3"]
    # unknown label → nothing
    assert search(r, "common", k=10, authz=["nope"]).num_rows == 0
    # empty label set → nothing visible
    assert search(r, "common", k=10, authz=[]).num_rows == 0
    # label-less docs are invisible to any restricted caller
    for labels in (["team-a"], ["team-b"], ["public"]):
        assert "https://a/4" not in urls(search(r, "common", k=10, authz=labels))
    # authz terms never leak into text-term scans
    assert all(not t.startswith("\x00") for t in r.expand_prefix("", 10**6))
    # scores unaffected by masking (same BM25 stats, fewer candidates)
    unrestricted = search(r, "common", k=10)
    masked = search(r, "common", k=10, authz=["team-a"])
    by_url = dict(zip(unrestricted["url"].to_pylist(),
                      unrestricted["score"].to_pylist()))
    for u, s in zip(masked["url"].to_pylist(), masked["score"].to_pylist()):
        assert s == by_url[u]
