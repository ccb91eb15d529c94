"""Shuffle-light two-pass build: byte-identical to the default path."""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow.parquet as pq
import pytest

from miru_ray.pipelines.build import BuildConfig
from miru_ray.pipelines.build_light import build_index_shuffle_light


def _digest(d: str) -> str:
    t = pq.read_table(sorted(glob.glob(os.path.join(d, "segments", "*.parquet"))))
    t = t.sort_by("term")
    h = hashlib.sha256()
    for col in ("term", "df", "cf", "docids", "tfs", "bmax"):
        for v in t[col].to_pylist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()


def test_shuffle_light_equals_default(pages, index_dir, tmp_path, ray_session):
    d = str(tmp_path / "light")
    meta = build_index_shuffle_light(pages, d,
                                     BuildConfig(num_parts=4, num_shards=2))
    assert _digest(d) == _digest(index_dir)
    # docs tables (incl. pass-2-filled doclen) identical per partition
    for p in range(4):
        a = pq.read_table(os.path.join(index_dir, f"partitions/part={p:05d}/docs.parquet"),
                          columns=["local_id", "url", "warc_ts", "lang", "doclen"])
        b = pq.read_table(os.path.join(d, f"partitions/part={p:05d}/docs.parquet"),
                          columns=["local_id", "url", "warc_ts", "lang", "doclen"])
        assert a.equals(b), p
    assert meta["mode"] == "shuffle_light"
    # the reader works identically on a light-built index
    import numpy as np
    from miru_ray.pipelines.search import search
    from miru_ray.state.reader import IndexReader
    r = IndexReader(d)
    hits = search(r, "needle7", k=10)
    assert hits.num_rows == 7
