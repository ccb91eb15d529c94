"""Removal index — tombstones applied as an ANDNOT mask at query time.

Reference: REMOVE-type activities flip membership in a removal bitmap with
version checks (miru-plugin/.../index/MiruRemovalIndex.java; repair path
miru-service/.../stream/MiruIndexer.java:125-173), and every query ANDs
"all docs ≤ lastId minus removed" (MiruBitmapsRoaring.java:457-504,
applied e.g. miru-analytics-plugins/.../Analytics.java:127-130).

Here: a ``tombstones.json`` sidecar per index holds removed urls; the
reader resolves them to docIDs once (url → partition via the same
hash(url) % P, then binary search in the partition's docs table) and every
search subtracts the set. Removal never rewrites segments — exactly the
reference's delete model (tombstone now, compaction later)."""

from __future__ import annotations

import os

import numpy as np

from miru_ray.functions.hashing import part_for
from miru_ray.state.layout import read_json, write_json_atomic

__all__ = ["add_tombstones", "load_tombstones", "resolve_tombstones"]


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones.json")


def add_tombstones(index_dir: str, urls: list[str]) -> list[str]:
    """Append removed urls (idempotent, sorted, atomic write)."""
    cur = set(load_tombstones(index_dir))
    cur.update(urls)
    out = sorted(cur)
    write_json_atomic(_path(index_dir), {"urls": out})
    return out


def load_tombstones(index_dir: str) -> list[str]:
    d = read_json(_path(index_dir))
    return d["urls"] if d else []


def resolve_tombstones(reader) -> np.ndarray:
    """urls → sorted global docID array (absent urls ignored)."""
    urls = load_tombstones(reader.index_dir)
    if not urls:
        return np.empty(0, dtype=np.uint64)
    num_parts = reader.meta["num_parts"]
    parts = part_for(urls, num_parts)
    out = []
    part_index = {p: i for i, p in enumerate(reader.parts)}
    for url, p in zip(urls, parts):
        pi = part_index.get(int(p))
        if pi is None:
            continue
        col = reader.doc_column(reader.parts[pi], "url").to_pylist()
        # column-pruned per-partition scan, cached per (part, col)
        try:
            local = col.index(url)
        except ValueError:
            continue
        out.append(reader.bases[pi] + local)
    return np.array(sorted(out), dtype=np.uint64)
