"""Shared test helpers (imported as ``from util import ...`` — pytest
puts the tests dir on sys.path)."""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow.parquet as pq

SEG_COLS = ("term", "df", "cf", "docids", "tfs", "bmax")


def seg_digest(index_dir: str, cols=SEG_COLS) -> str:
    """Content digest of an index's merged segments, row-order-free
    (sorted by term) — THE equality check for determinism / resume /
    repair / splice tests."""
    t = pq.read_table(sorted(glob.glob(
        os.path.join(index_dir, "segments", "*.parquet"))))
    t = t.sort_by("term")
    h = hashlib.sha256()
    for col in cols:
        for v in t[col].to_pylist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()
