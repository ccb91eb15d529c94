"""Deterministic, vectorized string hashing for partition / shard keys.

The reference assigns records to partitions with a writer-local cursor
(miru-writer-deployable/.../MiruPartitioner.java:106-165); a batch engine
needs a *data-derived* assignment instead so that results do not depend on
task arrival order (SURVEY.md §7.5 "Deterministic docIDs").

We use pandas' keyed siphash (``pandas.util.hash_array`` with the fixed
default key) — C-vectorized over object arrays, stable across processes
and parallelism levels within one environment.
"""

from __future__ import annotations

import numpy as np
from pandas.util import hash_array

__all__ = ["hash_strings", "part_for", "shard_for"]


def hash_strings(values) -> np.ndarray:
    """uint64 deterministic hash of an array-like of strings (vectorized)."""
    arr = np.asarray(values, dtype=object)
    return hash_array(arr, categorize=False)


def part_for(urls, num_parts: int) -> np.ndarray:
    """Partition id per url: ``hash(url) % P`` (SURVEY.md §7.4)."""
    return (hash_strings(urls) % np.uint64(num_parts)).astype(np.int64)


def shard_for(terms, num_shards: int) -> np.ndarray:
    """Term shard id: ``hash(term) % S`` — the posting-build shuffle key."""
    return (hash_strings(terms) % np.uint64(num_shards)).astype(np.int64)
