"""Bucketed per-key sum rollup — the repo's standard final-combine for
user-scale keys (DESIGN.md "Per-key aggregation policy").

Ray's native ``groupby(key).aggregate(...)`` costs grow with the group
count and fall onto a ~13× slower path on pandas-format blocks; for keys
whose cardinality scales with the corpus (users, customers) the flat-cost
plan is: callers pre-aggregate per batch (combiner), then ONE exchange on
``int_key % buckets`` with a vectorized pandas sum per bucket.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["bucketed_sum_rollup"]


def bucketed_sum_rollup(ds, keys: list[str], val_cols: list[str],
                        bucket_key: str | None = None, buckets: int = 64):
    """Sum ``val_cols`` per ``keys`` over an already-partial Dataset.

    ``bucket_key`` must be an integer column among ``keys`` (defaults to
    the first); rows exchange once on ``bucket_key % buckets`` and each
    bucket group sums all its keys on pandas C paths. Decomposable sums
    only (callers' partials are already per-batch sums/counts)."""
    bkey = bucket_key or keys[0]

    def tag(t: pa.Table) -> pa.Table:
        b = t[bkey].to_numpy() % buckets
        return t.append_column("_bkt", pa.array(b, pa.int64()))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=True)[val_cols].sum().reset_index()

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("_bkt").map_groups(roll, batch_format="pandas"))
