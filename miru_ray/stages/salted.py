"""Salted two-stage aggregation — the generic hot-key-skew pattern.

SURVEY.md §4 "Skew": a Zipf-hot key turns a groupby into one mega-group.
The cure is salting: stage 1 groups by ``(key, salt)`` with
``salt = row_hash % R`` for hot keys (0 otherwise) so a hot key becomes R
bounded partials; stage 2 re-groups the partials by ``key`` alone —
rows shuffled in stage 2 are bounded by |keys|·R regardless of skew.

The flagship posting build gets this for free structurally (partial
postings per (term, partition) — stages/merge.py), so salting there would
be redundant; this module provides the pattern for DIRECT aggregations
over skewed keys (e.g. token-level df/cf without the index) and is the
building block to reach for when a new operator hits a hot key.

Hot keys come from a cheap sample pass (df estimate), mirroring the plan
in SURVEY.md §7.2 step 8.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from miru_ray.functions.hashing import hash_strings

__all__ = ["salted_term_counts", "sample_hot_terms"]


def sample_hot_terms(ds: rd.Dataset, text_col: str, sample_frac: float = 0.05,
                     top_n: int = 64, seed: int = 7) -> list[str]:
    """Cheap sample pass → the top-N hottest terms (salting candidates)."""
    from miru_ray.functions.tokenize import tokenize_column

    def count_batch(t: pa.Table) -> pa.Table:
        toks = tokenize_column(t[text_col].combine_chunks())
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        vals, counts = np.unique(flat, return_counts=True)
        return pa.table({"term": pa.array(vals, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    sampled = ds.random_sample(sample_frac, seed=seed)
    agg = (sampled.map_batches(count_batch, batch_format="pyarrow")
                  .groupby("term").aggregate(Sum("n", alias_name="n"))
                  .to_pandas())
    agg = agg.sort_values(["n", "term"], ascending=[False, True]).head(top_n)
    return agg["term"].tolist()


def _stage1(batch: pa.Table, *, text_col: str, hot: frozenset,
            r_salt: int) -> pa.Table:
    from miru_ray.functions.tokenize import tokenize_column
    toks = tokenize_column(batch[text_col].combine_chunks())
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "salt": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    # salt only the hot keys: cold keys keep salt 0 (single group)
    is_hot = np.isin(flat, sorted(hot))
    salts = np.zeros(len(flat), dtype=np.int64)
    if is_hot.any():
        salts[is_hot] = (hash_strings(flat[is_hot])
                         % np.uint64(r_salt)).astype(np.int64)
        # spread identical hot tokens across salts deterministically by
        # position (term hash alone is constant per term)
        salts[is_hot] = (salts[is_hot]
                         + np.arange(int(is_hot.sum()), dtype=np.int64)) % r_salt
    df = pd.DataFrame({"term": flat, "salt": salts})
    g = df.groupby(["term", "salt"], sort=False).size().reset_index(name="n")
    return pa.Table.from_pandas(g, preserve_index=False)


def salted_term_counts(ds: rd.Dataset, text_col: str = "text",
                       hot_terms: list[str] | None = None,
                       r_salt: int = 8) -> rd.Dataset:
    """Token cf per term over a text column via the two-stage salted
    aggregate. Returns a Dataset of (term, n)."""
    if hot_terms is None:
        hot_terms = sample_hot_terms(ds, text_col)
    hot = frozenset(hot_terms)
    stage1 = ds.map_batches(
        functools.partial(_stage1, text_col=text_col, hot=hot, r_salt=r_salt),
        batch_format="pyarrow")
    partials = stage1.groupby(["term", "salt"]).aggregate(Sum("n", alias_name="n"))
    # stage 2: tiny re-group of ≤ |terms|·R partial rows
    return partials.groupby("term").aggregate(Sum("n", alias_name="n"))
