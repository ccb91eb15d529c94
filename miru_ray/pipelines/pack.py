"""Corpus-assembly stages: source-mixture sampling and sequence packing.

The last two steps of a pretraining-data pipeline after cleaning and
dedup: (1) resample the corpus so each source contributes its TARGET
share of the token budget (the Pile / Dolma "mixing" step), and
(2) lay the surviving documents end-to-end into fixed-length training
sequences (concat-and-split packing), assigning every document its
(seq_id, seq_off) coordinates.

Both are deterministic and engine-independent so they carry exact
DuckDB oracles:

- mixture sampling is CONTENT-KEYED (keep when the first 8 hex digits
  of md5(text) fall below a per-source cut), the same reproducible-
  sampling device as ``textstats.sample_hash`` — the kept set is
  invariant to partitioning, ordering and engine;
- packing is a pure function of the global doc_id order and the
  shared tokenizer, so a SQL window function reproduces it exactly.

Reference: beyond enterstudio/miru (no corpus-assembly stages there);
the public models are C4/Pile/Dolma mixture weights and GPT-style
concat-and-split sequence packing.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from miru_ray.sources.tables import read_table

__all__ = ["mixture_sample", "mixture_sample_ds", "pack_sequences",
           "pack_sequences_ds", "MIXTURE_WEIGHTS", "MIXTURE_BUDGET_FRAC",
           "PACK_SEQ_LEN", "mixture_weights_sql_values"]

# THE mixture definition — one constant feeding the engine default AND
# the generated SQL oracle (the ADVICE r4 #5 pattern: no literal drift).
# Weights cycle 1..4 over the fixture's src0..src19 so the target mix is
# deliberately non-uniform against the uniform corpus.
MIXTURE_WEIGHTS: dict[str, float] = {f"src{i}": float(i % 4 + 1)
                                     for i in range(20)}
MIXTURE_BUDGET_FRAC = 0.5
PACK_SEQ_LEN = 1024

_U32_SPAN = 4294967296.0   # 2**32: md5-prefix sample space


def _source_cuts(weights: dict[str, float], budget_frac: float,
                 counts: dict[str, int], total: int) -> dict[str, int]:
    """Per-source integer acceptance cut in [0, 2^32].

    rate_s = min(1, budget_frac·total · frac_s / count_s) with
    frac_s = w_s / Σw; cut_s = floor(rate_s · 2^32). The float
    expression ORDER matches the generated SQL term-for-term so both
    engines floor the same IEEE double.
    """
    sum_w = sum(weights.values())
    budget = budget_frac * float(total)
    cuts = {}
    for s, w in weights.items():
        cnt = counts.get(s, 0)
        if cnt == 0:
            continue
        rate = min(1.0, (budget * (w / sum_w)) / float(cnt))
        cuts[s] = math.floor(rate * _U32_SPAN)
    return cuts


def mixture_weights_sql_values(weights: dict[str, float] | None = None) -> str:
    """`(VALUES ('src0', 0.02), ...)` rows of (source, frac) for the
    oracle CTE — fracs are Python-computed repr literals so DuckDB
    parses the exact same doubles the engine uses (no SQL-side
    summation-order drift)."""
    weights = MIXTURE_WEIGHTS if weights is None else weights
    sum_w = sum(weights.values())
    rows = ", ".join(f"('{s}', {w / sum_w!r})" for s, w in weights.items())
    return rows


def mixture_sample_ds(sf_dir: str, weights: dict[str, float] | None = None,
                      budget_frac: float = MIXTURE_BUDGET_FRAC):
    """Lazy Dataset of (doc_id, source) kept by the target mixture.

    Scale shape: pass 1 is a column-pruned scan of ONLY `source` folded
    to one count per source (partial-combine groupby — the collected
    side is #sources rows, never corpus rows); the driver turns those
    counts into per-source integer cuts (a dict of a few ints, shipped
    in the filter closure); pass 2 is a single stateless map_batches
    filter — no shuffle, no corpus materialization. Sources absent
    from the weight table are dropped (rate 0), sources whose target
    share exceeds their supply keep everything (rate clamps at 1).
    """
    weights = MIXTURE_WEIGHTS if weights is None else weights
    cnt_df = (read_table(sf_dir, "documents", columns=["source"])
              .groupby("source").count().to_pandas())
    counts = dict(zip(cnt_df["source"], cnt_df["count()"].astype(int)))
    total = int(cnt_df["count()"].sum())
    cuts = _source_cuts(weights, budget_frac, counts, total)

    def keep(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        mask = np.zeros(len(srcs), dtype=bool)
        for i, (s, t) in enumerate(zip(srcs, texts)):
            cut = cuts.get(s)
            if cut is None:
                continue
            if cut >= _U32_SPAN or int(hashlib.md5(
                    t.encode("utf-8")).hexdigest()[:8], 16) < cut:
                mask[i] = True
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(mask)),
            "source": pa.array([s for s, m in zip(srcs, mask) if m],
                               pa.string()),
        })

    return (read_table(sf_dir, "documents",
                       columns=["doc_id", "source", "text"])
            .map_batches(keep, batch_format="pyarrow"))


def mixture_sample(sf_dir: str, weights: dict[str, float] | None = None,
                   budget_frac: float = MIXTURE_BUDGET_FRAC) -> pa.Table:
    """Driver-side collected form of :func:`mixture_sample_ds`."""
    df = (mixture_sample_ds(sf_dir, weights, budget_frac).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


# ------------------------------------------------------ sequence packing

_PACK_RANGES = 1024   # target number of doc_id ranges in the prefix sum


def pack_sequences_ds(sf_dir: str, seq_len: int = PACK_SEQ_LEN):
    """Lazy Dataset of (doc_id, n_tokens, seq_id, seq_off) — GPT-style
    concat-and-split packing: documents laid end-to-end in doc_id order
    into fixed ``seq_len``-token sequences; each doc starts at global
    token offset cum(preceding n_tokens), i.e. sequence cum // seq_len,
    offset cum % seq_len.

    Scale shape — the docID-allocation prefix-sum pattern
    (pipelines/build.py): tokenize once into a materialized
    (doc_id, n_tokens) dataset (16 B/doc — the only thing that
    shuffles; the text never moves); split the doc_id domain into
    ≤ ``_PACK_RANGES`` contiguous ranges; per-range token sums reduce
    to a ≤ _PACK_RANGES-row table on the driver (the tiny exchange),
    whose exclusive prefix sum gives each range its global starting
    offset; a per-range map_groups then sorts its own slice and adds
    the local cumulative sum — every doc gets its exact global offset
    with ONE keyed exchange of 16 B/doc and O(_PACK_RANGES) driver
    state.
    """
    from miru_ray.pipelines.textstats import token_counts_ds

    tc = token_counts_ds(sf_dir).materialize()
    max_id = tc.max("doc_id")
    if max_id is None:
        return tc   # empty corpus: already (doc_id, n_tokens) empty
    r = max(1, (int(max_id) + _PACK_RANGES) // _PACK_RANGES)

    def rng_of(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": batch["n_tokens"],
                         "rng": pa.array(ids // r, pa.int64())})

    with_rng = tc.map_batches(rng_of, batch_format="pyarrow")
    sums = (with_rng.groupby("rng").sum("n_tokens").to_pandas()
            .sort_values("rng").reset_index(drop=True))
    csum = sums["sum(n_tokens)"].to_numpy().cumsum()
    offsets = dict(zip(sums["rng"].astype(int),
                       np.r_[0, csum[:-1]].astype(np.int64)))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        base = offsets[int(g["rng"].iloc[0])]
        cum = base + np.r_[np.int64(0), n[:-1].cumsum()]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": n,
            "seq_id": cum // seq_len,
            "seq_off": cum % seq_len,
        })

    return with_rng.groupby("rng").map_groups(pack, batch_format="pandas")


def pack_sequences(sf_dir: str, seq_len: int = PACK_SEQ_LEN) -> pa.Table:
    """Driver-side collected form of :func:`pack_sequences_ds`."""
    df = (pack_sequences_ds(sf_dir, seq_len).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df[["doc_id", "n_tokens", "seq_id",
                                    "seq_off"]], preserve_index=False)
