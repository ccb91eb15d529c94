"""Shuffle-light pass-2 stages: batch inversion with GLOBAL docIDs and the
batch-partial merge kernel.

The shuffle-light plan (DESIGN.md "Known limits" #1) avoids moving text
through the all-to-all: pass 1 assigns docIDs from a (url, warc_ts, lang)
projection (~50 B/row shuffled); pass 2 re-reads the full input
column-pruned and inverts per BATCH, resolving each row's global docID
from the per-partition docs tables via a worker-cached lookup. Partial
postings are per-batch (ids already global, runs NOT disjoint across
batches), so the merge argsorts per term instead of concatenating
part-ordered runs.

Caveat vs the default path: winner identification matches on (url,
warc_ts) — rows duplicated with identical url AND timestamp map to ONE
docID; exact copies (replay/at-least-once inputs) are deduped keep-first
(within a batch at gid resolution, across batches at merge), while copies
with DIFFERENT payloads resolve by pass order, not payload tie-break. For
crawl data (url, fetch-ts) is a natural unique key; the default path keeps
the payload tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from miru_ray.functions.hashing import hash_strings, shard_for
from miru_ray.functions.postings import (block_max_tf, decode_ids, decode_tfs,
                                         encode_ids, encode_tfs)
from miru_ray.stages.invert import invert_docs

__all__ = ["InvertBatchGlobal", "merge_rows_global"]


class InvertBatchGlobal:
    """Actor-pool pass-2 stage: rows (url, warc_ts, text, part) → partial
    posting rows (term, shard, df, cf, docids, tfs) with GLOBAL ids, plus
    doclen rows tagged term='' (routed to the doclen sink by the caller).

    Per-partition (url-hash, ts) → local_id lookups are loaded lazily from
    docs.parquet and cached per actor — the legitimately stateful stage.
    """

    def __init__(self, index_dir: str, bases: dict[int, int], num_shards: int):
        self.index_dir = index_dir
        self.bases = bases
        self.num_shards = num_shards
        self._lookup: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def _part_lookup(self, part: int):
        """(sorted url_hash ^ ts key array, local_id array)."""
        if part not in self._lookup:
            import os
            import pyarrow.parquet as pq
            from miru_ray.state.layout import part_dir
            t = pq.read_table(os.path.join(part_dir(self.index_dir, part),
                                           "docs.parquet"),
                              columns=["local_id", "url", "warc_ts"])
            ts = t["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            key = hash_strings(t["url"].to_numpy(zero_copy_only=False)) \
                ^ ts.astype(np.uint64)
            order = np.argsort(key)
            self._lookup[part] = (key[order],
                                  t["local_id"].to_numpy()[order])
        return self._lookup[part]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from miru_ray.functions.runtime import limit_worker_threads
        limit_worker_threads()
        urls = batch["url"].to_numpy(zero_copy_only=False)
        ts = batch["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        parts = batch["part"].to_numpy()
        keys = hash_strings(urls) ^ ts.astype(np.uint64)
        gids = np.full(len(urls), -1, dtype=np.int64)
        for p in np.unique(parts):
            mask = parts == p
            skey, sids = self._part_lookup(int(p))
            pos = np.searchsorted(skey, keys[mask])
            pos_c = np.minimum(pos, len(skey) - 1)
            hit = skey[pos_c] == keys[mask]
            sel = np.flatnonzero(mask)[hit]
            gids[sel] = sids[pos_c[hit]] + self.bases[int(p)]
        keep = gids >= 0   # dedup losers (stale (url,ts)) drop here
        if not keep.any():
            return _empty_partials()
        texts = batch["text"].filter(pa.array(keep))
        gkeep = gids[keep]
        order = np.argsort(gkeep, kind="stable")   # invert_docs needs asc ids
        gsorted_all = gkeep[order]
        # exact/replayed duplicates (same url AND warc_ts) resolve to the
        # SAME gid — index only the first batch row per gid, or tf/cf double
        first = np.concatenate([[True], gsorted_all[1:] != gsorted_all[:-1]])
        order = order[first]
        texts = texts.take(pa.array(order))
        gsorted = gsorted_all[first]
        postings, doclens = invert_docs(texts, gsorted)
        postings = postings.append_column(
            "shard", pa.array(shard_for(
                postings["term"].to_numpy(zero_copy_only=False),
                self.num_shards), pa.int64()))
        # doclen rows ride along as term='' (empty string sorts first and
        # can never be a real [a-z0-9]+ token)
        dl_row = pa.table({
            "term": pa.array([""], pa.string()),
            "df": pa.array([len(gsorted)], pa.int64()),
            "cf": pa.array([int(doclens.sum())], pa.int64()),
            "docids": pa.array([encode_ids(gsorted.astype(np.uint64))], pa.binary()),
            "tfs": pa.array([encode_tfs(doclens)], pa.binary()),
            "shard": pa.array([-1], pa.int64()),
        })
        return pa.concat_tables([postings.select(
            ["term", "df", "cf", "docids", "tfs", "shard"]), dl_row])


def _empty_partials() -> pa.Table:
    return pa.table({
        "term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
        "cf": pa.array([], pa.int64()), "docids": pa.array([], pa.binary()),
        "tfs": pa.array([], pa.binary()), "shard": pa.array([], pa.int64()),
    })


def merge_rows_global(rows: pa.Table) -> pa.Table:
    """Merge per-batch partials of one shard: runs hold GLOBAL ids but are
    NOT disjoint-ordered across batches → per-term argsort merge.
    Output byte-identical to the default path's merge on the SHARED
    columns (same sorted ids, same codec); it does NOT carry the v3
    run directory (parts/pdfs) — batch partials have no partition
    attribution — so build_light stamps format_version 2 and later
    incremental merges over such an index take the full path."""
    if rows.num_rows == 0:
        return pa.table({
            "term": pa.array([], pa.string()), "shard": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()), "cf": pa.array([], pa.int64()),
            "docids": pa.array([], pa.binary()), "tfs": pa.array([], pa.binary()),
            "bmax": pa.array([], pa.binary()),
        })
    df_ = rows.to_pandas()
    # numpy stable argsort (Python str compare) — NUL-safe, unlike pandas
    # multi-key sort_values; stability preserves file order for keep-first
    df_ = df_.iloc[np.argsort(df_["term"].to_numpy(dtype=object),
                              kind="stable")].reset_index(drop=True)
    terms = df_["term"].to_numpy(dtype=object)
    change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(df_)]])
    blobs = df_["docids"].to_numpy(dtype=object)
    tf_blobs = df_["tfs"].to_numpy(dtype=object)
    shards = df_["shard"].to_numpy()

    out = {k: [] for k in ("term", "shard", "df", "cf", "docids", "tfs", "bmax")}
    for s, e in zip(starts, ends):
        if e - s == 1:
            ids = decode_ids(blobs[s])
            tfs = decode_tfs(tf_blobs[s])
        else:
            ids = np.concatenate([decode_ids(blobs[i]) for i in range(s, e)])
            tfs = np.concatenate([decode_tfs(tf_blobs[i]) for i in range(s, e)])
            order = np.argsort(ids, kind="stable")
            ids, tfs = ids[order], tfs[order]
            # duplicate (term, docid) across batches = replayed row copies
            # that landed in different read batches; keep-first (stable)
            uniq = np.concatenate([[True], ids[1:] != ids[:-1]])
            if not uniq.all():
                ids, tfs = ids[uniq], tfs[uniq]
        out["term"].append(terms[s])
        out["shard"].append(int(shards[s]))
        out["df"].append(len(ids))
        out["cf"].append(int(tfs.sum()))
        out["docids"].append(encode_ids(ids))
        out["tfs"].append(encode_tfs(tfs))
        out["bmax"].append(block_max_tf(tfs))
    return pa.table({
        "term": pa.array(out["term"], pa.string()),
        "shard": pa.array(out["shard"], pa.int64()),
        "df": pa.array(out["df"], pa.int64()),
        "cf": pa.array(out["cf"], pa.int64()),
        "docids": pa.array(out["docids"], pa.binary()),
        "tfs": pa.array(out["tfs"], pa.binary()),
        "bmax": pa.array(out["bmax"], pa.binary()),
    })
