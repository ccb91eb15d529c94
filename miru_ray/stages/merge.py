"""Segment merge — stage [F]: per-partition postings → global index segments.

Reference dual: LAB delta/merge of atomized bitmap containers
(miru-service/.../index/lab/LabInvertedIndex.java:76-449) and the
answer-side merge contract (miru-plugin/.../solution/MiruAnswerMerger.java).

Design: one task per term-shard ``s`` reads only the ``shard == s`` rows of
every completed partition's postings file (parquet predicate pushdown),
concatenates, sorts by (term, part) and merges per-term runs vectorized.
This replaces a groupby(term) all-to-all with an embarrassingly parallel
fan-out over S shards — there is NO Ray-level shuffle in the merge:

- group row count per shard is bounded by |vocab_shard| · P regardless of
  corpus size (hot terms are one compressed blob per partition, not one row
  per occurrence — Zipf skew defused, SURVEY.md §7.5);
- global docIDs are ``base[part] + local_id`` (bases = prefix sum over
  partitions), so per-partition id ranges are disjoint and ordered by part:
  merging = rebase + concatenate in part order, already globally sorted.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from miru_ray.functions.postings import (block_max_tf, decode_ids, decode_tfs,
                                         encode_ids, encode_tfs)

__all__ = ["merge_shard", "merge_rows"]


def merge_rows(rows: pa.Table, bases: dict[int, int]) -> pa.Table:
    """Merge partial postings (term, part, df, cf, docids, tfs) → one row per
    term with rebased, globally-sorted ids. Input may hold many terms."""
    empty = pa.table({
        "term": pa.array([], pa.string()), "shard": pa.array([], pa.int64()),
        "df": pa.array([], pa.int64()), "cf": pa.array([], pa.int64()),
        "docids": pa.array([], pa.binary()), "tfs": pa.array([], pa.binary()),
        "bmax": pa.array([], pa.binary()),
    })
    if rows.num_rows == 0:
        return empty
    # sort in ARROW, not pandas: pandas' multi-key sort_values mis-orders
    # strings with embedded NULs (the \x00field\x00 namespace), leaving
    # same-term rows non-adjacent and breaking the run grouping below.
    # Arrow compares string columns bytewise.
    rows = rows.sort_by([("term", "ascending"), ("part", "ascending")])
    df_ = rows.to_pandas()
    terms = df_["term"].to_numpy(dtype=object)
    change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(df_)]])

    parts = df_["part"].to_numpy()
    blobs = df_["docids"].to_numpy(dtype=object)
    tf_blobs = df_["tfs"].to_numpy(dtype=object)
    dfs = df_["df"].to_numpy()
    cfs = df_["cf"].to_numpy()
    shards = df_["shard"].to_numpy()

    out_term, out_shard, out_df, out_cf, out_ids, out_tfs, out_bmax = ([], [], [], [], [], [], [])
    for s, e in zip(starts, ends):
        if e - s == 1:  # single-partition term: rebase only
            ids = decode_ids(blobs[s]) + np.uint64(bases[int(parts[s])])
            tfs = decode_tfs(tf_blobs[s])
        else:
            ids = np.concatenate([decode_ids(blobs[i]) + np.uint64(bases[int(parts[i])])
                                  for i in range(s, e)])
            tfs = np.concatenate([decode_tfs(tf_blobs[i]) for i in range(s, e)])
        out_term.append(terms[s])
        out_shard.append(int(shards[s]))
        out_df.append(int(dfs[s:e].sum()))
        out_cf.append(int(cfs[s:e].sum()))
        out_ids.append(encode_ids(ids))
        out_tfs.append(encode_tfs(tfs))
        out_bmax.append(block_max_tf(tfs))
    return pa.table({
        "term": pa.array(out_term, pa.string()),
        "shard": pa.array(out_shard, pa.int64()),
        "df": pa.array(out_df, pa.int64()),
        "cf": pa.array(out_cf, pa.int64()),
        "docids": pa.array(out_ids, pa.binary()),
        "tfs": pa.array(out_tfs, pa.binary()),
        "bmax": pa.array(out_bmax, pa.binary()),
    })


def merge_shard(batch: pa.Table, *, index_dir: str, part_files: dict[int, str],
                bases: dict[int, int], segments_tmp: str) -> pa.Table:
    """map_batches body over a tiny shard-id dataset: merge one (or more)
    shards and write ``segments_tmp/shard=S.parquet`` atomically.

    Returns a metrics row per shard (terms, bytes) — the lineage record.
    """
    from miru_ray.functions.runtime import limit_worker_threads
    limit_worker_threads()
    out_rows = {"shard": [], "n_terms": [], "bytes": []}
    for shard in batch["shard"].to_pylist():
        pieces = []
        for part, path in part_files.items():
            t = pq.read_table(path, filters=pads.field("shard") == shard,
                              columns=["term", "df", "cf", "docids", "tfs"])
            if t.num_rows:
                t = t.append_column("part", pa.array([part] * t.num_rows, pa.int64()))
                t = t.append_column("shard", pa.array([shard] * t.num_rows, pa.int64()))
                pieces.append(t)
        merged = merge_rows(
            pa.concat_tables(pieces) if pieces else
            pa.table({"term": pa.array([], pa.string())}), bases)
        os.makedirs(segments_tmp, exist_ok=True)
        final = os.path.join(segments_tmp, f"shard={shard:05d}.parquet")
        pq.write_table(merged, final + ".tmp",
                       row_group_size=4096, compression="zstd")
        os.replace(final + ".tmp", final)
        out_rows["shard"].append(shard)
        out_rows["n_terms"].append(merged.num_rows)
        out_rows["bytes"].append(os.path.getsize(final))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out_rows.items()})
