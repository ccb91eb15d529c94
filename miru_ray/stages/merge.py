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

__all__ = ["merge_shard", "merge_rows", "splice_shard", "delta_shard"]


def _empty_segment_table() -> pa.Table:
    return pa.table({
        "term": pa.array([], pa.string()), "shard": pa.array([], pa.int64()),
        "df": pa.array([], pa.int64()), "cf": pa.array([], pa.int64()),
        "docids": pa.array([], pa.binary()), "tfs": pa.array([], pa.binary()),
        "bmax": pa.array([], pa.binary()),
        "parts": pa.array([], pa.list_(pa.int64())),
        "pdfs": pa.array([], pa.list_(pa.int64())),
        "pcfs": pa.array([], pa.list_(pa.int64())),
    })


def merge_rows(rows: pa.Table, bases: dict[int, int]) -> pa.Table:
    """Merge partial postings (term, part, df, cf, docids, tfs) → one row per
    term with rebased, globally-sorted ids. Input may hold many terms.

    Each output row also records its RUN DIRECTORY — ``parts`` (the
    partitions contributing a run, in part order == id order) and ``pdfs``
    (that run's df) — the "singleton-merge header" that lets a later
    incremental merge splice a changed partition's run in and out without
    re-reading every partition (splice_shard below)."""
    empty = _empty_segment_table()
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
    out_parts, out_pdfs, out_pcfs = [], [], []
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
        out_parts.append([int(p) for p in parts[s:e]])
        out_pdfs.append([int(d) for d in dfs[s:e]])
        out_pcfs.append([int(c) for c in cfs[s:e]])
    return pa.table({
        "term": pa.array(out_term, pa.string()),
        "shard": pa.array(out_shard, pa.int64()),
        "df": pa.array(out_df, pa.int64()),
        "cf": pa.array(out_cf, pa.int64()),
        "docids": pa.array(out_ids, pa.binary()),
        "tfs": pa.array(out_tfs, pa.binary()),
        "bmax": pa.array(out_bmax, pa.binary()),
        "parts": pa.array(out_parts, pa.list_(pa.int64())),
        "pdfs": pa.array(out_pdfs, pa.list_(pa.int64())),
        "pcfs": pa.array(out_pcfs, pa.list_(pa.int64())),
    })


def _fresh_rows(shard: int, changed_files: dict[int, str],
                bases: dict[int, int]) -> pa.Table:
    """Read the ``shard`` rows of each changed partition's postings
    (predicate pushdown), stamp part/shard, and merge per term — the
    shared front half of the full/splice/delta merges."""
    pieces = []
    for part, path in changed_files.items():
        t = pq.read_table(path, filters=pads.field("shard") == shard,
                          columns=["term", "df", "cf", "docids", "tfs"])
        if t.num_rows:
            t = t.append_column("part", pa.array([part] * t.num_rows, pa.int64()))
            t = t.append_column("shard", pa.array([shard] * t.num_rows, pa.int64()))
            pieces.append(t)
    return merge_rows(pa.concat_tables(pieces) if pieces else
                      pa.table({"term": pa.array([], pa.string())}), bases)


def splice_shard(shard: int, old_file: str, changed_files: dict[int, str],
                 old_bases: dict[int, int], new_bases: dict[int, int],
                 dropped: set[int], segments_tmp: str) -> dict:
    """Incremental merge of ONE shard: start from the previous segment
    file, splice OUT the runs of changed/dropped partitions and splice IN
    the changed partitions' fresh postings — never re-reading the
    unchanged partitions' postings files (reference dual: LAB delta
    merge of atomized containers, LabInvertedIndex.java:76-449; this is
    DESIGN.md's "singleton-merge header patch").

    Byte-identity: a term whose runs are untouched AND whose partitions'
    bases are unshifted is copied RAW (no decode); every other term is
    re-derived from decoded runs and re-encoded with the same codec the
    full merge uses — output files are digest-identical to a clean full
    merge (pytest-pinned).
    """
    from miru_ray.functions.runtime import limit_worker_threads
    limit_worker_threads()
    old = pq.read_table(old_file)
    fresh = _fresh_rows(shard, changed_files, new_bases)
    # bulk-convert EVERY column touched in the loop once — chained-array
    # cell.as_py() per row costs five chunk lookups per untouched term,
    # which dominates exactly the fast path this function exists for
    f_term = fresh["term"].to_pylist()
    f_df = fresh["df"].to_pylist()
    f_cf = fresh["cf"].to_pylist()
    f_docids = fresh["docids"].to_pylist()
    f_tfs = fresh["tfs"].to_pylist()
    f_bmax = fresh["bmax"].to_pylist()
    f_parts = fresh["parts"].to_pylist()
    f_pdfs = fresh["pdfs"].to_pylist()
    f_pcfs = fresh["pcfs"].to_pylist()
    fresh_by_term: dict[str, int] = {t: i for i, t in enumerate(f_term)}
    gone = set(changed_files) | set(dropped)
    delta = {p: new_bases.get(p, 0) - old_bases.get(p, 0)
             for p in old_bases}

    o_term = old["term"].to_pylist()
    o_parts = old["parts"].to_pylist()
    o_pdfs = old["pdfs"].to_pylist()
    o_df = old["df"].to_pylist()
    o_cf = old["cf"].to_pylist()
    o_docids = old["docids"].to_pylist()
    o_tfs = old["tfs"].to_pylist()
    o_bmax = old["bmax"].to_pylist()
    o_pcfs = old["pcfs"].to_pylist()
    out = {k: [] for k in ("term", "shard", "df", "cf", "docids", "tfs",
                           "bmax", "parts", "pdfs", "pcfs")}

    def emit(term, df, cf, ids_b, tfs_b, bmax_b, parts_l, pdfs_l, pcfs_l):
        out["term"].append(term); out["shard"].append(shard)
        out["df"].append(df); out["cf"].append(cf)
        out["docids"].append(ids_b); out["tfs"].append(tfs_b)
        out["bmax"].append(bmax_b)
        out["parts"].append(parts_l); out["pdfs"].append(pdfs_l)
        out["pcfs"].append(pcfs_l)

    def emit_fresh(fi: int):
        emit(f_term[fi], f_df[fi], f_cf[fi], f_docids[fi], f_tfs[fi],
             f_bmax[fi], f_parts[fi], f_pdfs[fi], f_pcfs[fi])

    consumed: set[str] = set()
    for i in range(old.num_rows):
        term = o_term[i]
        parts_l = o_parts[i]
        pdfs_l = o_pdfs[i]
        fi = fresh_by_term.get(term)
        untouched = (fi is None
                     and not any(p in gone for p in parts_l)
                     and all(delta.get(p, 0) == 0 for p in parts_l))
        if untouched:
            emit(term, o_df[i], o_cf[i], o_docids[i], o_tfs[i],
                 o_bmax[i], parts_l, pdfs_l, o_pcfs[i])
            continue
        # decode, drop gone runs, shift kept runs, weave in fresh runs
        ids = decode_ids(o_docids[i])
        tfs = decode_tfs(o_tfs[i])
        bounds = np.concatenate([[0], np.cumsum(pdfs_l)]).astype(np.int64)
        runs = []   # (part, ids, tfs)
        for r, p in enumerate(parts_l):
            if p in gone:
                continue
            seg = slice(bounds[r], bounds[r + 1])
            rid = ids[seg]
            d = delta.get(p, 0)
            if d:
                rid = (rid.astype(np.int64) + d).astype(np.uint64)
            runs.append((p, rid, tfs[seg]))
        if fi is not None:
            consumed.add(term)
            fr_ids = decode_ids(f_docids[fi])
            fr_tfs = decode_tfs(f_tfs[fi])
            fb = np.concatenate([[0], np.cumsum(f_pdfs[fi])]).astype(np.int64)
            for r, p in enumerate(f_parts[fi]):
                seg = slice(fb[r], fb[r + 1])
                runs.append((int(p), fr_ids[seg], fr_tfs[seg]))
        if not runs:
            continue   # every run dropped: the term vanishes
        runs.sort(key=lambda x: x[0])   # part order == id order
        m_ids = np.concatenate([r[1] for r in runs])
        m_tfs = np.concatenate([r[2] for r in runs])
        emit(term, len(m_ids), int(m_tfs.sum()), encode_ids(m_ids),
             encode_tfs(m_tfs), block_max_tf(m_tfs),
             [r[0] for r in runs], [len(r[1]) for r in runs],
             [int(r[2].sum()) for r in runs])
    # fresh terms not woven into an existing row are brand new — emit as-is
    for fi in range(fresh.num_rows):
        if f_term[fi] not in consumed:
            emit_fresh(fi)

    merged = pa.table({
        "term": pa.array(out["term"], pa.string()),
        "shard": pa.array(out["shard"], pa.int64()),
        "df": pa.array(out["df"], pa.int64()),
        "cf": pa.array(out["cf"], pa.int64()),
        "docids": pa.array(out["docids"], pa.binary()),
        "tfs": pa.array(out["tfs"], pa.binary()),
        "bmax": pa.array(out["bmax"], pa.binary()),
        "parts": pa.array(out["parts"], pa.list_(pa.int64())),
        "pdfs": pa.array(out["pdfs"], pa.list_(pa.int64())),
        "pcfs": pa.array(out["pcfs"], pa.list_(pa.int64())),
    }).sort_by("term")
    os.makedirs(segments_tmp, exist_ok=True)
    final = os.path.join(segments_tmp, f"shard={shard:05d}.parquet")
    pq.write_table(merged, final + ".tmp",
                   row_group_size=4096, compression="zstd")
    os.replace(final + ".tmp", final)
    return {"n_terms": merged.num_rows, "bytes": os.path.getsize(final)}


def delta_shard(shard: int, old_file: str, changed_files: dict[int, str],
                new_bases: dict[int, int], gen_tmp: str) -> dict:
    """Delta-overlay merge of ONE shard: the base segment file is left
    UNTOUCHED; the changed partitions' fresh postings are merged into one
    small overlay file under the pending generation directory (reference
    dual: LAB delta chits over immutable atomized containers,
    LabInvertedIndex.java:76-449). Cost is O(changed partitions), not
    O(index) — the read side (state/segview.py) weaves overlay runs over
    base runs, dropping base runs of ``replaced`` partitions.

    Returns the shard's stats: n_terms = base terms + overlay-only terms
    (the base-term count comes free from parquet metadata and the
    intersection is a row-group-pruned isin read over just the overlay's
    terms — O(changed), not O(vocabulary); a base term whose every run was
    replaced and that got no fresh row is overcounted until the next fold,
    a documented metadata-only approximation), bytes = base + overlay."""
    from miru_ray.functions.runtime import limit_worker_threads
    limit_worker_threads()
    fresh = _fresh_rows(shard, changed_files, new_bases)
    os.makedirs(gen_tmp, exist_ok=True)
    final = os.path.join(gen_tmp, f"shard={shard:05d}.parquet")
    pq.write_table(fresh, final + ".tmp",
                   row_group_size=4096, compression="zstd")
    os.replace(final + ".tmp", final)
    base_rows = pq.ParquetFile(old_file).metadata.num_rows
    gen_terms = fresh["term"].to_pylist()
    matched = (pq.read_table(
        old_file, columns=["term"],
        filters=pads.field("term").isin(gen_terms)).num_rows
        if gen_terms else 0)
    return {"n_terms": base_rows + len(gen_terms) - matched,
            "bytes": os.path.getsize(old_file) + os.path.getsize(final)}


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
        merged = _fresh_rows(shard, part_files, bases)
        os.makedirs(segments_tmp, exist_ok=True)
        final = os.path.join(segments_tmp, f"shard={shard:05d}.parquet")
        pq.write_table(merged, final + ".tmp",
                       row_group_size=4096, compression="zstd")
        os.replace(final + ".tmp", final)
        out_rows["shard"].append(shard)
        out_rows["n_terms"].append(merged.num_rows)
        out_rows["bytes"].append(os.path.getsize(final))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out_rows.items()})
