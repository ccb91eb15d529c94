"""Shuffle-light index build — two passes, no text through the shuffle.

The alternative plan from DESIGN.md "Known limits" #1, selected with
``build_index_shuffle_light``:

    pass 1  read (url, warc_ts, lang) only   [~50 B/row shuffled]
              → stamp part → groupby(part) → dedup latest-wins by url,
              docIDs by (warc_ts, url) rank → docs.parquet + manifest
    bases   driver prefix sum
    pass 2  read (url, warc_ts, html|text)   [NO shuffle]
              → extract → stamp part
              → map_batches(InvertBatchGlobal actor pool): resolve global
                docIDs from cached per-part lookups, invert per batch
              → write per-batch partials (global ids)
    merge   per-shard ray tasks argsort-merge batch partials → segments
    doclen  per-part tasks assemble doclen from partials → docs.parquet

Trade-offs vs the default single-shuffle build (pipelines/build.py):
+ all-to-all volume drops ~40× (ids/metadata instead of text);
− input is READ TWICE (pass 1 is column-pruned to ~2% of bytes);
− inversion checkpointing is pass-scoped, not partition-scoped (a crash
  in pass 2 redoes pass 2; pass-1 partitions still resume);
− duplicate rows with identical (url, warc_ts) but different payloads
  resolve by pass-1 order, not payload tie-break.

Output is byte-identical to the default path on inputs without
same-(url, ts) payload conflicts (tested: equal segment digests).
"""

from __future__ import annotations

import functools
import glob
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from miru_ray.functions.extract import EXTRACTOR_VERSION
from miru_ray.pipelines.build import (PAGES_COLUMNS, BuildConfig, _stamp_part,
                                      current_input_digests)
from miru_ray.stages.extract import EXTRACT_BATCH_SIZE, extract_batch
from miru_ray.stages.invert_global import InvertBatchGlobal, merge_rows_global
from miru_ray.stages.partition_build import input_digest
from miru_ray.state import layout
from miru_ray.state.layout import (completed_parts, meta_path, part_dir,
                                   segments_dir, write_json_atomic,
                                   write_manifest)

__all__ = ["build_index_shuffle_light"]


def _assign_ids(group: pd.DataFrame, *, index_dir: str) -> pd.DataFrame:
    """Pass-1 map_groups body: dedup + docID assignment over tiny columns."""
    from miru_ray.functions.runtime import limit_worker_threads
    limit_worker_threads()
    part = int(group["part"].iloc[0])
    ts_us = group["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    digest = input_digest(group["url"].to_numpy(dtype=object), ts_us)
    df = pd.DataFrame({
        "url": group["url"].to_numpy(dtype=object),
        "ts": ts_us,
        "lang": group["lang"].to_numpy(dtype=object),
    })
    df = df.sort_values(["url", "ts"], kind="stable").drop_duplicates(
        "url", keep="last")
    df = df.sort_values(["ts", "url"], kind="stable").reset_index(drop=True)
    n = len(df)
    docs = pa.table({
        "local_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "url": pa.array(df["url"].tolist(), pa.string()),
        "warc_ts": pa.array(df["ts"].to_numpy(), pa.timestamp("us")),
        "lang": pa.array(df["lang"].tolist(), pa.string()),
        "doclen": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),  # pass-2 fills
    })
    pdir = part_dir(index_dir, part)
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, "docs.parquet.tmp")
    pq.write_table(docs, tmp, row_group_size=4096)
    os.replace(tmp, os.path.join(pdir, "docs.parquet"))
    write_manifest(index_dir, part, {
        "part": part, "status": "ids", "input_digest": digest,
        "extractor_version": EXTRACTOR_VERSION, "schema_meta": [],
        "n_rows_in": len(group), "n_docs": n,
        "sum_doclen": 0, "n_terms": -1, "elapsed_s": 0.0,
    })
    return pd.DataFrame({"part": [part], "n_docs": [n]})


@ray.remote
def _merge_shard_light(shard: int, partial_files: list[str],
                       segments_tmp: str) -> dict:
    import pyarrow.dataset as pads
    pieces = []
    for f in partial_files:
        t = pq.read_table(f, filters=pads.field("shard") == shard,
                          columns=["term", "shard", "df", "cf", "docids", "tfs"])
        if t.num_rows:
            pieces.append(t)
    merged = merge_rows_global(
        pa.concat_tables(pieces) if pieces else
        pa.table({"term": pa.array([], pa.string())}))
    os.makedirs(segments_tmp, exist_ok=True)
    final = os.path.join(segments_tmp, f"shard={shard:05d}.parquet")
    pq.write_table(merged, final + ".tmp", row_group_size=4096,
                   compression="zstd")
    os.replace(final + ".tmp", final)
    return {"n_terms": merged.num_rows, "bytes": os.path.getsize(final)}


@ray.remote
def _gather_doclen(partial_files: list[str], n_docs: int) -> np.ndarray:
    """ONE pass over the doclen rows → the dense global doclen array
    (8 B/doc; 10^12 docs ⇒ at cluster scale this becomes a small
    groupby(part) shuffle of 16 B/doc instead of a dense array)."""
    import pyarrow.dataset as pads
    from miru_ray.functions.postings import decode_ids, decode_tfs
    doclen = np.zeros(n_docs, dtype=np.int64)
    for f in partial_files:
        t = pq.read_table(f, filters=pads.field("shard") == -1,
                          columns=["docids", "tfs"])
        for blob, tf_blob in zip(t["docids"].to_pylist(), t["tfs"].to_pylist()):
            ids = decode_ids(blob).astype(np.int64)
            doclen[ids] = decode_tfs(tf_blob)
    return doclen


@ray.remote
def _write_doclen(part: int, doclen_slice: np.ndarray, index_dir: str) -> int:
    pdir = part_dir(index_dir, part)
    docs = pq.read_table(os.path.join(pdir, "docs.parquet"))
    docs = docs.set_column(docs.schema.get_field_index("doclen"), "doclen",
                           pa.array(doclen_slice, pa.int64()))
    tmp = os.path.join(pdir, "docs.parquet.tmp")
    pq.write_table(docs, tmp, row_group_size=4096)
    os.replace(tmp, os.path.join(pdir, "docs.parquet"))
    m = layout.read_manifest(index_dir, part)
    m.update(status="complete", sum_doclen=int(doclen_slice.sum()))
    write_manifest(index_dir, part, m)
    return int(doclen_slice.sum())


def build_index_shuffle_light(source, index_dir: str,
                              cfg: BuildConfig | None = None) -> dict:
    cfg = cfg or BuildConfig()
    if cfg.langs:
        raise NotImplementedError("shuffle-light build does not support the "
                                  "lang pushdown filter yet — use build_index")
    if cfg.analyzer != "simple":
        raise NotImplementedError("build_index_shuffle_light does not "
                                  "support analyzer chains yet — use "
                                  "build_index")
    if cfg.schema:
        raise NotImplementedError("shuffle-light build does not support "
                                  "secondary field schemas yet — use build_index")
    if cfg.partition_mode != "hash":
        raise NotImplementedError("shuffle-light build supports "
                                  "partition_mode='hash' only — use build_index")
    os.makedirs(index_dir, exist_ok=True)
    phase_t: dict[str, float] = {}
    t0 = time.perf_counter()

    def _open(columns):
        if isinstance(source, rd.Dataset):
            return source.select_columns(columns)
        if isinstance(source, pa.Table):
            return rd.from_arrow(source.select(columns))
        return rd.read_parquet(source, columns=columns)

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8

    # --- pass 1: ids over tiny columns ---
    ds1 = _open(["url", "warc_ts", "lang"])
    ds1 = ds1.map_batches(functools.partial(_stamp_part, num_parts=cfg.num_parts),
                          batch_format="pyarrow")
    ds1 = ds1.repartition(max(2 * ncpu, cfg.num_parts))
    _ = ds1.groupby("part").map_groups(
        functools.partial(_assign_ids, index_dir=index_dir),
        batch_format="pandas").count()
    phase_t["pass1_ids"] = round(time.perf_counter() - t0, 3)

    parts_mani = {p: m for p, m in
                  ((p, layout.read_manifest(index_dir, p))
                   for p in range(cfg.num_parts))
                  if m and m.get("status") in ("ids", "complete")}
    parts_sorted = sorted(parts_mani)
    counts = np.array([parts_mani[p]["n_docs"] for p in parts_sorted], dtype=np.int64)
    bases_arr = np.concatenate([[0], np.cumsum(counts)[:-1]])
    bases = {p: int(b) for p, b in zip(parts_sorted, bases_arr)}
    n_docs = int(counts.sum())

    # --- pass 2: invert with global ids, no shuffle ---
    t2 = time.perf_counter()
    names = (source.schema().names if isinstance(source, rd.Dataset)
             else source.schema.names if isinstance(source, pa.Table)
             else rd.read_parquet(source).schema().names)
    cols = [c for c in ("url", "warc_ts", "html", "text") if c in names]
    ds2 = _open(cols)
    if "html" in cols:
        ds2 = ds2.map_batches(extract_batch, batch_format="pyarrow",
                              batch_size=EXTRACT_BATCH_SIZE)
    ds2 = ds2.map_batches(functools.partial(_stamp_part, num_parts=cfg.num_parts),
                          batch_format="pyarrow")
    partials_dir = os.path.join(index_dir, "partials")
    shutil.rmtree(partials_dir, ignore_errors=True)
    ds2.map_batches(InvertBatchGlobal, batch_format="pyarrow",
                    batch_size=2048, concurrency=(1, max(2, ncpu)),
                    num_cpus=2 if ncpu > 16 else 1,
                    fn_constructor_kwargs={
                        "index_dir": index_dir, "bases": bases,
                        "num_shards": cfg.num_shards,
                    }).write_parquet(partials_dir)
    phase_t["pass2_invert"] = round(time.perf_counter() - t2, 3)

    # --- merge + doclen finalize (parallel task fan-outs) ---
    t3 = time.perf_counter()
    partial_files = sorted(glob.glob(os.path.join(partials_dir, "*.parquet")))
    seg_tmp = segments_dir(index_dir) + ".tmp"
    shutil.rmtree(seg_tmp, ignore_errors=True)   # crashed run's leftovers
    seg_stats = ray.get([_merge_shard_light.remote(s, partial_files, seg_tmp)
                         for s in range(cfg.num_shards)])
    # same two-rename swap as finalize_index: the live dir exists for all
    # but the ~µs between renames, never through an O(files) rmtree
    seg_live = segments_dir(index_dir)
    seg_trash = seg_live + ".old"
    shutil.rmtree(seg_trash, ignore_errors=True)
    if os.path.isdir(seg_live):
        os.rename(seg_live, seg_trash)
    os.replace(seg_tmp, seg_live)
    shutil.rmtree(seg_trash, ignore_errors=True)
    layout.clear_deltas(index_dir)
    doclen_all = ray.get(_gather_doclen.remote(partial_files, n_docs))
    sums = ray.get([_write_doclen.remote(
        p, doclen_all[bases[p]:bases[p] + int(parts_mani[p]["n_docs"])],
        index_dir) for p in parts_sorted])
    phase_t["merge_finalize"] = round(time.perf_counter() - t3, 3)
    shutil.rmtree(partials_dir, ignore_errors=True)

    sum_doclen = int(sum(sums))
    meta = {
        # v2, NOT layout.FORMAT_VERSION: the global merge writes no
        # per-term run directory (parts/pdfs), so a later incremental
        # build over this index must never take the v3 splice path —
        # finalize_index's format check sends it to a full merge
        "format_version": 2,
        "mode": "shuffle_light",
        "num_parts": cfg.num_parts, "num_shards": cfg.num_shards,
        "k1": cfg.k1, "b": cfg.b,
        "n_docs": n_docs,
        "avgdl": sum_doclen / n_docs if n_docs else 0.0,
        "sum_doclen": sum_doclen,
        "bases": {str(p): bases[p] for p in parts_sorted},
        "part_counts": {str(p): int(parts_mani[p]["n_docs"]) for p in parts_sorted},
        "extractor_version": EXTRACTOR_VERSION,
        "skipped_parts": [],
        "tokenizer": "[a-z0-9]+ lowercase",
        "n_terms": int(sum(r["n_terms"] for r in seg_stats)),
        "segment_bytes": int(sum(r["bytes"] for r in seg_stats)),
        "phase_sec": phase_t,
    }
    write_json_atomic(meta_path(index_dir), meta)
    return meta
