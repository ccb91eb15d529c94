"""Index sync — cross-store replication with durable progress.

Reference: MiruSyncSender replicates WAL ranges between clusters keeping a
durable progress key per (tenant, partition)
(miru-sync-deployable/.../MiruSyncSender.java:74-295). Here: copy a built
index's completed partitions + segments to a destination directory,
skipping partitions whose manifest at the destination already matches
(same input digest + doc count) — idempotent, resumable, atomic per file.
"""

from __future__ import annotations

import os
import shutil

from miru_ray.state.layout import (completed_parts, meta_path, part_dir,
                                   read_json, segments_dir, write_json_atomic)

__all__ = ["sync_index"]


def _copy_atomic(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copyfile(src, dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def sync_index(src_dir: str, dst_dir: str) -> dict:
    """Replicate src index → dst. Returns progress {synced: [...],
    skipped: [...]} (the sync progress record)."""
    os.makedirs(dst_dir, exist_ok=True)
    src_parts = completed_parts(src_dir)
    dst_parts = completed_parts(dst_dir)
    synced, skipped = [], []
    for p, m in sorted(src_parts.items()):
        dm = dst_parts.get(p)
        if dm and dm.get("input_digest") == m.get("input_digest") \
                and dm.get("n_docs") == m.get("n_docs"):
            skipped.append(p)
            continue
        sdir, ddir = part_dir(src_dir, p), part_dir(dst_dir, p)
        for name in ("docs.parquet", "postings.parquet"):
            _copy_atomic(os.path.join(sdir, name), os.path.join(ddir, name))
        write_json_atomic(os.path.join(ddir, "manifest.json"), m)  # commit last
        synced.append(p)
    # segments + meta (small; always refreshed to match src)
    sseg = segments_dir(src_dir)
    if os.path.isdir(sseg):
        for name in sorted(os.listdir(sseg)):
            _copy_atomic(os.path.join(sseg, name),
                         os.path.join(segments_dir(dst_dir), name))
    # a live delta overlay travels with the base it annotates
    from miru_ray.state.layout import clear_deltas, delta_root
    clear_deltas(dst_dir)
    sdelta = delta_root(src_dir)
    if os.path.isdir(sdelta):
        for gen_name in sorted(os.listdir(sdelta)):
            gdir = os.path.join(sdelta, gen_name)
            if not os.path.isdir(gdir) or gen_name.endswith(".tmp"):
                continue
            for name in sorted(os.listdir(gdir)):
                _copy_atomic(os.path.join(gdir, name),
                             os.path.join(delta_root(dst_dir), gen_name, name))
    meta = read_json(meta_path(src_dir))
    if meta:
        write_json_atomic(meta_path(dst_dir), meta)
    ts = os.path.join(src_dir, "tombstones.json")
    if os.path.exists(ts):
        _copy_atomic(ts, os.path.join(dst_dir, "tombstones.json"))
    progress = {"synced": synced, "skipped": skipped}
    write_json_atomic(os.path.join(dst_dir, "sync_progress.json"), progress)
    return progress
