"""Ingress adapters — JSON activity intake → the parquet "WAL".

Reference: HTTP JSON ``List<MiruActivity>`` ingress
(miru-writer-deployable/.../base/MiruActivityIngress.java:39-121) feeding a
durable activity WAL (miru-wal/.../activity/*WALWriter). In the batch
engine the parquet pages table IS the WAL (SURVEY.md §2.1); this module
converts newline-delimited JSON page records into that layout with
deterministic file ordering, so downstream builds (and their per-partition
resume) treat ingested data exactly like native parquet input.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from miru_ray.sources.fixtures import PAGES_SCHEMA

__all__ = ["read_pages_json", "ingest_json_to_wal", "ingest_wet_to_wal"]


def _normalize(batch: pa.Table) -> pa.Table:
    """JSON-parsed rows → pages schema (missing html/text → nulls;
    warc_ts accepts epoch micros int or ISO string)."""
    cols = {}
    names = batch.schema.names
    n = len(batch)
    cols["url"] = batch["url"].cast(pa.string())
    ts = batch["warc_ts"]
    if pa.types.is_integer(ts.type):
        cols["warc_ts"] = ts.cast(pa.int64()).cast(pa.timestamp("us"))
    else:
        cols["warc_ts"] = ts.cast(pa.timestamp("us"))
    if "html" in names:
        h = batch["html"]
        cols["html"] = h.cast(pa.binary()) if not pa.types.is_string(h.type) \
            else pa.array([x.encode() if x is not None else None
                           for x in h.to_pylist()], pa.binary())
    else:
        cols["html"] = pa.nulls(n, pa.binary())
    cols["text"] = (batch["text"].cast(pa.string()) if "text" in names
                    else pa.nulls(n, pa.string()))
    cols["lang"] = (batch["lang"].cast(pa.string()) if "lang" in names
                    else pa.array(["und"] * n, pa.string()))
    return pa.table(cols).cast(PAGES_SCHEMA)


def read_pages_json(paths) -> rd.Dataset:
    """NDJSON page records → pages-schema Dataset."""
    return rd.read_json(paths).map_batches(_normalize, batch_format="pyarrow")


def ingest_json_to_wal(json_paths, wal_dir: str) -> int:
    """Ingest NDJSON into the parquet WAL layout (atomic part files).
    Returns row count."""
    os.makedirs(wal_dir, exist_ok=True)
    ds = read_pages_json(json_paths)
    tmp = wal_dir + ".tmp"
    ds.write_parquet(tmp)
    n = 0
    for i, name in enumerate(sorted(os.listdir(tmp))):
        src = os.path.join(tmp, name)
        dst = os.path.join(wal_dir, f"ingest-{i:05d}.parquet")
        os.replace(src, dst)
        n += 1
    os.rmdir(tmp)
    import pyarrow.parquet as pq
    import glob
    return sum(pq.read_metadata(f).num_rows
               for f in glob.glob(os.path.join(wal_dir, "*.parquet")))


def ingest_wet_to_wal(wet_paths, wal_dir: str, fmt: str = "wet") -> dict:
    """Common Crawl WET/WARC file(s)/dir → the parquet WAL, INCREMENTALLY:
    one WAL parquet per source file (``wet-<stem>.parquet``), and a source
    already converted under an unchanged (size, mtime_ns) is skipped — the
    same stat-validator recipe as the build's per-file sip digest cache,
    so the daily-crawl flow composes end-to-end: new WET files convert
    alone here, then ``build_index(wal, verify_inputs=True)`` rebuilds
    only the partitions their rows land in. Conversion fans out one Ray
    task per source file (the documented raw-task exception: per-FILE
    i/o conversion with per-input output naming, no Dataset semantics).

    Returns {"converted": [...], "skipped": [...], "rows": N}.
    """
    import glob as _glob
    import json as _json

    import ray

    from miru_ray.state.layout import read_json, write_json_atomic

    assert fmt in ("wet", "warc")
    if isinstance(wet_paths, str) and os.path.isdir(wet_paths):
        files = sorted(
            f for f in _glob.glob(os.path.join(wet_paths, "*"))
            if os.path.isfile(f))
    else:
        files = sorted(wet_paths if isinstance(wet_paths, (list, tuple))
                       else [wet_paths])
    os.makedirs(wal_dir, exist_ok=True)
    # "_"-prefixed so parquet dataset discovery (ray read_parquet /
    # pyarrow.dataset, ignore_prefixes ['.', '_']) never trips over it
    cache_path = os.path.join(wal_dir, "_ingest_cache.json")
    cache = read_json(cache_path) or {}
    if cache.get("__fmt__") not in (None, fmt):
        cache = {}
    cache["__fmt__"] = fmt

    @ray.remote
    def convert(src: str, dst: str) -> int:
        import pyarrow.parquet as _pq

        from miru_ray.sources.wet import parse_warc_bytes, parse_wet_bytes
        with open(src, "rb") as f:
            data = f.read()
        t = parse_wet_bytes(data) if fmt == "wet" else parse_warc_bytes(data)
        _pq.write_table(t, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
        return t.num_rows

    todo, skipped = [], []
    for src in files:
        st = os.stat(src)
        stem = os.path.splitext(os.path.basename(src))[0].replace(".warc", "")
        dst = os.path.join(wal_dir, f"wet-{stem}.parquet")
        e = cache.get(src)
        if (e and e.get("size") == st.st_size
                and e.get("mtime_ns") == st.st_mtime_ns
                and os.path.exists(dst)):
            skipped.append(src)
            continue
        todo.append((src, dst, st))
    rows = ray.get([convert.remote(s, d) for s, d, _ in todo]) if todo else []
    for (src, dst, st), n in zip(todo, rows):
        cache[src] = {"size": st.st_size, "mtime_ns": st.st_mtime_ns,
                      "out": os.path.basename(dst), "rows": int(n)}
    if todo:
        write_json_atomic(cache_path, cache)
    return {"converted": [s for s, _, _ in todo], "skipped": skipped,
            "rows": int(sum(rows))}
