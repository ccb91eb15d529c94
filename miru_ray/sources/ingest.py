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

__all__ = ["read_pages_json", "ingest_json_to_wal"]


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
