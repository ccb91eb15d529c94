"""Driver-testdata readers + the documents→pages adapter (FIXTURES.md §2).

The reference ingests JSON activities whose fields are all strings
(miru-api/.../activity/MiruActivity.java:34-60); our driver testdata is
typed parquet. ``read_table`` prunes columns AT THE READ (row groups never
ship unused columns). ``documents_as_pages`` maps the driver's
``documents`` table into the authoritative pages shape:

    url     := 'doc://' || source || '/' || doc_id
    warc_ts := 2024-01-01T00:00:00Z + doc_id seconds   (deterministic)
    text    := text (extraction bypassed — no html)
    lang    := lang

With this mapping, warc_ts order == doc_id order, so a single-partition
index assigns internal docIDs monotone in the original doc_id — making
engine tie-breaks (internal id) and SQL tie-breaks (doc_id) coincide.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

__all__ = ["read_table", "documents_as_pages", "DOC_TS_BASE_US",
           "orig_doc_ids", "doc_ts_bounds"]

DOC_TS_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def doc_ts_bounds(sf_dir: str) -> tuple[int, int] | None:
    """(lo_us, hi_us) warc_ts bounds of the documents adapter, answered
    from doc_id ROW-GROUP STATISTICS only (warc_ts := base + doc_id s) —
    no data read. The shared helper for every pipeline that builds a
    time_range index over documents_as_pages (fulltext / repair /
    schema-evolve entries). None when the file carries no statistics."""
    import pyarrow.parquet as pq
    src = os.path.join(sf_dir, "documents.parquet")
    meta = pq.ParquetFile(src).metadata
    ci = meta.schema.to_arrow_schema().get_field_index("doc_id")
    lo, hi = None, None
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(ci).statistics
        if st is not None and st.has_min_max:
            lo = int(st.min) if lo is None else min(lo, int(st.min))
            hi = int(st.max) if hi is None else max(hi, int(st.max))
    if lo is None:
        return None
    return (DOC_TS_BASE_US + lo * 1_000_000, DOC_TS_BASE_US + hi * 1_000_000)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               filter=None) -> rd.Dataset:
    """Column-pruned (and optionally row-filtered, via parquet predicate
    pushdown) read of one driver table."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns, filter=filter)


def _to_pages(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"]
    url = pc.binary_join_element_wise(
        pa.scalar("doc://"), batch["source"], pa.scalar("/"),
        pc.cast(doc_id, pa.string()), pa.scalar(""))
    ts = pc.add(pc.multiply(pc.cast(doc_id, pa.int64()), 1_000_000),
                DOC_TS_BASE_US).cast(pa.timestamp("us"))
    # Deterministic entitlement labels (MiruAuthzIndex analog): the driver
    # tables carry no authz column, so labels derive from doc_id residue —
    # residue 0 → [grp0], 1 → [grp1], 2 → [grp0, grp1]. SQL-expressible:
    # caller 'grp0' sees exactly doc_id % 3 IN (0, 2).
    res = pc.cast(doc_id, pa.int64()).to_numpy() % 3
    import numpy as np
    offsets = np.concatenate([[0], np.cumsum(np.where(res == 2, 2, 1))])
    flat = np.empty(offsets[-1], dtype=object)
    flat[offsets[:-1][res == 0]] = "grp0"
    flat[offsets[:-1][res == 1]] = "grp1"
    flat[offsets[:-1][res == 2]] = "grp0"
    flat[offsets[:-1][res == 2] + 1] = "grp1"
    authz = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     pa.array(flat, pa.string()))
    return pa.table({
        "url": url,
        "warc_ts": ts,
        "text": batch["text"],
        "lang": batch["lang"],
        "source": batch["source"],   # secondary keyword field (IndexSchema)
        "n_chars": batch["n_chars"],  # secondary numeric field (range scans)
        "authz": authz,              # entitlement labels (reserved field)
    })


def documents_as_pages(sf_dir: str) -> rd.Dataset:
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text", "lang", "source", "n_chars"])
    return ds.map_batches(_to_pages, batch_format="pyarrow")


def orig_doc_ids(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """'doc://srcN/123' → 123 (int64) — recover the driver's doc_id."""
    arr = urls.to_pylist()
    return pa.array([int(u.rsplit("/", 1)[1]) for u in arr], pa.int64())
