"""SegView — resolved read access to base segments + the delta overlay.

The delta-append path (pipelines/build.py finalize_index) leaves the big
``segments/`` files untouched and writes ONE small overlay generation
``segments_delta/gen=K/shard=S.parquet`` holding fresh rows for exactly
the partitions that changed since the base was merged (reference dual:
LAB delta chits over immutable atomized containers,
miru-service/.../index/lab/LabInvertedIndex.java:76-449). A reader must
therefore resolve every term against TWO sources:

- the base row: runs for parts NOT in ``replaced_parts`` survive;
- the overlay row: all of its runs survive (it was written with the
  CURRENT bases and fully supersedes the replaced partitions).

The v4 run directory (parts, pdfs, pcfs) makes stat resolution
(df/cf) decode-free; posting resolution decodes and weaves runs in
part order, which — because partition docID ranges are disjoint and
ascending with part id — yields globally sorted ids without a sort.

When an index has no overlay (``meta`` lacks ``delta``), every method
passes the base rows through untouched — the hot path is unchanged.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from miru_ray.state.layout import delta_gen_dir, segments_dir

__all__ = ["SegView", "scan_shard_files"]


def scan_shard_files(d: str) -> dict[int, str]:
    return {int(os.path.basename(f).split("=")[1].split(".")[0]): f
            for f in glob.glob(os.path.join(d, "shard=*.parquet"))}


def _runs_bounds(pdfs: list[int]) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(pdfs)]).astype(np.int64)


class SegView:
    """One segment family (primary or a sidecar field family), possibly
    overlaid by the index's delta generation (primary family only)."""

    def __init__(self, seg_dir: str, delta: dict | None = None,
                 index_dir: str | None = None):
        self.files = scan_shard_files(seg_dir)
        self.gen_files: dict[int, str] = {}
        self.replaced: set[int] = set()
        if delta:
            gdir = delta_gen_dir(index_dir, int(delta["gen"]))
            self.gen_files = scan_shard_files(gdir)
            self.replaced = {int(p) for p in delta["replaced_parts"]}
            if self.replaced and not self.gen_files:
                # meta names an overlay that is not on disk: serving base
                # rows with replaced runs dropped would silently lose docs
                raise FileNotFoundError(
                    f"index meta references delta generation {gdir} but no "
                    "shard files exist there (partial copy or tampering); "
                    "re-run the build to restore a consistent view")

    @classmethod
    def primary(cls, index_dir: str, meta: dict) -> "SegView":
        return cls(segments_dir(index_dir), meta.get("delta"), index_dir)

    # ---------------------------------------------------------- reads

    def _read(self, shard: int, columns: list[str],
              filters) -> tuple[pa.Table | None, pa.Table | None]:
        f = self.files.get(shard)
        base = (pq.read_table(f, columns=columns, filters=filters)
                if f is not None else None)
        g = self.gen_files.get(shard)
        gen = (pq.read_table(g, columns=columns, filters=filters)
               if g is not None else None)
        return base, gen

    def shards(self) -> list[int]:
        return sorted(set(self.files) | set(self.gen_files))

    def stats(self, shard: int, filters) -> pa.Table:
        """(term, df, cf) with overlay resolution, decode-free: surviving
        df/cf are sums over the run directory (pdfs/pcfs)."""
        if not self.gen_files and not self.replaced:
            base, _ = self._read(shard, ["term", "df", "cf"], filters)
            return base if base is not None else _empty_stats()
        base, gen = self._read(
            shard, ["term", "df", "cf", "parts", "pdfs", "pcfs"], filters)
        out_t, out_df, out_cf = [], [], []
        gen_terms = (dict(zip(gen["term"].to_pylist(),
                              range(gen.num_rows))) if gen is not None else {})
        if base is not None:
            for term, parts, pdfs, pcfs in zip(
                    base["term"].to_pylist(), base["parts"].to_pylist(),
                    base["pdfs"].to_pylist(), base["pcfs"].to_pylist()):
                df = cf = 0
                for p, d, c in zip(parts, pdfs, pcfs):
                    if p not in self.replaced:
                        df += d
                        cf += c
                gi = gen_terms.pop(term, None)
                if gi is not None:
                    df += int(gen["df"][gi].as_py())
                    cf += int(gen["cf"][gi].as_py())
                if df:
                    out_t.append(term); out_df.append(df); out_cf.append(cf)
        for term, gi in gen_terms.items():   # overlay-only terms
            out_t.append(term)
            out_df.append(int(gen["df"][gi].as_py()))
            out_cf.append(int(gen["cf"][gi].as_py()))
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "df": pa.array(out_df, pa.int64()),
                         "cf": pa.array(out_cf, pa.int64())})

    def terms(self, shard: int, filters) -> list[str]:
        """Terms with >=1 surviving run (dead terms — every run replaced
        and nothing fresh — are excluded)."""
        if not self.gen_files and not self.replaced:
            base, _ = self._read(shard, ["term"], filters)
            return base["term"].to_pylist() if base is not None else []
        return self.stats(shard, filters)["term"].to_pylist()

    def postings(self, shard: int, filters, want_tfs: bool = True,
                 want_bmax: bool = False) -> list[dict]:
        """Resolved posting rows: [{term, ids, tfs, df, bmax}] with ids
        globally sorted. Decodes only what the overlay forces: a term
        untouched by the overlay hands back its blobs decoded exactly as
        the plain path would."""
        from miru_ray.functions.postings import (block_max_tf, decode_ids,
                                                 decode_tfs)
        want_tfs = want_tfs or want_bmax   # a recomputed bmax needs the tfs
        cols = ["term", "df", "docids"]
        if want_tfs:
            cols.append("tfs")
        if want_bmax:
            cols.append("bmax")
        if not self.gen_files and not self.replaced:
            # overlay-free passthrough: the run directory isn't touched, so
            # this path also serves pre-v3 segment files without it
            base, _ = self._read(shard, cols, filters)
            if base is None:
                return []
            return [
                {"term": t, "df": df,
                 "ids": decode_ids(blob),
                 "tfs": decode_tfs(tblob) if want_tfs else None,
                 "bmax": (np.frombuffer(bblob, dtype="<u2").astype(np.int64)
                          if want_bmax else None)}
                for t, df, blob, tblob, bblob in zip(
                    base["term"].to_pylist(), base["df"].to_pylist(),
                    base["docids"].to_pylist(),
                    base["tfs"].to_pylist() if want_tfs
                    else [None] * base.num_rows,
                    base["bmax"].to_pylist() if want_bmax
                    else [None] * base.num_rows)]
        base, gen = self._read(shard, cols + ["parts", "pdfs"], filters)
        out: list[dict] = []
        gen_rows: dict[str, int] = (dict(zip(gen["term"].to_pylist(),
                                             range(gen.num_rows)))
                                    if gen is not None else {})

        def _gen_runs(gi: int) -> list[tuple[int, np.ndarray, np.ndarray | None]]:
            ids = decode_ids(gen["docids"][gi].as_py())
            tfs = decode_tfs(gen["tfs"][gi].as_py()) if want_tfs else None
            b = _runs_bounds(gen["pdfs"][gi].as_py())
            return [(int(p), ids[b[r]:b[r + 1]],
                     tfs[b[r]:b[r + 1]] if want_tfs else None)
                    for r, p in enumerate(gen["parts"][gi].as_py())]

        if base is not None:
            for i in range(base.num_rows):
                term = base["term"][i].as_py()
                parts = base["parts"][i].as_py()
                gi = gen_rows.pop(term, None)
                touched = gi is not None or any(
                    p in self.replaced for p in parts)
                if not touched:
                    row = {"term": term, "df": int(base["df"][i].as_py()),
                           "ids": decode_ids(base["docids"][i].as_py()),
                           "tfs": (decode_tfs(base["tfs"][i].as_py())
                                   if want_tfs else None)}
                    if want_bmax:
                        row["bmax"] = np.frombuffer(
                            base["bmax"][i].as_py(), dtype="<u2") \
                            .astype(np.int64)
                    out.append(row)
                    continue
                ids = decode_ids(base["docids"][i].as_py())
                tfs = decode_tfs(base["tfs"][i].as_py()) if want_tfs else None
                b = _runs_bounds(base["pdfs"][i].as_py())
                runs = [(int(p), ids[b[r]:b[r + 1]],
                         tfs[b[r]:b[r + 1]] if want_tfs else None)
                        for r, p in enumerate(parts)
                        if p not in self.replaced]
                if gi is not None:
                    runs.extend(_gen_runs(gi))
                if not runs:
                    continue                      # term died with its parts
                runs.sort(key=lambda x: x[0])     # part order == id order
                m_ids = np.concatenate([r[1] for r in runs])
                row = {"term": term, "df": len(m_ids), "ids": m_ids,
                       "tfs": (np.concatenate([r[2] for r in runs])
                               if want_tfs else None)}
                if want_bmax:
                    row["bmax"] = np.frombuffer(
                        block_max_tf(row["tfs"]),
                        dtype="<u2").astype(np.int64)
                out.append(row)
        for term, gi in gen_rows.items():         # overlay-only terms
            runs = _gen_runs(gi)
            m_ids = np.concatenate([r[1] for r in runs])
            row = {"term": term, "df": len(m_ids), "ids": m_ids,
                   "tfs": (np.concatenate([r[2] for r in runs])
                           if want_tfs else None)}
            if want_bmax:
                row["bmax"] = np.frombuffer(
                    block_max_tf(row["tfs"]), dtype="<u2").astype(np.int64)
            out.append(row)
        return out


def _empty_stats() -> pa.Table:
    return pa.table({"term": pa.array([], pa.string()),
                     "df": pa.array([], pa.int64()),
                     "cf": pa.array([], pa.int64())})
