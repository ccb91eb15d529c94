"""Term-feature cache with a lastScoredId watermark — incremental re-score.

Reference: StrutModelScorer caches gathered per-doc term features and
re-gathers only activity past the partition's lastScoredId watermark
(miru-stream-plugins/.../strut/StrutModelScorer.java;
MiruAggregateUtil.gatherFeatures:77-305). Here the same contract for the
Strut score over ``events``:

- features per user (numerator = #label events, denominator = #events)
  are ADDITIVE, so an append-only event stream needs only the NEW rows'
  partial features merged into the cache;
- the watermark is ``max(event_id)`` scored so far (the reference's
  lastScoredId); the incremental scan reads rows with
  ``event_id > watermark`` via parquet predicate pushdown — appended data
  is touched once, history never re-read;
- the cache itself is a parquet table (user_id, num, den) merged
  DISTRIBUTEDLY (union → groupby sum), so it scales with |users|, not
  |events|, and never materializes on the driver;
- updates commit by GENERATION: the merged table is written to
  ``features-{new_wm}.parquet`` and the manifest (watermark + filename)
  is swapped atomically LAST. A crash at any point leaves the manifest
  pointing at the previous generation + previous watermark, so the next
  update re-folds the same delta into the OLD table — never into a table
  that already contains it (true crash idempotence; the old in-place
  replace could double-count a delta if the process died between the
  file swap and the watermark write).

Result contract: identical to pipelines.reco.strut_scores (same SQL
oracle) on any prefix of the stream — pytest-verified equal to a clean
full recompute after appends.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd

from miru_ray.state.layout import read_json, write_json_atomic

__all__ = ["StrutFeatureCache", "strut_scores_cached"]


class StrutFeatureCache:
    def __init__(self, cache_dir: str, label: str = "purchase"):
        self.cache_dir = cache_dir
        self.label = label
        os.makedirs(cache_dir, exist_ok=True)
        self.wm_path = os.path.join(cache_dir, "watermark.json")

    def _manifest(self) -> tuple[int, str | None, tuple | None, tuple | None]:
        """(watermark, committed features file or None, source stat,
        prefix guard (rows, xor) or None)."""
        wm = read_json(self.wm_path)
        if wm is None or wm.get("label") != self.label:
            return -1, None, None, None
        f = wm.get("file")
        path = os.path.join(self.cache_dir, f) if f else None
        if path is not None and not os.path.exists(path):
            return -1, None, None, None   # torn state: rebuild from scratch
        st = wm.get("src_stat")
        pg = wm.get("prefix_guard")
        return (int(wm["last_event_id"]), path,
                tuple(st) if st else None, tuple(pg) if pg else None)

    @property
    def features_path(self) -> str | None:
        return self._manifest()[1]

    def _gc_generations(self, keep: str) -> None:
        """Best-effort removal of every generation file except ``keep`` —
        runs after each manifest commit so refold/torn paths cannot
        accumulate orphans."""
        import glob
        for f in glob.glob(os.path.join(self.cache_dir, "features-*.parquet")):
            if os.path.basename(f) != keep:
                try:
                    os.remove(f)
                except OSError:
                    pass

    @staticmethod
    def _digest_batch(b: pa.RecordBatch | pa.Table) -> tuple[int, int]:
        """(rows, XOR of per-row hashes) over the exact columns the fold
        reads (event_id, user_id, event_type) — XOR is commutative, so
        the digest folds forward additively across deltas.

        The per-row hash must be NON-linear in its fields: a plain
        ``eid*C1 ^ uid*C2 ^ et`` is XOR-linear, so swapping user_ids
        between two historical rows cancels out across the fold and a
        mutate+append rewrite passes the guard. Fields are therefore
        mixed through splitmix64-style avalanche rounds before the
        cross-row XOR."""
        from miru_ray.functions.hashing import hash_strings
        eid = b.column(0).to_numpy(zero_copy_only=False).astype(np.uint64)
        uid = b.column(1).to_numpy(zero_copy_only=False).astype(np.uint64)
        et = hash_strings(np.asarray(b.column(2).to_pylist(), dtype=object))
        h = eid * np.uint64(0x9E3779B185EBCA87) + uid
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= et
        h = (h ^ (h >> np.uint64(29))) * np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(32)
        return len(h), int(np.bitwise_xor.reduce(h))

    _DIGEST_COLS = ["event_id", "user_id", "event_type"]

    def _prefix_digest(self, events_path: str, wm: int) -> tuple[int, int]:
        """Digest of rows with event_id <= wm — a pushdown scan of the
        history prefix over the fold's own three columns. Catches the
        rewrite that both mutates history AND appends higher ids (which
        looks like a pure append to the watermark check alone): O(prefix)
        column read, far cheaper than a refold (no shuffle), and
        skippable (verify_prefix=False) for WALs that guarantee
        append-only."""
        rows, x = 0, 0
        for b in pads.dataset(events_path).to_batches(
                columns=self._DIGEST_COLS,
                filter=pads.field("event_id") <= wm):
            if b.num_rows:
                n, h = self._digest_batch(b)
                rows += n
                x ^= h
        return rows, x

    def update(self, events_path: str, verify_prefix: bool = True) -> dict:
        """Fold events with event_id > watermark into the feature cache.
        Returns {"watermark": id, "users": n}."""
        wm, feat_path, old_stat, old_guard = self._manifest()
        fstat = os.stat(events_path)
        cur_stat = (fstat.st_size, fstat.st_mtime_ns)
        # source watermark from parquet row-group STATISTICS (no data read)
        src_wm = -1
        meta = pq.ParquetFile(events_path).metadata
        ci = meta.schema.to_arrow_schema().get_field_index("event_id")
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                src_wm = max(src_wm, int(st.max))
        if src_wm < wm or (src_wm == wm and old_stat is not None
                           and tuple(cur_stat) != old_stat):
            # watermark regressed, OR the file changed while its max
            # event_id stayed put — either way a REWRITE, not an append:
            # discard the cache and refold from scratch
            wm, feat_path, old_guard = -1, None, None
        elif src_wm == wm and feat_path is not None:
            return {"watermark": wm,
                    "users": pq.ParquetFile(feat_path).metadata.num_rows}
        if (verify_prefix and feat_path is not None and src_wm > wm
                and old_guard is not None
                and tuple(cur_stat) != (old_stat or ())):
            # apparent append (higher max id, changed file): verify the
            # history prefix is untouched before trusting the delta fold
            if self._prefix_digest(events_path, wm) != old_guard:
                wm, feat_path, old_guard = -1, None, None
        new_wm = src_wm
        ds = rd.read_parquet(events_path,
                             columns=["event_id", "user_id", "event_type"],
                             filter=pads.field("event_id") > wm)
        label = self.label

        def partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "user_id": t["user_id"].to_numpy(),
                "num": (t["event_type"].to_numpy(zero_copy_only=False)
                        == label).astype(np.int64),
            })
            g = df.groupby("user_id", sort=False).agg(
                num=("num", "sum"), den=("num", "size")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        delta = ds.map_batches(partial, batch_format="pyarrow")
        if feat_path is not None:
            delta = delta.union(rd.read_parquet(feat_path))
        from miru_ray.functions.rollup import bucketed_sum_rollup
        merged = bucketed_sum_rollup(delta, keys=["user_id"],
                                     val_cols=["num", "den"])
        t = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
        t = pa.table({"user_id": t["user_id"].cast(pa.int64()),
                      "num": t["num"].cast(pa.int64()),
                      "den": t["den"].cast(pa.int64())})
        # prefix guard rolls forward ADDITIVELY: XOR/count of the delta's
        # event_ids folds into the stored prefix digest — no history read
        d_rows, d_xor = 0, 0
        for b in pads.dataset(events_path).to_batches(
                columns=self._DIGEST_COLS,
                filter=pads.field("event_id") > wm):
            if b.num_rows:
                n, h = self._digest_batch(b)
                d_rows += n
                d_xor ^= h
        if feat_path is not None and old_guard is None and wm >= 0:
            # pre-guard manifest being appended onto: backfill the prefix
            # digest once so the NEW manifest's guard covers all history
            old_guard = self._prefix_digest(events_path, wm)
        base_rows, base_xor = old_guard if (old_guard and feat_path) else (0, 0)
        gen_name = f"features-{new_wm}.parquet"
        gen_path = os.path.join(self.cache_dir, gen_name)
        pq.write_table(t, gen_path + ".tmp", row_group_size=65536)
        os.replace(gen_path + ".tmp", gen_path)
        write_json_atomic(self.wm_path, {"last_event_id": new_wm,
                                         "label": self.label,
                                         "file": gen_name,
                                         "src_stat": list(cur_stat),
                                         "prefix_guard": [base_rows + d_rows,
                                                          base_xor ^ d_xor]})
        self._gc_generations(keep=gen_name)
        return {"watermark": new_wm, "users": t.num_rows}

    def topk(self, k: int = 50) -> pa.Table:
        """(user_id, score) from cached features — reco.strut_scores
        contract: score = num/den, top-k by (score desc, user_id asc)."""
        t = pq.read_table(self._manifest()[1]).to_pandas()
        score = t["num"].to_numpy() / t["den"].to_numpy()
        order = np.lexsort((t["user_id"].to_numpy(), -score))[:k]
        sel = t.iloc[order]
        return pa.table({
            "user_id": pa.array(sel["user_id"].to_numpy(), pa.int64()),
            "score": pa.array(np.round(score[order], 6), pa.float64()),
        })


def strut_scores_cached(sf_dir: str, label: str = "purchase",
                        k: int = 50) -> pa.Table:
    """Driver entry: strut scores answered FROM the feature cache —
    cold call folds the whole stream (watermark −1), later calls fold only
    appended event_ids. Output identical to reco.strut_scores."""
    import re
    slug = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir)).strip("_")
    src = os.path.join(sf_dir, "events.parquet")
    # keyed by slug ONLY: appends reuse the cache (that is the point of
    # the watermark); update() detects rewrites via source-vs-watermark
    # stats and refolds from scratch, so no stale dirs accumulate
    cache_dir = os.path.join("/tmp/miru_ray_featcache", slug)
    cache = StrutFeatureCache(cache_dir, label)
    cache.update(src)
    return cache.topk(k)
