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
- writes are write-temp-then-rename with the watermark committed LAST, so
  a crash mid-update re-scans from the old watermark (idempotent: the
  merge is rebuilt from cache+delta each time, never applied in place).

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
        self.features_path = os.path.join(cache_dir, "features.parquet")
        self.wm_path = os.path.join(cache_dir, "watermark.json")

    def _watermark(self) -> int:
        wm = read_json(self.wm_path)
        if wm is None or wm.get("label") != self.label:
            return -1
        return int(wm["last_event_id"])

    def update(self, events_path: str) -> dict:
        """Fold events with event_id > watermark into the feature cache.
        Returns {"new_rows": n, "watermark": id}."""
        wm = self._watermark()
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
        if os.path.exists(self.features_path):
            delta = delta.union(rd.read_parquet(self.features_path))
        from miru_ray.functions.rollup import bucketed_sum_rollup
        merged = bucketed_sum_rollup(delta, keys=["user_id"],
                                     val_cols=["num", "den"])
        t = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
        t = pa.table({"user_id": t["user_id"].cast(pa.int64()),
                      "num": t["num"].cast(pa.int64()),
                      "den": t["den"].cast(pa.int64())})
        # new watermark from parquet row-group STATISTICS (no data read)
        new_wm = wm
        meta = pq.ParquetFile(events_path).metadata
        ci = meta.schema.to_arrow_schema().get_field_index("event_id")
        for rg in range(meta.num_row_groups):
            s = meta.row_group(rg).column(ci).statistics
            if s is not None and s.has_min_max:
                new_wm = max(new_wm, int(s.max))
        tmp = self.features_path + ".tmp"
        pq.write_table(t, tmp, row_group_size=65536)
        os.replace(tmp, self.features_path)
        write_json_atomic(self.wm_path, {"last_event_id": new_wm,
                                         "label": self.label})
        return {"watermark": new_wm, "users": t.num_rows}

    def topk(self, k: int = 50) -> pa.Table:
        """(user_id, score) from cached features — reco.strut_scores
        contract: score = num/den, top-k by (score desc, user_id asc)."""
        t = pq.read_table(self.features_path).to_pandas()
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
    st = os.stat(src)
    cache_dir = os.path.join("/tmp/miru_ray_featcache",
                             f"{slug}_{st.st_size}_{st.st_mtime_ns}")
    cache = StrutFeatureCache(cache_dir, label)
    cache.update(src)
    return cache.topk(k)
