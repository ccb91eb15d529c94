"""Strut feature cache: watermark-incremental re-score equals a clean
full recompute after appends (lastScoredId contract)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from miru_ray.state.feature_cache import StrutFeatureCache

SF = "/root/testdata/sf0.001"


def test_incremental_equals_full_recompute(tmp_path, ray_session):
    full = pq.read_table(os.path.join(SF, "events.parquet"))
    full = full.sort_by("event_id")
    cut = full.num_rows * 2 // 3
    prefix_path = str(tmp_path / "events_prefix.parquet")
    full_path = str(tmp_path / "events_full.parquet")
    pq.write_table(full.slice(0, cut), prefix_path)
    pq.write_table(full, full_path)

    # incremental: fold prefix, then fold the grown file (only the new
    # event_ids are scanned — watermark excludes the prefix)
    inc = StrutFeatureCache(str(tmp_path / "cache"), "purchase")
    r1 = inc.update(prefix_path)
    wm1 = r1["watermark"]
    assert wm1 == int(full["event_id"][cut - 1].as_py())
    r2 = inc.update(full_path)
    assert r2["watermark"] >= wm1

    # clean recompute over the full stream
    clean = StrutFeatureCache(str(tmp_path / "cache_clean"), "purchase")
    clean.update(full_path)

    a = inc.topk(50).to_pandas()
    b = clean.topk(50).to_pandas()
    assert a.equals(b)

    # features table identical too (not just the top-k window)
    fa = pq.read_table(inc.features_path).sort_by("user_id")
    fb = pq.read_table(clean.features_path).sort_by("user_id")
    assert fa.equals(fb)


def test_noop_update_is_stable(tmp_path, ray_session):
    src = os.path.join(SF, "events.parquet")
    c = StrutFeatureCache(str(tmp_path / "cache"), "purchase")
    c.update(src)
    before = c.topk(50)
    r = c.update(src)   # watermark already at max → zero-row delta
    assert c.topk(50).equals(before)
    assert r["watermark"] == c._manifest()[0]


def test_cached_entry_matches_strut_scores(ray_session):
    from miru_ray.pipelines.reco import strut_scores
    from miru_ray.state.feature_cache import strut_scores_cached
    a = strut_scores_cached(SF).to_pandas()
    b = strut_scores(SF).to_pandas()
    assert a.equals(b)


def test_crash_between_generation_and_manifest_is_safe(tmp_path, ray_session):
    """A torn update (new generation file written, manifest NOT yet
    swapped) must not double-count the delta on the next update."""
    import shutil

    full = pq.read_table(os.path.join(SF, "events.parquet")).sort_by("event_id")
    cut = full.num_rows * 2 // 3
    prefix_path = str(tmp_path / "events_prefix.parquet")
    full_path = str(tmp_path / "events_full.parquet")
    pq.write_table(full.slice(0, cut), prefix_path)
    pq.write_table(full, full_path)

    c = StrutFeatureCache(str(tmp_path / "cache"), "purchase")
    c.update(prefix_path)
    # simulate the crash: the would-be next generation exists on disk but
    # the manifest still points at the old generation + old watermark
    src_wm = int(full["event_id"][full.num_rows - 1].as_py())
    shutil.copy(c.features_path,
                os.path.join(c.cache_dir, f"features-{src_wm}.parquet"))
    c.update(full_path)   # must fold the delta into the OLD generation

    clean = StrutFeatureCache(str(tmp_path / "cache_clean"), "purchase")
    clean.update(full_path)
    fa = pq.read_table(c.features_path).sort_by("user_id")
    fb = pq.read_table(clean.features_path).sort_by("user_id")
    assert fa.equals(fb)
