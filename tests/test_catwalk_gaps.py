"""Catwalk model shard store: gap detect → range-scoped rebuild →
re-merge (VERDICT r4 #4; the reference's CatwalkModelQueue.java:1-193
missing-partition-range repair semantics).

Invariants pinned:
- merge(all shards) is value-identical to the clean one-pass
  catwalk_model_multi (shards carry UNTRUNCATED additive counts);
- deleting a shard is detected as exactly that gap; repair rebuilds only
  that range and the rebuilt shard is BYTE-identical to the original
  (deterministic sorted write), so the re-merged model hash-equals the
  clean model;
- a complete store detects no gaps and repair is a no-op.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata not present")


def _digest(path: str) -> str:
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


def test_shard_merge_equals_one_pass_model(ray_session):
    from miru_ray.pipelines import reco
    store = reco.catwalk_shard_store(SF)
    want = reco.catwalk_model_multi(SF).to_pandas()
    got = reco.catwalk_model_merged(store).to_pandas()
    pd.testing.assert_frame_equal(got, want)


def test_gap_detect_repair_roundtrip(ray_session):
    from miru_ray.pipelines import reco
    from miru_ray.state.layout import read_json
    store = reco.catwalk_shard_store(SF)
    assert reco.catwalk_detect_gaps(store) == []
    assert reco.catwalk_repair_gaps(SF, store) == []

    man = read_json(os.path.join(store, "manifest.json"))
    nonempty = [e["r"] for e in man["ranges"] if e["rows"] > 0]
    assert len(nonempty) >= 2, "fixture should populate several ranges"
    victim = nonempty[1]
    victim_path = reco._shard_path(store, victim)
    before = _digest(victim_path)
    os.remove(victim_path)
    assert reco.catwalk_detect_gaps(store) == [victim]
    assert reco.catwalk_repair_gaps(SF, store) == [victim]
    assert reco.catwalk_detect_gaps(store) == []
    # deterministic sorted write: the range-scoped rebuild reproduces the
    # clean build's shard bytes exactly
    assert _digest(victim_path) == before


def test_row_count_drift_is_a_gap(ray_session):
    """A shard whose row count disagrees with the manifest counts as a
    gap (truncated/corrupt shard), and repair restores it."""
    import pyarrow.parquet as pq

    from miru_ray.pipelines import reco
    from miru_ray.state.layout import read_json
    store = reco.catwalk_shard_store(SF)
    man = read_json(os.path.join(store, "manifest.json"))
    victim = next(e["r"] for e in man["ranges"] if e["rows"] > 1)
    p = reco._shard_path(store, victim)
    t = pq.read_table(p)
    pq.write_table(t.slice(0, 1), p)      # truncate
    assert victim in reco.catwalk_detect_gaps(store)
    reco.catwalk_repair_gaps(SF, store)
    assert reco.catwalk_detect_gaps(store) == []


def test_driver_entry_matches_clean_model(ray_session):
    from miru_ray.pipelines import reco
    want = reco.catwalk_model_multi(SF).to_pandas()
    got = reco.catwalk_model_gaps(SF).to_pandas()
    pd.testing.assert_frame_equal(got, want)


def test_async_repair_queue_matches_sync(ray_session):
    """The ASYNC queue half (CatwalkModelQueue semantics): enqueue
    detected gaps, background tasks rebuild them, drain() → the store is
    whole again and the merged model equals the clean one-pass build;
    re-enqueue on a clean store is a no-op."""
    import ray

    from miru_ray.pipelines import reco
    from miru_ray.state.layout import read_json
    store = reco.catwalk_shard_store(SF)
    man = read_json(os.path.join(store, "manifest.json"))
    victims = [e["r"] for e in man["ranges"] if e["rows"] > 0][:2]
    digests = {}
    for v in victims:
        p = reco._shard_path(store, v)
        digests[v] = _digest(p)
        os.remove(p)

    q = reco.CatwalkRepairQueue.remote(SF, store)
    assert sorted(ray.get(q.enqueue_gaps.remote())) == sorted(victims)
    assert ray.get(q.drain.remote()) == sorted(victims)
    assert reco.catwalk_detect_gaps(store) == []
    for v in victims:   # async rebuilds are byte-identical too
        assert _digest(reco._shard_path(store, v)) == digests[v]
    assert ray.get(q.enqueue_gaps.remote()) == []   # clean store: no-op
    want = reco.catwalk_model_multi(SF).to_pandas()
    got = reco.catwalk_model_merged(store).to_pandas()
    pd.testing.assert_frame_equal(got, want)
