"""Paired-value bloom sidecar (BloomIndex.java semantics): kernel
properties, OR-merge identity, and the prefilter+verify pipeline vs a
DuckDB exact oracle."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _rand_pairs(n_keys=40, n_vals=200, per_key=30, seed=7):
    rng = np.random.default_rng(seed)
    key_idx = np.repeat(np.arange(n_keys), per_key)
    vals = rng.integers(0, n_vals, size=len(key_idx))
    return key_idx, vals


def test_no_false_negatives_and_fpp_bound():
    from miru_ray.functions.bloom import (
        build_blooms, might_contain, optimal_num_bits, optimal_num_hashes,
        value_hash_pairs)
    key_idx, vals = _rand_pairs()
    m = optimal_num_bits(30, 0.01)
    k = optimal_num_hashes(30, m)
    uniq, inv = np.unique(vals, return_inverse=True)
    h1u, h2u = value_hash_pairs(uniq.tolist())
    blooms = build_blooms(key_idx, h1u[inv], h2u[inv], 40, m, k)

    # every inserted pair answers True
    assert might_contain(blooms[key_idx], h1u[inv], h2u[inv], m, k).all()

    # absent values: observed fpp within 4x the sized 1% (small-sample slack)
    absent = np.arange(1000, 1400)
    ha1, ha2 = value_hash_pairs(absent.tolist())
    rows = np.repeat(np.arange(40), len(absent))
    fp = might_contain(blooms[rows], np.tile(ha1, 40), np.tile(ha2, 40),
                       m, k)
    assert fp.mean() < 0.04


def test_or_merge_equals_single_pass():
    """Partial blooms over pair shards OR-combined == one-pass bloom,
    bit for bit — the mergeable-combine contract the 100-TB build uses."""
    from miru_ray.functions.bloom import build_blooms, value_hash_pairs
    key_idx, vals = _rand_pairs(seed=11)
    uniq, inv = np.unique(vals, return_inverse=True)
    h1, h2 = value_hash_pairs(uniq.tolist())
    h1, h2 = h1[inv], h2[inv]
    whole = build_blooms(key_idx, h1, h2, 40, 613, 7)
    merged = np.zeros_like(whole)
    for lo in range(0, len(key_idx), 97):      # arbitrary uneven shards
        sl = slice(lo, lo + 97)
        merged |= build_blooms(key_idx[sl], h1[sl], h2[sl], 40, 613, 7)
    assert np.array_equal(whole, merged)


def test_paired_bloom_contains_matches_duckdb(ray_session):
    import duckdb
    from miru_ray.pipelines.bloom_pairs import (
        PROBE_KS, paired_bloom_contains)
    got = paired_bloom_contains(SF).to_pandas()
    ks = ", ".join(str(k) for k in PROBE_KS)
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT DISTINCT user_id, json_extract(props, '$.k')::BIGINT AS k
        FROM '{SF}/events.parquet'
        WHERE json_extract(props, '$.k')::BIGINT IN ({ks})
        ORDER BY user_id, k""").df()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["k"].tolist() == want["k"].tolist()


def test_sidecar_prunes_and_cache_reuses(ray_session):
    """The probe must prune candidates (absent probe values cost sidecar
    bytes only) and the store must be reused on a second call."""
    import os
    from miru_ray.functions.bloom import might_contain, value_hash_pairs
    from miru_ray.pipelines import bloom_pairs as bp

    root = bp.build_pair_bloom_store(SF)
    mt0 = os.path.getmtime(os.path.join(root, "meta.json"))
    assert bp.build_pair_bloom_store(SF) == root
    assert os.path.getmtime(os.path.join(root, "meta.json")) == mt0

    side = pq.read_table(os.path.join(root, "blooms"))
    users = side["user_id"].to_numpy()
    blooms = np.stack([np.frombuffer(b, np.uint8)
                       for b in side["bloom"].to_pylist()])
    # absent k values: nearly all (user, k) candidates die at the sidecar
    h1, h2 = value_hash_pairs([5000, 6000, 7000])
    rows = np.repeat(np.arange(len(users)), 3)
    fp = might_contain(blooms[rows], np.tile(h1, len(users)),
                       np.tile(h2, len(users)), bp._NUM_BITS, bp._NUM_HASHES)
    assert fp.mean() < 0.05
    # present values all survive (no false negatives end-to-end): the
    # pipeline's confirmed output equals the truth restricted to probes,
    # which test_paired_bloom_contains_matches_duckdb pins exactly
