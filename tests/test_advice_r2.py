"""Round-2 hardening: duplicate-row dedup in the shuffle-light build,
extractor-version resume staleness, sip content digests, empty-index search."""

from __future__ import annotations

import glob
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.pipelines.build import BuildConfig, build_index
from miru_ray.pipelines.build_light import build_index_shuffle_light
from miru_ray.sources.fixtures import generate_pages


def _digest(d: str) -> str:
    t = pq.read_table(sorted(glob.glob(os.path.join(d, "segments", "*.parquet"))))
    t = t.sort_by("term")
    h = hashlib.sha256()
    for col in ("term", "df", "cf", "docids", "tfs", "bmax"):
        for v in t[col].to_pylist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()


def test_light_build_dedups_exact_duplicate_rows(tmp_path, ray_session):
    """Exact duplicate rows (same url AND warc_ts AND payload — replayed /
    at-least-once input) must not double tf/cf/df in the shuffle-light path."""
    base = generate_pages(0, 260)
    dup = pa.concat_tables([base, base.slice(10, 40)])  # 40 exact copies
    cfg = BuildConfig(num_parts=4, num_shards=2)
    d_def = str(tmp_path / "default")
    d_light = str(tmp_path / "light")
    build_index(dup, d_def, cfg)
    build_index_shuffle_light(dup, d_light, cfg)
    assert _digest(d_def) == _digest(d_light)


def test_merge_rows_global_drops_cross_batch_duplicates():
    """Duplicate (term, docid) partials — copies that landed in different
    read batches — dedup keep-first at merge."""
    from miru_ray.functions.postings import (decode_ids, decode_tfs,
                                             encode_ids, encode_tfs)
    from miru_ray.stages.invert_global import merge_rows_global
    ids_a = np.array([3, 7], dtype=np.uint64)
    ids_b = np.array([7, 9], dtype=np.uint64)   # docid 7 replayed
    rows = pa.table({
        "term": pa.array(["t", "t"], pa.string()),
        "df": pa.array([2, 2], pa.int64()),
        "cf": pa.array([5, 6], pa.int64()),
        "docids": pa.array([encode_ids(ids_a), encode_ids(ids_b)], pa.binary()),
        "tfs": pa.array([encode_tfs(np.array([2, 3])),
                         encode_tfs(np.array([3, 3]))], pa.binary()),
        "shard": pa.array([0, 0], pa.int64()),
    })
    merged = merge_rows_global(rows)
    assert merged.num_rows == 1
    assert merged["df"][0].as_py() == 3
    assert decode_ids(merged["docids"][0].as_py()).tolist() == [3, 7, 9]
    # keep-first: docid 7 keeps tf=3 from the first partial
    assert decode_tfs(merged["tfs"][0].as_py()).tolist() == [2, 3, 3]
    assert merged["cf"][0].as_py() == 8


def test_resume_rebuilds_stale_extractor_version(tmp_path, ray_session):
    """A completed manifest from an older extractor version is stale; resume
    must rebuild that partition, never mixing extractor versions."""
    from miru_ray.state.layout import manifest_path, read_manifest
    cfg = BuildConfig(num_parts=4, num_shards=2)
    pages = generate_pages(0, 300)
    idx = str(tmp_path / "idx")
    build_index(pages, idx, cfg)
    clean_digest = _digest(idx)

    # simulate an index built by an older extractor on partition 1
    m = read_manifest(idx, 1)
    m["extractor_version"] = "ancient-0"
    with open(manifest_path(idx, 1), "w") as f:
        json.dump(m, f)
    meta = build_index(pages, idx, cfg)   # fast resume path
    assert 1 not in meta["skipped_parts"]
    assert sorted(meta["skipped_parts"]) == [0, 2, 3]
    from miru_ray.functions.extract import EXTRACTOR_VERSION
    assert read_manifest(idx, 1)["extractor_version"] == EXTRACTOR_VERSION
    assert _digest(idx) == clean_digest


def test_sip_detects_content_only_change_text_mode(tmp_path, ray_session):
    """Text-mode inputs fold a content hash into the sip digest: a text
    change under an unchanged (url, warc_ts) triggers a partition rebuild."""
    cfg = BuildConfig(num_parts=4, num_shards=2)
    src = tmp_path / "wal"
    src.mkdir()
    pages = generate_pages(0, 300).drop_columns(["html"])   # text-mode
    pq.write_table(pages, str(src / "a.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, cfg)

    # mutate ONE row's text, keep url+warc_ts
    texts = pages["text"].to_pylist()
    texts[17] = texts[17] + " sipneedle"
    mutated = pages.set_column(pages.schema.get_field_index("text"), "text",
                               pa.array(texts, pa.string()))
    pq.write_table(mutated, str(src / "a.parquet"))
    # delta_appends=False: this test pins the DIGEST DETECTION + base-file
    # identity; the overlay form of the same sip is covered by
    # tests/test_delta_overlay.py
    meta = build_index(str(src), idx, BuildConfig(num_parts=4, num_shards=2,
                                                  verify_inputs=True,
                                                  delta_appends=False))
    assert len(meta["skipped_parts"]) == 3   # only row 17's partition rebuilt

    clean = str(tmp_path / "clean")
    build_index(str(src), clean, cfg)
    assert _digest(idx) == _digest(clean)


def test_empty_source_builds_and_searches(tmp_path, ray_session):
    """Build over 0 rows yields a searchable (empty) index — no crash."""
    from miru_ray.pipelines.search import search
    from miru_ray.sources.fixtures import pages_table
    from miru_ray.state.reader import IndexReader
    idx = str(tmp_path / "empty_idx")
    meta = build_index(pages_table(0), idx, BuildConfig(num_parts=4, num_shards=2))
    assert meta["n_docs"] == 0
    r = IndexReader(idx)
    hits = search(r, "anything at all", k=10)
    assert hits.num_rows == 0
    assert hits.column_names == ["doc_id", "score", "url", "warc_ts", "lang"]
    # gather over an empty request on a NON-empty index also short-circuits
    assert r.gather_docs(np.empty(0, dtype=np.uint64)).num_rows == 0


def test_empty_index_positional_queries(tmp_path, ray_session):
    """Positional queries on a ZERO-row index return empty like every
    other query path — the store_text guard must not fire there (a
    zero-partition index has no docs file to prove the flag)."""
    from miru_ray.pipelines.search import near_search, phrase_search
    from miru_ray.sources.fixtures import pages_table
    from miru_ray.state.reader import IndexReader
    idx = str(tmp_path / "empty_idx_pos")
    build_index(pages_table(0), idx,
                BuildConfig(num_parts=2, num_shards=1, store_text=True))
    r = IndexReader(idx)
    assert phrase_search(r, "key value").num_rows == 0
    assert near_search(r, "key", "value", 3).num_rows == 0
