"""Round-4 review findings, pinned.

1. Splice-merge staleness after a CRASHED resume (a partition rebuilt by
   a run that died before finalize must be spliced on the next run even
   though its digest now matches) — the part_digests guard.
2. True no-op resume reuses the existing segments (merge_mode="reuse").
3. Repairs route by URL PROBE, not by the new version timestamp — a
   version far outside the doc's time bucket still repairs in place.
4. grey+alpha PNGs decode through the media lane (channel-0 luma).
5. add_field duplicate-key resolution prefers a real value over None.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from util import seg_digest as _digest

from miru_ray.pipelines.build import BuildConfig, build_index
from miru_ray.sources.fixtures import generate_pages


def test_splice_detects_partition_rebuilt_by_crashed_run(tmp_path, ray_session):
    """Simulate: run B rebuilds partitions for a changed source, then dies
    BEFORE finalize (meta + segments still run-A's). Run C skips those
    partitions (digests match the current source) — the splice must still
    fold their fresh postings in via the part_digests mismatch."""
    cfg = lambda: BuildConfig(num_parts=6, num_shards=2,   # noqa: E731
                              verify_inputs=True)
    src = tmp_path / "wal"
    src.mkdir()
    pq.write_table(generate_pages(0, 600), str(src / "a.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, cfg())

    # snapshot run-A meta + segments
    shutil.copy(os.path.join(idx, "meta.json"), str(tmp_path / "metaA.json"))
    shutil.copytree(os.path.join(idx, "segments"), str(tmp_path / "segsA"))

    # source changes (append), run B completes fully…
    pq.write_table(generate_pages(600, 700), str(src / "b.parquet"))
    build_index(str(src), idx, cfg())
    # …then we restore run-A meta + segments == run B died before finalize
    shutil.copy(str(tmp_path / "metaA.json"), os.path.join(idx, "meta.json"))
    shutil.rmtree(os.path.join(idx, "segments"))
    shutil.copytree(str(tmp_path / "segsA"), os.path.join(idx, "segments"))

    # run C: every partition's digest matches the current source → all
    # skipped; without the part_digests guard the old segments would be
    # reused/spliced without the new rows
    meta = build_index(str(src), idx, cfg())
    assert meta["skipped_parts"] == sorted(meta["bases"], key=int) \
        or len(meta["skipped_parts"]) == len(meta["bases"])
    clean = str(tmp_path / "clean")
    build_index(str(src), clean, BuildConfig(num_parts=6, num_shards=2))
    n_dups = len([i for i in range(700) if i % 211 == 210 and i > 0])
    assert meta["n_docs"] == 700 - n_dups
    assert _digest(idx) == _digest(clean)


def test_noop_resume_reuses_segments(tmp_path, ray_session):
    cfg = lambda: BuildConfig(num_parts=4, num_shards=2,   # noqa: E731
                              verify_inputs=True)
    src = tmp_path / "wal"
    src.mkdir()
    pq.write_table(generate_pages(0, 300), str(src / "a.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, cfg())
    seg_files = sorted(glob.glob(os.path.join(idx, "segments", "*.parquet")))
    mtimes = {f: os.stat(f).st_mtime_ns for f in seg_files}
    meta = build_index(str(src), idx, cfg())
    assert meta["phase_sec"]["merge_mode"] == "reuse"
    assert {f: os.stat(f).st_mtime_ns for f in seg_files} == mtimes
    assert meta["n_docs"] == 299


def test_repair_routes_by_probe_not_version_ts(tmp_path, ray_session):
    """A repair whose version timestamp lands in a DIFFERENT time bucket
    than the doc must still replace the doc in place (no duplicate)."""
    from miru_ray.pipelines.repair import repair_index
    from miru_ray.pipelines.search import search
    from miru_ray.state.reader import IndexReader
    pages = generate_pages(0, 400)
    ts = pages["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    idx = str(tmp_path / "idx")
    build_index(pages, idx,
                BuildConfig(num_parts=4, num_shards=2, store_text=True,
                            partition_mode="time_range",
                            time_bounds=(int(ts.min()), int(ts.max()))))
    url = pages["url"][5].as_py()   # early doc = partition 0 territory
    feed = pa.table({
        "op": pa.array(["repair"]),
        "url": pa.array([url]),
        # version far in the future: a LAST-bucket timestamp
        "warc_ts": pa.array([int(ts.max()) + 1], pa.timestamp("us")),
        "text": pa.array(["replacement body zzzuniq token"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    })
    before = IndexReader(idx).n_docs
    meta = repair_index(idx, feed)
    assert meta["n_docs"] == before          # replaced, not duplicated
    r = IndexReader(idx)
    got = search(r, "zzzuniq")
    assert got.num_rows == 1 and got["url"][0].as_py() == url


def test_png_grey_alpha_through_media_lane():
    from miru_ray.functions.png import encode_png
    from miru_ray.pipelines.multimodal import _decode_blob
    rs = np.random.RandomState(3)
    ga = rs.randint(0, 256, (6, 5, 2)).astype(np.uint8)
    out = _decode_blob("png", encode_png(ga))
    np.testing.assert_array_equal(out, ga[None, :, :, 0])


def test_add_field_prefers_real_value_over_none(tmp_path, ray_session):
    from miru_ray.pipelines.schema_evolve import add_field
    from miru_ray.state.reader import IndexReader
    from miru_ray.state.schema import FieldDef
    pages = generate_pages(0, 60)
    idx = str(tmp_path / "idx")
    build_index(pages, idx, BuildConfig(num_parts=2, num_shards=2))
    # source with DUPLICATE (url, ts) rows: one None, one real value —
    # in both orders
    n = pages.num_rows
    vals = [None if i % 2 else "tag%d" % i for i in range(n)]
    base = pages.append_column("tag", pa.array(vals, pa.string()))
    flip = pages.append_column(
        "tag", pa.array([("tag%d" % i) if i % 2 else None
                         for i in range(n)], pa.string()))
    both = pa.concat_tables([base, flip])
    add_field(idx, both, FieldDef("tag", "keyword"))
    r = IndexReader(idx)
    # every doc has SOME real tag in the source, so every live doc must
    # carry a tag posting (None never wins the dedup)
    tagged = r.prefix_union_ids("\x00tag\x00tag", cap=100)
    assert len(tagged) == r.n_docs
