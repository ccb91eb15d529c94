"""Version-checked REPAIR/REMOVE (pipelines/repair.py, VERDICT r3 #4).

The done-criterion: index-after-repairs hash-equals a CLEAN BUILD over the
corrected corpus — segments AND per-partition docs — with untouched
partitions never rewritten, stale (older-version) repairs ignored, and
new-url repairs landing as adds.
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from util import seg_digest as _seg_digest

from miru_ray.pipelines.build import BuildConfig, build_index
from miru_ray.pipelines.repair import repair_index
from miru_ray.sources.fixtures import generate_pages


def _docs_digest(d: str) -> str:
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(d, "partitions", "part=*",
                                           "docs.parquet"))):
        t = pq.read_table(f)
        h.update(os.path.basename(os.path.dirname(f)).encode())
        for col in t.column_names:
            for v in t[col].to_pylist():
                h.update(str(v).encode())
    return h.hexdigest()


US = 1   # 1 µs version bumps


@pytest.fixture(scope="module")
def repair_case(ray_session, tmp_path_factory):
    """Base index over a corrupted corpus + the correcting feed + the
    corrected corpus a clean build must match."""
    root = tmp_path_factory.mktemp("repair")
    base = generate_pages(0, 500)
    urls = np.asarray(base["url"].to_pylist(), dtype=object)
    ts = base["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    texts = np.asarray(base["text"].to_pylist(), dtype=object)
    langs = np.asarray(base["lang"].to_pylist(), dtype=object)

    from miru_ray.functions.hashing import part_for
    idx_rows = np.arange(len(urls))
    # keep the correction feed INSIDE partitions {0,1} so the test can
    # assert partitions 2/3 are never rewritten (partition-scoped repair)
    in_p01 = np.isin(part_for(urls, 4), [0, 1])
    corrupt = (idx_rows % 13 == 0) & in_p01   # texts to corrupt then repair
    remove = (idx_rows % 29 == 0) & in_p01    # urls to remove (incl. overlap)
    stale = (idx_rows % 17 == 5) & in_p01     # repairs with an OLDER version

    corrupted = texts.copy()
    corrupted[corrupt] = "corrupted placeholder"
    base_tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": base["warc_ts"],
        "text": pa.array(corrupted, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })

    feed_rows = []
    for i in np.flatnonzero(corrupt):
        feed_rows.append(("repair", urls[i], ts[i] + US, texts[i], langs[i]))
    for i in np.flatnonzero(stale):
        # version check: OLDER than the indexed doc — must be ignored
        feed_rows.append(("repair", urls[i], ts[i] - US,
                          "stale must never appear", langs[i]))
    for i in np.flatnonzero(remove):
        feed_rows.append(("remove", urls[i], ts[i] + 2 * US, None, None))
    # a brand-new url routed to partition 0 or 1: repair-as-add
    new_url = next(u for u in
                   (f"http://added.example/new{i}" for i in range(64))
                   if part_for(np.array([u], dtype=object), 4)[0] in (0, 1))
    feed_rows.append(("repair", new_url, ts.max() + US,
                      "entirely new added document text", "en"))
    feed = pa.table({
        "op": pa.array([r[0] for r in feed_rows], pa.string()),
        "url": pa.array([r[1] for r in feed_rows], pa.string()),
        "warc_ts": pa.array([int(r[2]) for r in feed_rows], pa.timestamp("us")),
        "text": pa.array([r[3] for r in feed_rows], pa.string()),
        "lang": pa.array([r[4] for r in feed_rows], pa.string()),
    })

    # corrected corpus per the documented contract: (base ∪ winning
    # repairs) minus rows with ts <= remove version; stale repair rows are
    # older and lose the ordinary latest-wins dedup, so just union them
    c_urls = list(urls) + [urls[i] for i in np.flatnonzero(corrupt)] \
        + [urls[i] for i in np.flatnonzero(stale)] \
        + [new_url]
    c_ts = list(ts) + [ts[i] + US for i in np.flatnonzero(corrupt)] \
        + [ts[i] - US for i in np.flatnonzero(stale)] \
        + [int(ts.max() + US)]
    c_text = list(corrupted) + [texts[i] for i in np.flatnonzero(corrupt)] \
        + ["stale must never appear"] * int(stale.sum()) \
        + ["entirely new added document text"]
    c_lang = list(langs) + [langs[i] for i in np.flatnonzero(corrupt)] \
        + [langs[i] for i in np.flatnonzero(stale)] + ["en"]
    rem_v = {urls[i]: ts[i] + 2 * US for i in np.flatnonzero(remove)}
    keep = [not (u in rem_v and t_ <= rem_v[u])
            for u, t_ in zip(c_urls, c_ts)]
    corrected = pa.table({
        "url": pa.array(np.asarray(c_urls, dtype=object)[keep], pa.string()),
        "warc_ts": pa.array(np.asarray(c_ts)[keep].astype("datetime64[us]"),
                            pa.timestamp("us")),
        "text": pa.array(np.asarray(c_text, dtype=object)[keep], pa.string()),
        "lang": pa.array(np.asarray(c_lang, dtype=object)[keep], pa.string()),
    })

    cfg = BuildConfig(num_parts=4, num_shards=2, store_text=True)
    repaired_dir = str(root / "repaired")
    build_index(base_tbl, repaired_dir, cfg)
    return {"repaired_dir": repaired_dir, "feed": feed,
            "corrected": corrected, "cfg": cfg, "root": root,
            "new_url": new_url}


def test_repair_equals_clean_build(repair_case):
    rd_ = repair_case["repaired_dir"]
    manifests = sorted(glob.glob(os.path.join(rd_, "partitions", "part=*",
                                              "manifest.json")))
    mtimes_before = {f: os.stat(f).st_mtime_ns for f in manifests}
    meta = repair_index(rd_, repair_case["feed"])

    clean_dir = str(repair_case["root"] / "clean")
    clean_meta = build_index(repair_case["corrected"], clean_dir,
                             repair_case["cfg"])

    assert meta["n_docs"] == clean_meta["n_docs"]
    assert meta["bases"] == clean_meta["bases"]
    assert _seg_digest(rd_) == _seg_digest(clean_dir)
    assert _docs_digest(rd_) == _docs_digest(clean_dir)

    # partition-scoped: the feed lives in partitions {0,1}, so 2/3 must
    # keep their original manifest files byte-untouched
    repaired = meta["phase_sec"]["repaired_parts"]
    assert set(repaired) <= {0, 1}
    untouched = [f for f in manifests
                 if os.stat(f).st_mtime_ns == mtimes_before[f]]
    assert len(untouched) >= 2


def test_repair_search_sees_corrections(repair_case):
    from miru_ray.pipelines.search import search
    from miru_ray.state.reader import IndexReader
    r = IndexReader(repair_case["repaired_dir"])
    # the stale repair text never appears
    assert search(r, "stale never appear").num_rows == 0
    # the corrupted placeholder is gone
    assert search(r, "corrupted placeholder").num_rows == 0
    # the added doc is findable
    got = search(r, "entirely new added document")
    assert got.num_rows == 1
    assert got["url"][0].as_py() == repair_case["new_url"]


def test_repair_refuses_unrepairable_index(ray_session, tmp_path):
    d = str(tmp_path / "nostore")
    build_index(generate_pages(0, 120), d,
                BuildConfig(num_parts=2, num_shards=2, store_text=False))
    feed = pa.table({"op": pa.array(["remove"]),
                     "url": pa.array(["http://x/"]),
                     "warc_ts": pa.array([0], pa.timestamp("us")),
                     "text": pa.array([None], pa.string()),
                     "lang": pa.array([None], pa.string())})
    with pytest.raises(ValueError, match="store_text"):
        repair_index(d, feed)
