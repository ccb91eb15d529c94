"""WET (Common Crawl extracted-text) source: round-trip fidelity and
build-equivalence with the parquet path."""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from miru_ray.sources.fixtures import generate_pages
from miru_ray.sources.wet import (pages_to_wet_bytes, parse_wet_bytes,
                                  read_wet, write_wet)


def _second_aligned_pages(lo: int, hi: int, keep_html: bool = False) -> pa.Table:
    """WARC-Date carries second resolution — align the fixture so the
    WET/WARC round-trip is lossless for the equality assertions."""
    t = generate_pages(lo, hi)
    if not keep_html and "html" in t.column_names:
        t = t.drop_columns(["html"])
    ts = t["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ts = (ts // 1_000_000) * 1_000_000
    i = t.schema.get_field_index("warc_ts")
    return t.set_column(i, "warc_ts", pa.array(ts, pa.timestamp("us")))


def _pages_text(lo: int, hi: int) -> pa.Table:
    from miru_ray.functions.extract import extract_text
    t = _second_aligned_pages(lo, hi)
    if "html" in t.column_names:
        texts = [extract_text(h.as_py()) for h in t["html"]]
        t = t.drop_columns(["html", "text"] if "text" in t.column_names
                           else ["html"])
        t = t.append_column("text", pa.array(texts, pa.string()))
    return t.select(["url", "warc_ts", "text", "lang"])


def test_wet_roundtrip_plain_and_gz():
    t = _pages_text(0, 120)
    for gz in (False, True):
        back = parse_wet_bytes(pages_to_wet_bytes(t, gz=gz))
        assert back["url"].to_pylist() == t["url"].to_pylist()
        assert back["warc_ts"].to_pylist() == t["warc_ts"].to_pylist()
        assert back["text"].to_pylist() == t["text"].to_pylist()
        assert back["lang"].to_pylist() == t["lang"].to_pylist()


def test_wet_skips_warcinfo_and_multimember_gzip():
    import gzip
    t = _pages_text(0, 5)
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: "
            b"application/warc-fields\r\nContent-Length: 9\r\n\r\nrobots: x\r\n\r\n")
    data = gzip.compress(info, mtime=0) + pages_to_wet_bytes(t, gz=True)
    back = parse_wet_bytes(data)
    assert back.num_rows == 5
    assert back["url"].to_pylist() == t["url"].to_pylist()


def test_build_from_wet_matches_parquet_build(tmp_path, ray_session):
    from miru_ray.pipelines.build import BuildConfig, build_index
    t = _pages_text(0, 400)
    wdir = tmp_path / "wet"
    write_wet(t.slice(0, 200), str(wdir / "seg-00000.warc.wet.gz"))
    write_wet(t.slice(200, 200), str(wdir / "seg-00001.warc.wet"))
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(t, str(pdir / "pages.parquet"))

    cfg = lambda: BuildConfig(num_parts=4, num_shards=2)   # noqa: E731
    idx_w = str(tmp_path / "idx_wet")
    idx_p = str(tmp_path / "idx_pq")
    mw = build_index(read_wet(str(wdir)), idx_w, cfg())
    mp = build_index(str(pdir), idx_p, cfg())
    # latest-wins url dedup applies identically on both paths (the fixture
    # plants duplicate fetches, so the doc count is the unique-url count)
    n_unique = len(set(t["url"].to_pylist()))
    assert mw["n_docs"] == mp["n_docs"] == n_unique

    def seg_digest(d):
        tt = pq.read_table(sorted(glob.glob(os.path.join(d, "segments",
                                                         "*.parquet"))))
        tt = tt.sort_by("term")
        h = hashlib.sha256()
        for col in ("term", "df", "cf", "docids", "tfs"):
            for v in tt[col].to_pylist():
                h.update(v if isinstance(v, bytes) else str(v).encode())
        return h.hexdigest()

    assert seg_digest(idx_w) == seg_digest(idx_p)


def test_warc_roundtrip_and_build_matches_html_parquet(tmp_path, ray_session):
    """WARC response records: the html payload round-trips byte-exactly
    and a build from WARC (html mode — the extract stage runs) is
    segment-digest-identical to the same rows built from parquet."""
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.sources.wet import (pages_to_warc_bytes, parse_warc_bytes,
                                      read_warc, write_warc)
    t = _second_aligned_pages(0, 300, keep_html=True)
    assert "html" in t.column_names
    back = parse_warc_bytes(pages_to_warc_bytes(t.slice(0, 150), gz=True))
    assert back["url"].to_pylist() == t.slice(0, 150)["url"].to_pylist()
    assert back["html"].to_pylist() == [
        h if isinstance(h, bytes) else h.encode()
        for h in t.slice(0, 150)["html"].to_pylist()]

    wdir = tmp_path / "warc"
    write_warc(t.slice(0, 150), str(wdir / "seg-00000.warc.gz"))
    write_warc(t.slice(150, 150), str(wdir / "seg-00001.warc"))
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(t, str(pdir / "pages.parquet"))
    cfg = lambda: BuildConfig(num_parts=4, num_shards=2)   # noqa: E731
    idx_w = str(tmp_path / "idx_warc")
    idx_p = str(tmp_path / "idx_pq")
    mw = build_index(read_warc(str(wdir)), idx_w, cfg())
    mp = build_index(str(pdir), idx_p, cfg())
    n_unique = len(set(t["url"].to_pylist()))
    assert mw["n_docs"] == mp["n_docs"] == n_unique

    def seg_digest(d):
        tt = pq.read_table(sorted(glob.glob(os.path.join(d, "segments",
                                                         "*.parquet"))))
        tt = tt.sort_by("term")
        h = hashlib.sha256()
        for col in ("term", "df", "cf", "docids", "tfs"):
            for v in tt[col].to_pylist():
                h.update(v if isinstance(v, bytes) else str(v).encode())
        return h.hexdigest()

    assert seg_digest(idx_w) == seg_digest(idx_p)


def test_wet_wal_ingest_is_incremental(tmp_path, ray_session):
    """ingest_wet_to_wal converts each WET file once (stat-validated skip)
    and composes with the build's sip: a new WET file converts alone, and
    verify_inputs rebuilds only the partitions its rows land in."""
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.pipelines.search import search
    from miru_ray.sources.ingest import ingest_wet_to_wal
    from miru_ray.sources.wet import write_wet
    from miru_ray.state.reader import IndexReader

    t = _pages_text(0, 600)
    ts = t["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    bounds = (int(ts.min()), int(ts.max()) + 1)
    wdir = tmp_path / "wet"
    write_wet(t.slice(0, 300), str(wdir / "crawl-a.warc.wet.gz"))
    write_wet(t.slice(300, 200), str(wdir / "crawl-b.warc.wet.gz"))
    wal = str(tmp_path / "wal")
    p1 = ingest_wet_to_wal(str(wdir), wal)
    assert len(p1["converted"]) == 2 and p1["rows"] == 500
    # re-ingest: both sources skip (stat-validated)
    p2 = ingest_wet_to_wal(str(wdir), wal)
    assert p2["converted"] == [] and len(p2["skipped"]) == 2

    idx = str(tmp_path / "idx")
    cfg = lambda: BuildConfig(num_parts=8, num_shards=2,     # noqa: E731
                              partition_mode="time_range",
                              time_bounds=bounds, verify_inputs=True)
    m1 = build_index(wal, idx, cfg())
    assert m1["n_docs"] == len(set(t.slice(0, 500)["url"].to_pylist()))

    # the daily delta: one new WET file → one conversion, partial rebuild
    write_wet(t.slice(500, 100), str(wdir / "crawl-c.warc.wet.gz"))
    p3 = ingest_wet_to_wal(str(wdir), wal)
    assert len(p3["converted"]) == 1 and p3["rows"] == 100
    m2 = build_index(wal, idx, cfg())
    assert m2["n_docs"] == len(set(t["url"].to_pylist()))
    rebuilt = sorted(set(range(8)) - set(m2["skipped_parts"]))
    assert 0 < len(rebuilt) < 8      # time-ordered append → tail partitions
    hits = search(IndexReader(idx), "needle7", k=20)
    assert hits.num_rows == 7
