"""Edge-content hardening: unicode, empty docs, same-timestamp duplicate
urls, single-token and huge docs — engine must match the oracle exactly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from miru_ray.sources.fixtures import PAGES_SCHEMA


def _edge_pages() -> pa.Table:
    base = 1_704_067_200_000_000
    rows = [
        # (url, ts, html, lang)
        ("https://e/0", base + 0, "<html><body><p>hello world</p></body></html>", "en"),
        ("https://e/1", base + 1, "<p></p>", "en"),                        # empty text
        ("https://e/2", base + 2, "<p>苹果 häßlich ÉMOJI 🎉 naïve</p>", "de"),  # unicode
        ("https://e/3", base + 3, "<p>" + "tok " * 5000 + "</p>", "en"),   # huge doc
        ("https://e/4", base + 4, "<p>single</p>", "fr"),
        # duplicate url, SAME ts, different html → deterministic tie-break on text
        ("https://e/5", base + 5, "<p>alpha version</p>", "en"),
        ("https://e/5", base + 5, "<p>beta version</p>", "en"),
        # punctuation-only and digits
        ("https://e/6", base + 6, "<p>!!! ... ---</p>", "en"),
        ("https://e/7", base + 7, "<p>42 0x1f 3.14</p>", "en"),
    ]
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2].encode() for r in rows], pa.binary()),
        "text": pa.array([None] * len(rows), pa.string()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
    }).cast(PAGES_SCHEMA)


def test_edge_content_build_and_query(tmp_path, ray_session):
    from miru_ray.functions.extract import extract_text
    from miru_ray.oracle import OracleIndex
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.pipelines.search import search
    from miru_ray.state.reader import IndexReader

    pages = _edge_pages()
    idx = str(tmp_path / "idx")
    meta = build_index(pages, idx, BuildConfig(num_parts=2, num_shards=2))
    assert meta["n_docs"] == 8  # 9 rows − 1 duplicate url

    # oracle needs extracted text (build extracts from html itself)
    extracted = pages.set_column(
        3, "text", pa.array([extract_text(h) for h in pages["html"].to_pylist()],
                            pa.string()))
    oracle = OracleIndex(extracted, num_parts=2)
    reader = IndexReader(idx)
    assert reader.n_docs == oracle.n_docs
    for q in ["hello", "tok", "single", "42", "3 14", "naïve", "version",
              "beta", "xyz_missing", ""]:
        oid, osc = oracle.search(q, k=10)
        hits = search(reader, q, k=10)
        assert hits["doc_id"].to_pylist() == oid.tolist(), q
        assert np.array_equal(hits["score"].to_numpy(), osc), q
    # unicode terms: tokenizer is [a-z0-9]+ so CJK/emoji are separators;
    # 'h' 'lich' from häßlich — check the split is consistent
    assert search(reader, "lich", k=5).num_rows == 1
    # dup-url tie at identical ts resolved deterministically (max text wins)
    hits = search(reader, "version", k=5)
    assert hits.num_rows == 1
    assert "beta" in oracle.docs[int(hits["doc_id"][0].as_py())][3]
