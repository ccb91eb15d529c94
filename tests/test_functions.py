"""Unit tests for the pure kernels (extract, tokenize, codec, bm25)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_ray.functions.extract import extract_text
from miru_ray.functions.postings import (decode_ids, decode_tfs, diff_sorted,
                                         encode_ids, encode_tfs,
                                         intersect_sorted, union_sorted)
from miru_ray.functions.tokenize import tokenize, tokenize_column


def test_extract_byte_identical_on_fixture(pages):
    """input_hint invariant: extract(html) == text byte-for-byte per url."""
    htmls = pages["html"].to_pylist()
    texts = pages["text"].to_pylist()
    for h, t in zip(htmls, texts):
        assert extract_text(h) == t


def test_extract_strips_boilerplate():
    html = (b"<html><head><title>A B</title><style>x{}</style></head>"
            b"<body><nav>no</nav><p>keep  me</p><script>drop()</script>"
            b"<footer>no</footer></body></html>")
    assert extract_text(html) == "A B\nkeep me"


def test_extract_entities_and_nesting():
    assert extract_text("<p>a &amp; b</p>") == "a & b"
    assert extract_text("<div><p>x</p><div>y</div></div>") == "x\ny"


def test_tokenize_basic():
    assert tokenize("Hello, World-9 (x)") == ["hello", "world", "9", "x"]
    assert tokenize("") == []
    assert tokenize("...") == []


def test_tokenize_column_matches_scalar(pages):
    import pyarrow as pa
    texts = pages["text"].combine_chunks()
    col = tokenize_column(texts)
    for i in range(0, len(texts), 37):
        assert col[i].as_py() == tokenize(texts[i].as_py())


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), unique=True, max_size=500))
def test_codec_roundtrip_property(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(decode_ids(encode_ids(arr)), arr)


def test_codec_dense_container():
    # > 4096 ids in one 64Ki range → bitmap container
    ids = np.arange(0, 60000, 3, dtype=np.uint64)
    assert np.array_equal(decode_ids(encode_ids(ids)), ids)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), unique=True,
                min_size=1, max_size=500))
def test_codec_first_last_edge_read_property(ids):
    from miru_ray.functions.postings import decode_first_last
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert decode_first_last(encode_ids(arr)) == (int(arr[0]), int(arr[-1]))


def test_codec_first_last_container_shapes():
    """Edge read across every container layout: single array, bitmap-only,
    array|bitmap mix, bitmap edges at low-bit boundaries."""
    from miru_ray.functions.postings import decode_first_last
    import pytest
    cases = [
        np.array([7], dtype=np.uint64),
        np.arange(0, 60000, 3, dtype=np.uint64),              # bitmap
        np.concatenate([np.array([5, 9], np.uint64),          # array +
                        np.arange(1 << 16, (1 << 16) + 20000,
                                  2, dtype=np.uint64)]),      # bitmap
        np.array([0, (1 << 16) - 1], np.uint64),              # low-bit edges
        np.concatenate([np.arange(0, 20000, 2, np.uint64),    # bitmap first
                        np.array([(5 << 16) + 3], np.uint64)]),
    ]
    for ids in cases:
        blob = encode_ids(ids)
        assert decode_first_last(blob) == (int(ids[0]), int(ids[-1]))
        full = decode_ids(blob)
        assert (int(full[0]), int(full[-1])) == decode_first_last(blob)
    with pytest.raises(ValueError):
        decode_first_last(encode_ids(np.empty(0, np.uint64)))


def test_codec_tf_widths():
    small = np.array([1, 2, 255], dtype=np.int64)
    big = np.array([1, 70000], dtype=np.int64)
    assert np.array_equal(decode_tfs(encode_tfs(small)), small)
    assert np.array_equal(decode_tfs(encode_tfs(big)), big)


def test_set_algebra():
    a = np.array([1, 3, 5, 7], dtype=np.uint64)
    b = np.array([3, 4, 7], dtype=np.uint64)
    assert intersect_sorted(a, b).tolist() == [3, 7]
    assert union_sorted(a, b).tolist() == [1, 3, 4, 5, 7]
    assert diff_sorted(a, b).tolist() == [1, 5]


def test_bm25_monotonicity():
    from miru_ray.functions.bm25 import bm25_term_scores, idf, topk_order
    # idf decreases with df; contribution increases with tf
    assert idf(1000, 1) > idf(1000, 100) > 0
    s = bm25_term_scores(np.array([1, 2, 4]), np.array([100, 100, 100]),
                         df=10, n_docs=1000, avgdl=100.0)
    assert s[0] < s[1] < s[2]
    # tie-break: equal scores → higher doc id first (FullText.java comparator)
    order = topk_order(np.array([1.0, 1.0, 2.0]), np.array([5, 9, 1]), 3)
    assert list(order) == [2, 1, 0]


def test_parse_query_malformed_numeric_degrades():
    """'n_chars:abc' and 'n_chars:1.5' drop like other garbage tokens
    instead of raising ValueError."""
    from miru_ray.functions.filters import parse_query
    from miru_ray.state.schema import FieldDef, IndexSchema
    schema = IndexSchema((FieldDef("n_chars", "numeric"),))
    for q in ("scan n_chars:abc", "scan n_chars:1.5", "scan n_chars:..x"):
        node = parse_query(q, schema=schema)   # must not raise
        assert node is not None
