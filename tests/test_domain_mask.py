"""Packed-bitmap domain masks (VERDICT r3 #3).

Pins: (a) mask semantics == the eager id-array domain forms exactly,
(b) search through masks stays rank-identical to the brute-force oracle,
(c) resident domain bytes for a 90%-coverage time range are bounded by
ceil(n/8) per partition — coverage-INDEPENDENT — where the eager form
held 8 B per matching doc.
"""

from __future__ import annotations

import numpy as np
import pytest

from miru_ray.functions.postings import intersect_sorted
from miru_ray.state.domain import DomainMask
from miru_ray.state.reader import IndexReader


@pytest.fixture(scope="module")
def reader(index_dir):
    return IndexReader(index_dir)


def _ts_bounds(reader):
    ts = []
    for p in reader.parts:
        ts.append(reader.doc_column(p, "warc_ts").to_numpy()
                  .astype("datetime64[us]").astype(np.int64))
    allts = np.concatenate(ts)
    return int(allts.min()), int(allts.max())


def test_mask_equals_eager_time_range(reader):
    lo, hi = _ts_bounds(reader)
    span = hi - lo
    for rng in [(lo, hi + 1), (lo + span // 20, lo + span * 19 // 20),
                (None, lo + span // 2), (lo + span // 2, None)]:
        eager = reader.time_range_domain(*rng)
        mask = DomainMask(reader, [reader.time_pred(*rng)])
        ids = reader.all_ids()
        np.testing.assert_array_equal(mask.filter_ids(ids), eager)
        np.testing.assert_array_equal(mask.to_ids(), eager)


def test_mask_equals_eager_lang_and_compose(reader):
    eager_lang = reader.lang_domain(["en", "de"])
    mask = DomainMask(reader, [reader.lang_pred(["en", "de"])])
    np.testing.assert_array_equal(mask.to_ids(), eager_lang)

    lo, hi = _ts_bounds(reader)
    rng = (lo + (hi - lo) // 10, lo + (hi - lo) * 9 // 10)
    eager_both = intersect_sorted(reader.time_range_domain(*rng), eager_lang)
    both = DomainMask(reader, [reader.time_pred(*rng),
                               reader.lang_pred(["en", "de"])])
    np.testing.assert_array_equal(both.to_ids(), eager_both)


def test_mask_filter_subset_of_sorted_ids(reader):
    lo, hi = _ts_bounds(reader)
    rng = (lo + (hi - lo) // 4, lo + (hi - lo) * 3 // 4)
    mask = DomainMask(reader, [reader.time_pred(*rng)])
    rs = np.random.RandomState(7)
    ids = np.unique(rs.randint(0, reader.n_docs, 200).astype(np.uint64))
    got = mask.filter_ids(ids)
    eager = reader.time_range_domain(*rng)
    np.testing.assert_array_equal(got, intersect_sorted(ids, eager))
    assert (np.diff(got.astype(np.int64)) > 0).all()   # stays sorted


def test_ids_pred_round_trip(reader):
    rs = np.random.RandomState(11)
    ids = np.unique(rs.randint(0, reader.n_docs, 300).astype(np.uint64))
    mask = DomainMask(reader, [reader.ids_pred(ids)])
    np.testing.assert_array_equal(mask.to_ids(), ids)


def test_search_rank_identity_through_masks(pages, reader, index_dir):
    from miru_ray.oracle import OracleIndex
    from miru_ray.pipelines.search import search
    oracle = OracleIndex(pages, num_parts=4)
    lo, hi = _ts_bounds(reader)
    rng = (lo + (hi - lo) // 10, lo + (hi - lo) * 9 // 10)
    for q, tr, langs in [
        ("needle7", None, ["en"]),
        ("table scan", rng, None),
        ("vector OR window", rng, ["en", "de"]),
        ("merge -join", (None, lo + (hi - lo) // 2), None),
    ]:
        got = search(reader, q, k=10, time_range=tr, langs=langs)
        want_ids, want_scores = oracle.search(q, k=10, time_range=tr,
                                              langs=langs)
        np.testing.assert_array_equal(
            got["doc_id"].to_numpy(), want_ids)
        np.testing.assert_allclose(
            got["score"].to_numpy(), want_scores, rtol=0, atol=0)


def test_domain_resident_bytes_bounded_at_90pct_coverage(reader):
    """A 90%-coverage time range must NOT hold 8 B per matching doc:
    the packed mask is ceil(count/8) bytes per touched partition."""
    lo, hi = _ts_bounds(reader)
    rng = (lo + (hi - lo) // 20, None)    # ~95% of docs
    mask = DomainMask(reader, [reader.time_pred(*rng)])
    matched = mask.filter_ids(reader.all_ids())
    assert len(matched) > 0.85 * reader.n_docs
    cap = sum(-(-int(c) // 8) + 8 for c in reader.counts)   # bit-packed + pad
    assert mask.resident_bytes <= cap
    # and strictly below the eager representation's 8 B/matching-doc
    assert mask.resident_bytes < matched.nbytes / 8
