"""Corpus-assembly invariants (pipelines/pack.py): mixture sampling and
concat-and-split sequence packing."""

from __future__ import annotations

import os

import numpy as np
import pytest

from miru_ray.pipelines import pack

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata not present")


def test_pack_offsets_are_the_exclusive_prefix_sum(ray_session):
    got = pack.pack_sequences(SF).to_pandas().sort_values("doc_id")
    n = got["n_tokens"].to_numpy(dtype=np.int64)
    cum = np.r_[np.int64(0), n[:-1].cumsum()]
    L = pack.PACK_SEQ_LEN
    assert (got["seq_id"].to_numpy() == cum // L).all()
    assert (got["seq_off"].to_numpy() == cum % L).all()
    # sequences fill contiguously: every sequence index up to the last
    # one hosts at least one document start or carry-through
    assert got["seq_id"].is_monotonic_increasing


def test_pack_is_range_partitioning_invariant(ray_session, monkeypatch):
    """The (seq_id, seq_off) assignment is a pure function of the corpus,
    not of how the doc_id domain was cut into prefix-sum ranges."""
    base = pack.pack_sequences(SF).to_pandas()
    monkeypatch.setattr(pack, "_PACK_RANGES", 7)
    alt = pack.pack_sequences(SF).to_pandas()
    assert base.equals(alt)


def test_mixture_rate_clamps_and_unweighted_sources_drop(ray_session):
    # one source hogs the weight: its rate clamps at 1.0 (keeps ALL its
    # docs); sources missing from the weight table are dropped entirely
    weights = {"src0": 1000.0, "src1": 1.0}
    got = pack.mixture_sample(SF, weights=weights).to_pandas()
    kept_by = got.groupby("source").size().to_dict()
    import pyarrow.parquet as pq
    src_counts = (pq.read_table(f"{SF}/documents.parquet",
                                columns=["source"]).to_pandas()
                  .value_counts("source").to_dict())
    assert kept_by["src0"] == src_counts["src0"]
    assert set(kept_by) <= {"src0", "src1"}


def test_mixture_is_content_keyed_and_near_budget(ray_session):
    """The kept set is a deterministic function of (text, source) — two
    runs agree exactly — and the realized total tracks the budget."""
    a = pack.mixture_sample(SF).to_pandas()
    b = pack.mixture_sample(SF).to_pandas()
    assert a.equals(b)
    import pyarrow.parquet as pq
    total = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    frac = len(a) / total
    assert abs(frac - pack.MIXTURE_BUDGET_FRAC) < 0.1
