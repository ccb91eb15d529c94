"""Salted two-stage aggregation: equals the direct aggregate under Zipf
skew, with bounded per-group row counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_salted_counts_match_direct(ray_session, pages):
    from miru_ray.functions.tokenize import tokenize
    from miru_ray.stages.salted import salted_term_counts, sample_hot_terms

    small = pages.select(["text"]).slice(0, 400)
    ds = rd.from_arrow(small)
    hot = sample_hot_terms(ds, "text", sample_frac=0.2, top_n=16)
    assert "w00000" in hot  # the Zipf head must be detected

    got = salted_term_counts(ds, "text", hot_terms=hot, r_salt=8).to_pandas()
    got = got.set_index("term")["n"].to_dict()

    # brute-force oracle
    from collections import Counter
    exact = Counter()
    for t in small["text"].to_pylist():
        exact.update(tokenize(t))
    assert got == dict(exact)
