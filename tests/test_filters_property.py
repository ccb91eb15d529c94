"""Hypothesis property tests: random filter trees evaluate identically on
the engine and the brute-force oracle; random query strings never crash
and always match the oracle."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_ray.functions.filters import (And, Or, PButNotQ, Prefix, Term,
                                        evaluate, parse_query)

_VOCAB = ([f"w{i:05d}" for i in (0, 1, 2, 3, 50, 333, 3000)]
          + ["needle7", "needle13", "zzz_missing"])

_leaf = st.one_of(
    st.sampled_from(_VOCAB).map(Term),
    st.sampled_from(["w0000", "w001", "needle", "zz"]).map(Prefix),
)


def _tree(depth: int):
    if depth == 0:
        return _leaf
    child = _tree(depth - 1)
    kids = st.lists(child, min_size=1, max_size=3).map(tuple)
    return st.one_of(_leaf, kids.map(And), kids.map(Or), kids.map(PButNotQ))


@settings(max_examples=60, deadline=None)
@given(tree=_tree(3))
def test_random_trees_match_oracle(reader, oracle, tree):
    a = evaluate(tree, reader)
    b = evaluate(tree, oracle)
    assert np.array_equal(a, b), tree


@settings(max_examples=40, deadline=None)
@given(q=st.lists(st.sampled_from(
    _VOCAB + ["OR", "-w00001", "w001*", "-needle7", "", "  ", "W00002"]),
    max_size=6).map(" ".join))
def test_random_query_strings_match_oracle(reader, oracle, q):
    from miru_ray.pipelines.search import search
    hits = search(reader, q, k=10)
    oid, osc = oracle.search(q, k=10)
    assert hits["doc_id"].to_pylist() == oid.tolist(), q
    assert np.array_equal(hits["score"].to_numpy(), osc), q
