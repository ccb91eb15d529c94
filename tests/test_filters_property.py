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


# --- positional verify kernels (phrase / proximity) ---------------------

_PTOK = st.sampled_from(list("abcde"))
_PDOC = st.lists(_PTOK, min_size=0, max_size=12).map(" ".join)


@given(docs=st.lists(_PDOC, min_size=1, max_size=8),
       phrase=st.lists(_PTOK, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_phrase_occurrences_property(docs, phrase):
    """Kernel == per-doc brute-force subsequence count for random tiny
    corpora over a 5-token alphabet (dense repeats, empty docs, phrases
    longer than docs)."""
    import pyarrow as pa
    from miru_ray.pipelines.search import phrase_occurrences
    got = phrase_occurrences(pa.array(docs, pa.string()), phrase).tolist()
    for d, g in zip(docs, got):
        tok = d.split() if d else []
        L = len(phrase)
        exp = sum(1 for i in range(len(tok) - L + 1)
                  if tok[i:i + L] == phrase)
        assert g == exp, (d, phrase)


@given(docs=st.lists(_PDOC, min_size=1, max_size=8),
       a=_PTOK, b=_PTOK, slop=st.integers(min_value=0, max_value=6))
@settings(max_examples=200, deadline=None)
def test_near_pair_counts_property(docs, a, b, slop):
    """Kernel == per-doc brute-force ordered pair count, including the
    a == b self-pair case and windows clamped at doc ends."""
    import pyarrow as pa
    from miru_ray.pipelines.search import near_pair_counts
    got = near_pair_counts(pa.array(docs, pa.string()), a, b, slop).tolist()
    for d, g in zip(docs, got):
        tok = d.split() if d else []
        exp = sum(1 for i, x in enumerate(tok) if x == a
                  for j in range(i + 1, min(i + slop + 2, len(tok)))
                  if tok[j] == b)
        assert g == exp, (d, a, b, slop)
