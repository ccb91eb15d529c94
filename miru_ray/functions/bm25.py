"""BM25 scoring math — ONE implementation shared by engine and oracle.

Replaces the reference's FullText TF-IDF scorer
(miru-stream-plugins/.../fulltext/FullText.java:99-220: per-term
``multiplier = termCount/globalCardinality`` times per-doc tf) with
Okapi BM25 per the north rule, keeping the reference's result contract:
float scores, top-k by (score desc, docID desc) — the exact comparator of
FullText.RawBitScore.compareTo (higher score first, then higher id first).

Determinism rules (SURVEY.md §7.5 "Rank-identical scores"): float64
everywhere; per-doc score accumulated over query terms in SORTED term
order; ties broken on docID. The same accumulation order is used by the
distributed scorer, the brute-force oracle, and the SQL oracle (whose SUM
is made order-safe by rounding — see pipelines/fulltext.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["idf", "bm25_term_scores", "topk_order", "K1", "B"]

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: np.ndarray | int) -> np.ndarray | float:
    """Robertson–Sparck-Jones idf with the +1 floor (Lucene-style, always
    positive): ln(1 + (N − df + 0.5)/(df + 0.5))."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_term_scores(tf: np.ndarray, doclen: np.ndarray, df: int,
                     n_docs: int, avgdl: float,
                     k1: float = K1, b: float = B) -> np.ndarray:
    """Per-doc BM25 contribution of one term (vectorized, float64)."""
    tf = tf.astype(np.float64)
    dl = doclen.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / np.float64(avgdl))
    return float(idf(n_docs, df)) * tf * (k1 + 1.0) / denom


def topk_order(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k docs by (score desc, docID desc) — the
    reference comparator (FullText.java RawBitScore: higher id wins ties,
    matching 'latest first' prime ordering, README.md:6).

    O(n) selection instead of a full lexsort: every doc ranked <= k has
    score >= the kth-largest score, so selecting that boundary WITH ties
    and exact-sorting only the selected subset returns identical indices
    (rank-identity-pinned) at a fraction of the hot-term scan cost."""
    n = len(scores)
    if k >= n:
        order = np.lexsort((-doc_ids.astype(np.int64), -scores))
        return order[:k]
    kth = np.partition(scores, n - k)[n - k]      # kth-largest score value
    sel = np.flatnonzero(scores >= kth)
    order = np.lexsort((-doc_ids[sel].astype(np.int64), -scores[sel]))
    return sel[order[:k]]
