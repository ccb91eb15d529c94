"""Text-analysis operators over ``documents`` — the training-data-pipeline
family (language-ID, quality scoring, token counting, fingerprinting).

All per-doc computation is a stateless/stateful ``map_batches`` with the
shared deterministic tokenizer; md5 fingerprints match SQL ``md5(text)``
exactly so the DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from miru_ray.functions.tokenize import tokenize_column
from miru_ray.sources.tables import read_table

__all__ = ["token_counts", "quality_scores", "doc_fingerprints", "lang_id",
           "sample_hash", "md5_fingerprint_batch", "doc_fingerprint_table",
           "token_counts_ds", "quality_scores_ds", "lang_id_ds",
           "doc_fingerprints_ds", "repetition_scores", "repetition_scores_ds",
           "top_ngrams", "dup_span_frac", "dup_span_frac_ds",
           "decontaminate", "decontaminate_ds", "pii_scrub", "pii_scrub_ds",
           "source_cap", "source_cap_ds",
           "boilerplate_scrub", "boilerplate_scrub_ds",
           "lm_perplexity", "lm_perplexity_ds", "lm_score_texts",
           "exact_global_ntile", "perplexity_ntile", "perplexity_ntile_ds",
           "exact_substring_scrub", "exact_substring_scrub_ds",
           "corpus_split", "corpus_split_ds",
           "dsir_weights", "dsir_weights_ds", "dsir_sample",
           "dsir_sample_ds", "dsir_score_texts"]

# Streaming contract (VERDICT r3 #2): each per-doc operator has a ``*_ds``
# form returning the LAZY Dataset (one row per doc — the scale API, write
# or iterate it); the table forms are thin driver-side collectors for the
# driver contract at test scales.

# Small English stopword list for QUALITY SCORING (fixed; mirrored
# verbatim in the quality_scores SQL oracle). DELIBERATELY distinct from
# functions/tokenize.py STOPWORDS["en"] (the per-language ANALYZER set,
# which also carries "an"/"be" and has its own oracle mirror): the two
# contracts version independently — updating one must not silently move
# the other's oracle. Keep any edit here in lockstep with the
# quality_scores SQL only.
STOPWORDS = ("a", "and", "are", "as", "at", "by", "for", "from", "in", "is",
             "it", "of", "on", "or", "that", "the", "to", "with")


def md5_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """THE md5 fingerprint kernel — (doc_id, fingerprint=md5(text) hex),
    shared by doc_fingerprints, sample_hash and dedup.dedup_exact
    (VERDICT r2 #7: one kernel, three entries). Per-row hashlib is
    unavoidable (md5 has no vectorized kernel); everything else is."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(fps, pa.string())})


_FP_CACHE: dict[str, tuple[tuple, pa.Table]] = {}   # path -> (stat, table)


def doc_fingerprint_table(sf_dir: str) -> pa.Table:
    """(doc_id, fingerprint) for the whole corpus, computed ONCE per
    source file (keyed on path+size+mtime) and shared by the driver-side
    fingerprint entries — a bench sweep runs the scan once, not three
    times. 32 hex chars + int64 per doc: ~40 B/doc driver-side, the same
    result-materialization contract those entries already had."""
    import os
    from miru_ray.state.layout import stat_validated_memo
    src = os.path.join(sf_dir, "documents.parquet")

    def build() -> pa.Table:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        out = ds.map_batches(md5_fingerprint_batch, batch_format="pyarrow")
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)

    return stat_validated_memo(_FP_CACHE, os.path.abspath(src), src, build)


def token_counts_ds(sf_dir: str):
    """Lazy Dataset of (doc_id, n_tokens) via the index tokenizer."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"].combine_chunks())
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def token_counts(sf_dir: str) -> pa.Table:
    """Driver-side collected form of :func:`token_counts_ds`."""
    out = token_counts_ds(sf_dir)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def quality_scores_ds(sf_dir: str):
    """Lazy Dataset of (doc_id, n_tokens, n_chars, stop_ratio,
    mean_token_len) — quality heuristics (length / stopword-density),
    rounded to 6 dp."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    stop = set(STOPWORDS)

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks()
        toks = tokenize_column(texts)
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        n = np.diff(offsets).astype(np.int64)
        flat = toks.flatten()
        flat_np = flat.to_numpy(zero_copy_only=False)
        is_stop = np.isin(flat_np, sorted(stop))
        tok_len = pa.compute.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
        stops = np.add.reduceat(is_stop.astype(np.int64), offsets[:-1]) \
            if len(flat_np) else np.zeros(len(n), dtype=np.int64)
        sum_len = np.add.reduceat(tok_len, offsets[:-1]) if len(flat_np) else np.zeros(len(n))
        # reduceat quirk: empty slices copy the next element — zero them
        stops = np.where(n > 0, stops, 0)
        sum_len = np.where(n > 0, sum_len, 0.0)
        nn = np.maximum(n, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n, pa.int64()),
            "n_chars": pa.array(pa.compute.utf8_length(texts).to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64()),
            "stop_ratio": pa.array(np.round(stops / nn, 6), pa.float64()),
            "mean_token_len": pa.array(np.round(sum_len / nn, 6), pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> pa.Table:
    """Driver-side collected form of :func:`quality_scores_ds`."""
    out = quality_scores_ds(sf_dir)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def doc_fingerprints_ds(sf_dir: str):
    """Lazy Dataset of (doc_id, fingerprint = md5(text) hex)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(md5_fingerprint_batch, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str) -> pa.Table:
    """(doc_id, fingerprint) with fingerprint = md5(text) hex — matches SQL
    md5() exactly (document-fingerprinting primitive for exact dedup).
    Driver-side memoized table (shared across the fingerprint entries);
    the streaming form is :func:`doc_fingerprints_ds`."""
    return doc_fingerprint_table(sf_dir)


# character classes whose frequency ratios separate the fixture languages;
# a deliberately simple, deterministic n-gram-free heuristic (the real
# engine would hold a fastText-style model in an actor pool).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "est", "une"),
    "es": ("el", "los", "es", "una", "que"),
    "en": ("the", "is", "and", "of", "a"),
}


class LangId:
    """Actor-pool language-ID stage: marker tables built once per actor
    (the real engine would hold a fastText-style model here — same actor
    shape). Semantics: over the first 200 tokens, score(lang) = #DISTINCT
    marker words present; prediction = alphabetically-first lang with the
    max score, or 'unknown' at score 0. Vectorized: one numpy membership
    pass per marker word over the batch's flattened tokens."""

    def __init__(self) -> None:
        self.langs = sorted(_LANG_MARKERS)
        self.markers = {lang: np.array(sorted(_LANG_MARKERS[lang]),
                                       dtype=object)
                        for lang in self.langs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from miru_ray.functions.tokenize import tokenize_column
        if batch.num_rows == 0:
            return pa.table({"doc_id": batch["doc_id"],
                             "lang_pred": pa.array([], pa.string())})
        tok_lists = tokenize_column(batch["text"])
        offsets = tok_lists.offsets.to_numpy(zero_copy_only=False)
        doclens = np.diff(offsets).astype(np.int64)
        ndocs = len(doclens)
        flat = tok_lists.flatten().to_numpy(zero_copy_only=False)
        # first-200-tokens window per doc
        starts = np.concatenate([[0], np.cumsum(doclens)[:-1]])
        pos = np.arange(len(flat)) - np.repeat(starts, doclens)
        window = pos < 200
        flat_w = flat[window]
        doc_of = np.repeat(np.arange(ndocs), doclens)[window]
        wstarts = np.searchsorted(doc_of, np.arange(ndocs))
        # reduceat needs in-bounds indices; docs with no windowed tokens get
        # a clamped start and are masked out below
        wstarts_c = np.minimum(wstarts, max(len(doc_of) - 1, 0))
        nonempty = np.diff(np.concatenate([wstarts, [len(doc_of)]])) > 0
        scores = np.zeros((ndocs, len(self.langs)), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            for w in self.markers[lang]:
                hit = (flat_w == w)
                if hit.any():
                    # distinct-word presence per doc (not occurrence count)
                    present = (np.add.reduceat(hit, wstarts_c) > 0) & nonempty
                    scores[:, li] += present
        best_idx = np.argmax(scores, axis=1)   # first max = alphabetical tie-break
        preds = np.array(self.langs, dtype=object)[best_idx]
        preds[scores.max(axis=1) == 0] = "unknown"
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(preds, pa.string())})


def lang_id_ds(sf_dir: str):
    """Lazy Dataset of (doc_id, lang_pred) — heuristic language ID via
    actor pool (marker tables built once per actor)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", batch_size=1024,
                          concurrency=(1, 2))


def lang_id(sf_dir: str) -> pa.Table:
    """Driver-side collected form of :func:`lang_id_ds`."""
    out = lang_id_ds(sf_dir)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def repetition_scores_ds(sf_dir: str):
    """Lazy Dataset of (doc_id, top_token_frac, dup_bigram_frac) — the
    Gopher-family repetition quality rules (Rae et al. 2021 §A1.1:
    most-common-word fraction and duplicate-n-gram fraction are the two
    headline within-document repetition filters for web text):

      top_token_frac  = occurrences of the doc's most frequent token
                        / total tokens (0.0 for empty docs);
      dup_bigram_frac = (total bigrams − distinct bigrams) / total
                        bigrams (0.0 when the doc has < 2 tokens).

    Fully vectorized per batch: one tokenize + hash pass, run-length
    counting over a (doc, token-hash) lexsort — no per-row Python.
    Token identity is the 64-bit hash (equal to string identity modulo
    2^-64 collisions, the same accepted caveat as the Jaccard tiers).
    Rounded 6 dp to match the SQL oracle.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        from miru_ray.functions.hashing import hash_strings
        toks = tokenize_column(batch["text"].combine_chunks())
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        n = np.diff(offsets).astype(np.int64)
        ndocs = len(n)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        th = (hash_strings(flat) if len(flat)
              else np.empty(0, dtype=np.uint64))
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), n)

        # most-frequent-token count per doc: run lengths over a
        # (doc, hash) lexsort, then a scatter-max per doc
        topc = np.zeros(ndocs, dtype=np.int64)
        if len(th):
            order = np.lexsort((th, doc_of))
            d_s, h_s = doc_of[order], th[order]
            starts = np.flatnonzero(np.concatenate(
                [[True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])]))
            runlen = np.diff(np.concatenate([starts, [len(h_s)]]))
            np.maximum.at(topc, d_s[starts], runlen)

        # bigram totals / distincts: adjacent-token pairs within a doc
        ndist = np.zeros(ndocs, dtype=np.int64)
        nbg = np.maximum(n - 1, 0)
        if len(th) >= 2:
            same = doc_of[:-1] == doc_of[1:]
            bh = (th[:-1] * np.uint64(1099511628211)) + th[1:]
            bd, bh = doc_of[:-1][same], bh[same]
            if len(bh):
                order = np.lexsort((bh, bd))
                bd_s, bh_s = bd[order], bh[order]
                first = np.concatenate(
                    [[True], (bd_s[1:] != bd_s[:-1]) | (bh_s[1:] != bh_s[:-1])])
                np.add.at(ndist, bd_s[first], 1)

        denom_t = np.maximum(n, 1).astype(np.float64)
        denom_b = np.maximum(nbg, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "top_token_frac": pa.array(
                np.round(topc / denom_t, 6), pa.float64()),
            "dup_bigram_frac": pa.array(
                np.round((nbg - ndist) / denom_b, 6), pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def repetition_scores(sf_dir: str) -> pa.Table:
    """Driver-side collected form of :func:`repetition_scores_ds`."""
    out = repetition_scores_ds(sf_dir)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def top_ngrams(sf_dir: str, k: int = 20) -> pa.Table:
    """(ngram, cnt) — the corpus's ``k`` most frequent word BIGRAMS,
    ties broken by ngram ascending. The classic corpus-analysis /
    boilerplate-detection sweep (hot n-grams surface templated text).

    Distributed shape: per-batch PARTIAL counts (combiner) → ONE
    exchange on ``hash(ngram) % 64`` → each bucket sums its ngrams and
    keeps only its local top-``k`` (an ngram lives in exactly one
    bucket, so the global top-k is contained in the union of bucket
    top-ks) → the driver merges 64·k candidate rows. Driver-side state
    is O(buckets·k), never O(vocabulary).
    """
    ds = read_table(sf_dir, "documents", columns=["text"])
    buckets = 64

    def partial(batch: pa.Table) -> pa.Table:
        from miru_ray.functions.hashing import hash_strings
        toks = tokenize_column(batch["text"].combine_chunks())
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({"_bkt": pa.array([], pa.int64()),
                             "ngram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n)
        same = doc_of[:-1] == doc_of[1:]
        fu = flat.astype(str)          # U-dtype for vectorized concat
        bg = np.char.add(np.char.add(fu[:-1], " "), fu[1:])[same]
        uniq, cnt = np.unique(bg, return_counts=True)
        uo = uniq.astype(object)
        bkt = (hash_strings(uo) % np.uint64(buckets)).astype(np.int64)
        return pa.table({"_bkt": pa.array(bkt, pa.int64()),
                         "ngram": pa.array(uo, pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("ngram", sort=False)["cnt"].sum().reset_index()
              .sort_values(["cnt", "ngram"], ascending=[False, True])
              .head(k))
        return s[["ngram", "cnt"]]

    cand = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_bkt").map_groups(roll, batch_format="pandas")
              .to_pandas())
    cand = (cand.sort_values(["cnt", "ngram"], ascending=[False, True])
                .head(k).reset_index(drop=True))
    return pa.table({"ngram": pa.array(cand["ngram"], pa.string()),
                     "cnt": pa.array(cand["cnt"].to_numpy(), pa.int64())})


_SPAN_POLY = np.uint64(0x9E3779B185EBCA87)   # same fold the shingle tiers use
_SPAN_BUCKETS = 64


def dup_span_frac_ds(sf_dir: str, span: int = 5):
    """Lazy Dataset of (doc_id, dup_span_frac) — the fraction of each
    doc's ``span``-token window positions whose window ALSO occurs in at
    least one other document. This is the per-doc signal behind
    substring-level corpus dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": duplicated long spans,
    not just duplicated documents, are what inflate memorization) —
    rank high-frac docs for span excision or dropping.

    Distributed shape (2 bounded exchanges + 1 keyed merge, no
    driver-side state beyond the final per-doc rows):
      1. per-batch (span-hash, doc, occurrences) rows bucket on the
         span hash → a hash lives in ONE bucket, so each bucket sees
         every doc holding it and flags cross-doc spans exactly;
      2. per-doc duplicated-occurrence partials roll up through the
         standard bucketed sum;
      3. totals (window positions per doc) attach through one
         union-side-tag keyed exchange.
    Span identity is the 64-bit polynomial fold of the token hashes —
    equal to string spans modulo 2^-64 collisions (the Jaccard-tier
    caveat). Rounded 6 dp to match the SQL oracle.
    """
    from miru_ray.functions.hashing import hash_strings
    from miru_ray.functions.rollup import bucketed_sum_rollup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def span_rows(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"].combine_chunks())
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        th = (hash_strings(flat) if len(flat)
              else np.empty(0, dtype=np.uint64))
        doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n)
        total = len(th)
        empty = pa.table({"spart": pa.array([], pa.int64()),
                          "sh": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if total < span:
            return empty
        s = th[: total - span + 1].copy()
        for j in range(1, span):
            s = s * _SPAN_POLY + th[j: total - span + 1 + j]
        valid = doc_of[: total - span + 1] == doc_of[span - 1:]
        d, s = doc_of[: total - span + 1][valid], s[valid]
        if not len(s):
            return empty
        # per-(doc, hash) OCCURRENCE counts (not distinct — the frac is
        # over window positions): run lengths on a (doc, hash) lexsort
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], (d[1:] != d[:-1]) | (s[1:] != s[:-1])]))
        cnt = np.diff(np.concatenate([starts, [len(s)]]))
        d, s = d[starts], s[starts]
        doc_ids = batch["doc_id"].to_numpy()[d]
        return pa.table({
            "spart": pa.array((s % np.uint64(_SPAN_BUCKETS)).astype(np.int64),
                              pa.int64()),
            "sh": pa.array(s, pa.uint64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    def dup_partial(g: pd.DataFrame) -> pd.DataFrame:
        """Rows of one span-hash bucket → per-doc duplicated-occurrence
        partial sums (a span is duplicated iff ≥2 docs hold it — rows
        here are per (doc, hash), so run length = doc count)."""
        s = g["sh"].to_numpy(dtype=np.uint64)
        d = g["doc_id"].to_numpy(dtype=np.int64)
        c = g["cnt"].to_numpy(dtype=np.int64)
        order = np.argsort(s, kind="stable")
        s, d, c = s[order], d[order], c[order]
        starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        runlen = np.diff(np.concatenate([starts, [len(s)]]))
        dup = np.repeat(runlen >= 2, runlen)
        if not dup.any():
            return pd.DataFrame({"doc_id": np.empty(0, dtype=np.int64),
                                 "dup": np.empty(0, dtype=np.int64)})
        out = (pd.DataFrame({"doc_id": d[dup], "dup": c[dup]})
               .groupby("doc_id", sort=False)["dup"].sum().reset_index())
        return out[["doc_id", "dup"]]

    dup = bucketed_sum_rollup(
        ds.map_batches(span_rows, batch_format="pyarrow", batch_size=1024)
          .groupby("spart").map_groups(dup_partial, batch_format="pandas"),
        keys=["doc_id"], val_cols=["dup"])

    def tot_rows(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"].combine_chunks())
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "tot": pa.array(np.maximum(n - span + 1, 0),
                                         pa.int64())})

    tot = ds.map_batches(tot_rows, batch_format="pyarrow")

    # one keyed exchange: totals (side 0) + dup sums (side 1) bucket on
    # doc_id; each bucket left-merges and emits the final fraction
    def tag(side: int, col: str):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "val": t[col].cast(pa.int64()),
                "side": pa.array(np.full(len(ids), side, dtype=np.int8)),
                "_bkt": pa.array(ids % _SPAN_BUCKETS, pa.int64())})
        return f

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["side"] == 0][["doc_id", "val"]].rename(columns={"val": "tot"})
        d = g[g["side"] == 1][["doc_id", "val"]].rename(columns={"val": "dup"})
        m = t.merge(d, on="doc_id", how="left").fillna({"dup": 0})
        frac = np.where(m["tot"].to_numpy() > 0,
                        m["dup"].to_numpy(dtype=np.float64)
                        / np.maximum(m["tot"].to_numpy(), 1), 0.0)
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(),
                             "dup_span_frac": np.round(frac, 6)})

    tagged = (tot.map_batches(tag(0, "tot"), batch_format="pyarrow")
              .union(dup.map_batches(tag(1, "dup"), batch_format="pyarrow")))
    return tagged.groupby("_bkt").map_groups(merge, batch_format="pandas")


def dup_span_frac(sf_dir: str, span: int = 5) -> pa.Table:
    """Driver-side collected form of :func:`dup_span_frac_ds`, sorted by
    doc_id."""
    got = dup_span_frac_ds(sf_dir, span).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(got["doc_id"].to_numpy(), pa.int64()),
                     "dup_span_frac": pa.array(
                         got["dup_span_frac"].to_numpy(), pa.float64())})


def sample_hash(sf_dir: str, hex_cut: str = "1a") -> pa.Table:
    """(doc_id, fingerprint) for the deterministic ~10% hash sample:
    keep docs whose md5(text) starts below ``hex_cut`` ('1a' = 26/256).
    Hash sampling is the reproducible form of corpus downsampling (the
    training-data analog of ds.random_sample, which is engine-seeded and
    therefore has no cross-engine oracle); content-keyed, so the same
    rows survive regardless of partitioning, ordering or engine."""
    import pyarrow.compute as pc
    t = doc_fingerprint_table(sf_dir)
    keep = pc.less(pc.utf8_slice_codeunits(t["fingerprint"], 0, 2), hex_cut)
    return t.filter(keep)


# ------------------------------------------------- benchmark decontamination

_DECON_SPAN = 5
_DECON_BENCH_MOD = 25


def _span_hashes(batch: pa.Table, span: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc index per window position, span hash) for a batch — the same
    polynomial token-window fold the dup-span signal uses, NOT
    per-doc-distinct (decontamination counts window POSITIONS)."""
    from miru_ray.functions.hashing import hash_strings
    toks = tokenize_column(batch["text"].combine_chunks())
    n = np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    th = hash_strings(flat) if len(flat) else np.empty(0, dtype=np.uint64)
    doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n)
    total = len(th)
    if total < span:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    s = th[: total - span + 1].copy()
    for j in range(1, span):
        s = s * _SPAN_POLY + th[j: total - span + 1 + j]
    valid = doc_of[: total - span + 1] == doc_of[span - 1:]
    return doc_of[: total - span + 1][valid], s[valid]


def decontaminate_ds(sf_dir: str, span: int = _DECON_SPAN,
                     bench_mod: int = _DECON_BENCH_MOD):
    """Lazy Dataset of (doc_id, n_contaminated) — BENCHMARK
    DECONTAMINATION, the standard training-corpus hygiene step (the
    GPT-3/Llama recipe: drop or flag training documents sharing long
    token n-grams with evaluation sets): one row per NON-benchmark doc
    that contains at least one ``span``-token window also present in
    any benchmark doc; n_contaminated = the count of such window
    positions. The benchmark here is the deterministic held-out slice
    ``doc_id % bench_mod == 0`` (the fixtures carry no separate eval
    table); swapping in a real eval table only changes the bench scan.

    Scale shape — the textbook broadcast semi-join: eval sets are tiny
    BY DEFINITION, so the distinct benchmark span-hash set is collected
    once (bounded by the benchmark, not the corpus), ``ray.put``
    broadcast, and the corpus scan probes it per batch with one
    searchsorted — no shuffle at all; the corpus side streams. Span
    identity is the 64-bit polynomial fold (string-window equality
    modulo 2^-64 collisions — the dup-span caveat, shared oracle
    machinery)."""
    import ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_spans(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ids % bench_mod == 0
        sub = batch.filter(pa.array(keep))
        _d, s = _span_hashes(sub, span)
        return pa.table({"sh": pa.array(np.unique(s), pa.uint64())})

    parts = [b["sh"].to_numpy() for b in
             ds.map_batches(bench_spans, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")]
    bench = np.unique(np.concatenate(parts)) if parts else \
        np.empty(0, dtype=np.uint64)
    bench_ref = ray.put(bench)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        ids = batch["doc_id"].to_numpy()
        corpus = ids % bench_mod != 0
        sub = batch.filter(pa.array(corpus))
        if sub.num_rows == 0 or len(b) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_contaminated": pa.array([], pa.int64())})
        d, s = _span_hashes(sub, span)
        if not len(s):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_contaminated": pa.array([], pa.int64())})
        pos = np.searchsorted(b, s)
        np.minimum(pos, len(b) - 1, out=pos)
        hit = b[pos] == s
        if not hit.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_contaminated": pa.array([], pa.int64())})
        n = np.bincount(d[hit], minlength=sub.num_rows)
        nz = np.flatnonzero(n)
        return pa.table({
            "doc_id": pa.array(sub["doc_id"].to_numpy()[nz], pa.int64()),
            "n_contaminated": pa.array(n[nz].astype(np.int64), pa.int64())})

    return ds.map_batches(probe, batch_format="pyarrow")


def decontaminate(sf_dir: str, span: int = _DECON_SPAN,
                  bench_mod: int = _DECON_BENCH_MOD) -> pa.Table:
    """Driver-side collected form of :func:`decontaminate_ds`, sorted by
    doc_id (contaminated docs only — the result is bounded by the
    contamination, not the corpus)."""
    got = decontaminate_ds(sf_dir, span, bench_mod).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(got["doc_id"].to_numpy(), pa.int64()),
                     "n_contaminated": pa.array(
                         got["n_contaminated"].to_numpy(), pa.int64())})


# ------------------------------------------------------------- PII scrub

# (pattern, replacement) in APPLICATION ORDER — counts are taken on the
# progressively-redacted text, so order is part of the contract. All
# three are RE2-compatible: pyarrow.compute's regex kernels and DuckDB
# both run RE2, which is what makes the scrub exactly SQL-oracle-able.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>",
     "n_emails"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>", "n_ips"),
    (r"(\+\d{7,15}|\b\d{3}-\d{3}-\d{4}\b)", "<PHONE>", "n_phones"),
]


# The synthetic test corpora contain no organic PII (verified: zero
# matches at sf0.001/0.01), which would leave the driver's oracle
# compare exercising only the identity path. The fixture-inject spec
# appends ONE deterministic doc_id-derived email + IPv4 + phone to
# every doc_id % 3 != 0 row; the spec below is the single definition
# both the engine (numpy) and the generated DuckDB SQL render from, so
# the sf0.01 hash compare covers real replacement + counting.
# Pieces: ("lit", s) literal | ("mod", m) str(doc_id % m)
#       | ("lpad", (m, w, off)) zero-padded str(off + doc_id % m) to w.
PII_FIXTURE_PIECES: list[tuple] = [
    ("lit", " reach u"), ("mod", 97), ("lit", "@mail"), ("mod", 7),
    ("lit", ".net via 10."), ("mod", 256), ("lit", ".3."), ("mod", 200),
    ("lit", " tel 555-"), ("lpad", (900, 3, 100)), ("lit", "-"),
    ("lpad", (10000, 4, 0)),
]
PII_FIXTURE_SKIP_MOD = 3   # doc_id % this == 0 rows stay un-injected


def _fixture_pii_suffix_np(ids):
    """Vectorized suffix strings for PII_FIXTURE_PIECES (numpy)."""
    parts = []
    for kind, arg in PII_FIXTURE_PIECES:
        if kind == "lit":
            parts.append(np.full(len(ids), arg))
        elif kind == "mod":
            parts.append((ids % arg).astype("U"))
        else:
            m, w, off = arg
            parts.append(np.char.zfill((off + ids % m).astype("U"), w))
    out = parts[0]
    for p in parts[1:]:
        out = np.char.add(out, p)
    return np.where(ids % PII_FIXTURE_SKIP_MOD == 0, "", out)


def fixture_pii_suffix_sql() -> str:
    """The same suffix as a DuckDB expression over ``doc_id``."""
    parts = []
    for kind, arg in PII_FIXTURE_PIECES:
        if kind == "lit":
            parts.append("'" + arg + "'")
        elif kind == "mod":
            parts.append(f"CAST(doc_id % {arg} AS VARCHAR)")
        else:
            m, w, off = arg
            parts.append(
                f"lpad(CAST({off} + doc_id % {m} AS VARCHAR), {w}, '0')")
    joined = " || ".join(parts)
    return (f"CASE WHEN doc_id % {PII_FIXTURE_SKIP_MOD} = 0 THEN '' "
            f"ELSE {joined} END")


def pii_scrub_ds(sf_dir: str, fixture_inject: bool = False):
    """Lazy Dataset of (doc_id, text_clean, n_emails, n_ips, n_phones)
    — training-corpus PII redaction: emails, IPv4 literals and phone
    numbers are replaced with typed placeholder tokens and counted per
    document. Entirely vectorized RE2 kernels
    (``pyarrow.compute.count_substring_regex`` /
    ``replace_substring_regex``) — no per-row Python; one streaming
    pass, no shuffle, so at 100 TB this is a pure map stage bounded by
    read bandwidth.

    ``fixture_inject`` appends the deterministic PII_FIXTURE_PIECES
    suffix before scrubbing (test-corpus adapter only — see the spec
    comment above; the DuckDB oracle renders the identical suffix).

    Reference: beyond enterstudio/miru's operator set (its nearest text
    transform is the analyzer chain in miru-plugin fulltext); standard
    web-corpus curation (C4/Gopher-style cleanup).
    """
    import pyarrow.compute as pc
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        if fixture_inject:
            suf = _fixture_pii_suffix_np(batch["doc_id"].to_numpy())
            text = pc.binary_join_element_wise(
                text, pa.array(suf, pa.string()), "")
        cols: dict = {"doc_id": batch["doc_id"]}
        counts = {}
        for pat, repl, name in PII_PATTERNS:
            counts[name] = pc.cast(
                pc.count_substring_regex(text, pattern=pat), pa.int64())
            text = pc.replace_substring_regex(text, pattern=pat,
                                              replacement=repl)
        cols["text_clean"] = text
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def pii_scrub(sf_dir: str, fixture_inject: bool = False) -> pa.Table:
    """Driver-side collected form of :func:`pii_scrub_ds`."""
    out = pii_scrub_ds(sf_dir, fixture_inject=fixture_inject)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


# --------------------------------------------------------- per-source cap

def source_cap_ds(sf_dir: str, cap: int = 10, nparts: int = 32,
                  combiner_batch_size: int | None = None):
    """Lazy Dataset of (doc_id, source) — C4-style per-source document
    cap: keep at most ``cap`` docs per source, chosen by the
    deterministic priority "lowest doc_id first".

    Scale shape: a per-batch COMBINER first keeps each batch's ``cap``
    lowest doc_ids per source (valid because any globally-kept id is
    necessarily among its own batch's ``cap`` lowest — fewer than
    ``cap`` ids precede it anywhere), so a hot source ships at most
    cap × n_batches rows into the single keyed exchange instead of its
    full corpus share; the bucketed finalize then takes the true global
    ``cap`` lowest per source. One shuffle, vectorized ranks (lexsort +
    run boundaries), no driver-side state.

    Reference: beyond enterstudio/miru (its per-tenant partition cap in
    MiruPartitioner is a write-path size bound, not a curation rule);
    C4's per-domain heuristics are the public model.
    """
    from miru_ray.functions.hashing import hash_strings
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def head_per_source(ids: np.ndarray, src: np.ndarray):
        """Indices of the ``cap`` lowest ids per source value."""
        order = np.lexsort((ids, src))
        s = src[order]
        new = np.r_[True, s[1:] != s[:-1]] if len(s) else np.array([], bool)
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        rank = np.arange(len(s)) - starts[grp] if len(s) else grp
        return order[rank < cap]

    def combiner(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        keep = head_per_source(ids, src)
        kept_src = src[keep]
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "source": pa.array(kept_src, pa.string()),
            "_bkt": pa.array(
                (hash_strings(kept_src) % np.uint64(nparts)).astype(np.int64)),
        })

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        src = g["source"].to_numpy()
        keep = head_per_source(ids, src)
        return pd.DataFrame({"doc_id": ids[keep], "source": src[keep]})

    return (ds.map_batches(combiner, batch_format="pyarrow",
                           batch_size=combiner_batch_size)
            .groupby("_bkt").map_groups(finalize, batch_format="pandas"))


def source_cap(sf_dir: str, cap: int = 10) -> pa.Table:
    """Driver-side collected form of :func:`source_cap_ds`."""
    df = (source_cap_ds(sf_dir, cap=cap).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


# ------------------------------------------------ boilerplate chunk scrub

_BP_CHUNK_WORDS = 3
_BP_MIN_DF = 3


def boilerplate_scrub_ds(sf_dir: str, chunk_words: int = _BP_CHUNK_WORDS,
                         min_df: int = _BP_MIN_DF):
    """Lazy Dataset of (doc_id, text_clean, n_chunks, n_removed) —
    CCNet/RefinedWeb-style boilerplate removal: cut each document into
    NON-overlapping ``chunk_words``-word chunks (whitespace split; the
    trailing partial chunk is always kept), drop every chunk whose
    exact string occurs in ≥ ``min_df`` distinct documents, and rejoin
    the survivors. The removal unit is the chunk, not the doc — this is
    the transform behind the ``dup_span_frac`` signal.

    Distributed shape (2 keyed exchanges; chunk TEXT never shuffles):
      1. per-doc chunk HASHES (24 B/chunk rows) bucket on the hash —
         a chunk lives in one bucket, so each bucket computes exact
         distinct-doc df AND emits that bucket's removal coordinates
         (doc_id, ci) in the same map_groups, with no global
         boilerplate set ever assembled anywhere;
      2. removal coordinates (16 B/row, bounded by the duplicated
         chunks only) meet the doc text in a union-side-tag exchange
         bucketed on doc_id; each bucket rebuilds its docs locally.
    Driver state: none. Chunk identity is the 64-bit string hash —
    exact modulo the 2^-64 collision caveat shared with the Jaccard
    and span tiers (the SQL oracle compares true strings).
    """
    from miru_ray.functions.hashing import hash_strings

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    w_, k_ = chunk_words, min_df

    def chunk_rows(batch: pa.Table) -> pa.Table:
        hs, dids, cis = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            words = text.split(" ")
            nfull = len(words) // w_
            if not nfull:
                continue
            chunks = [" ".join(words[i * w_:(i + 1) * w_])
                      for i in range(nfull)]
            hs.append(hash_strings(chunks))
            dids.append(np.full(nfull, did, dtype=np.int64))
            cis.append(np.arange(nfull, dtype=np.int64))
        if not hs:
            return pa.table({"_bkt": pa.array([], pa.int64()),
                             "ch": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "ci": pa.array([], pa.int64())})
        h = np.concatenate(hs)
        return pa.table({
            "_bkt": pa.array((h % np.uint64(_SPAN_BUCKETS)).astype(np.int64)),
            "ch": pa.array(h, pa.uint64()),
            "doc_id": pa.array(np.concatenate(dids), pa.int64()),
            "ci": pa.array(np.concatenate(cis), pa.int64())})

    def removals(g: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket → (doc_id, ci) of its boilerplate chunks:
        df = distinct docs per hash, computed on a (hash, doc) dedupe;
        rows whose hash clears min_df are the removals."""
        h = g["ch"].to_numpy(dtype=np.uint64)
        d = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((d, h))
        hd_new = np.concatenate([[True], (h[order][1:] != h[order][:-1])
                                 | (d[order][1:] != d[order][:-1])])
        h_u = h[order][hd_new]
        starts = np.flatnonzero(np.concatenate([[True], h_u[1:] != h_u[:-1]]))
        df = np.diff(np.concatenate([starts, [len(h_u)]]))
        bp = h_u[starts[df >= k_]]
        hit = np.isin(h, bp)
        return pd.DataFrame({"doc_id": d[hit],
                             "ci": g["ci"].to_numpy(dtype=np.int64)[hit]})

    rem = (ds.map_batches(chunk_rows, batch_format="pyarrow",
                          batch_size=1024)
             .groupby("_bkt").map_groups(removals, batch_format="pandas"))

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": t["text"],
                         "ci": pa.array(np.full(len(ids), -1, np.int64)),
                         "_bkt": pa.array(ids % _SPAN_BUCKETS, pa.int64())})

    def tag_rem(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array([""] * len(ids), pa.string()),
                         "ci": t["ci"].cast(pa.int64()),
                         "_bkt": pa.array(ids % _SPAN_BUCKETS, pa.int64())})

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["ci"] < 0]
        cut: dict[int, set[int]] = {}
        for did, ci in zip(g.loc[g["ci"] >= 0, "doc_id"],
                           g.loc[g["ci"] >= 0, "ci"]):
            cut.setdefault(int(did), set()).add(int(ci))
        ids, cleans, n_chunks, n_removed = [], [], [], []
        for did, text in zip(docs["doc_id"], docs["text"]):
            words = text.split(" ")
            nfull = len(words) // w_
            gone = cut.get(int(did), ())
            pieces = [" ".join(words[i * w_:(i + 1) * w_])
                      for i in range(nfull) if i not in gone]
            tail = " ".join(words[nfull * w_:])
            if tail:
                pieces.append(tail)
            ids.append(int(did))
            cleans.append(" ".join(pieces))
            n_chunks.append(nfull)
            n_removed.append(len(gone))
        return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                             "text_clean": cleans,
                             "n_chunks": np.asarray(n_chunks, np.int64),
                             "n_removed": np.asarray(n_removed, np.int64)})

    tagged = (ds.map_batches(tag_docs, batch_format="pyarrow")
                .union(rem.map_batches(tag_rem, batch_format="pyarrow")))
    return tagged.groupby("_bkt").map_groups(rebuild, batch_format="pandas")


def boilerplate_scrub(sf_dir: str, chunk_words: int = _BP_CHUNK_WORDS,
                      min_df: int = _BP_MIN_DF) -> pa.Table:
    """Driver-side collected form of :func:`boilerplate_scrub_ds`."""
    got = (boilerplate_scrub_ds(sf_dir, chunk_words, min_df).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(
        got[["doc_id", "text_clean", "n_chunks", "n_removed"]],
        preserve_index=False)


# ------------------------------------------------ bigram-LM perplexity

LM_VOCAB_K = 4096       # CCNet-style model cap: model size is O(K^2)
                        # worst case, INDEPENDENT of corpus size
LM_HEAD_BITS = 4.89     # bucket cutoffs in bits/bigram (frozen absolute
LM_TAIL_BITS = 4.94     # thresholds, the production CCNet shape where
                        # cutoffs are precomputed once per language)
_LM_UNK = "<unk>"


_LM_CACHE: dict[tuple, tuple[tuple, tuple]] = {}


def _lm_model(sf_dir: str, vocab_k: int):
    """Train the capped bigram LM: (sorted_vocab, cu, bigram_keys,
    bigram_cnts, V). Two keyed exchanges over token/bigram COUNT rows
    (per-batch np.unique pre-combine), never over documents; the only
    driver-side tables are the top-K vocab and the ≤(K+1)^2 bigram
    count table — both bounded by the cap, not the corpus. Memoized
    per (source, vocab_k) with stat validation (LRU-bounded): the two
    LM entries and pipeline compositions in one sweep train ONCE."""
    import os

    from miru_ray.state.layout import stat_validated_memo
    src = os.path.join(sf_dir, "documents.parquet")
    return stat_validated_memo(
        _LM_CACHE, (os.path.abspath(src), vocab_k), src,
        lambda: _lm_train(sf_dir, vocab_k), max_entries=2)


def _lm_train(sf_dir: str, vocab_k: int):
    import ray

    ds = read_table(sf_dir, "documents", columns=["text"])

    def uni_counts(batch: pa.Table) -> pa.Table:
        toks = [w for t in batch["text"].to_pylist() for w in t.split(" ")]
        if not toks:
            return pa.table({"tok": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"tok": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    uni = (ds.map_batches(uni_counts, batch_format="pyarrow")
             .groupby("tok").sum("cnt").materialize())
    total = int(uni.sum("sum(cnt)"))
    top = (uni.sort(["sum(cnt)", "tok"], descending=[True, False])
              .limit(vocab_k).take_all())
    vtoks = np.array([r["tok"] for r in top], dtype=object)
    vcnts = np.array([r["sum(cnt)"] for r in top], dtype=np.int64)
    order = np.argsort(vtoks)                 # searchsorted order
    vtoks, vcnts = vtoks[order], vcnts[order]
    n_unk = total - int(vcnts.sum())
    cu = np.concatenate([vcnts, [n_unk]])     # id == position; unk last
    V = len(vtoks) + 1
    vref = ray.put(vtoks)

    def map_ids(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(flat mapped ids, per-doc token counts); unk id = V-1."""
        vt = ray.get(vref)
        toks = [t.split(" ") for t in texts]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.asarray([w for x in toks for w in x], dtype=object)
        if not len(flat):
            return np.empty(0, np.int64), lens
        pos = np.searchsorted(vt, flat)
        np.minimum(pos, len(vt) - 1, out=pos)
        ids = np.where(vt[pos] == flat, pos, len(vt)).astype(np.int64)
        return ids, lens

    def bigram_counts(batch: pa.Table) -> pa.Table:
        ids, lens = map_ids(batch["text"].to_pylist())
        if not len(ids):
            return pa.table({"key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        ends = np.cumsum(lens)                # doc-boundary mask: a pair
        valid = np.ones(len(ids), bool)       # never spans two docs
        valid[ends - 1] = False
        keys = ids[:-1] * V + ids[1:]
        keys = keys[valid[:-1]]
        u, c = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    big = (ds.map_batches(bigram_counts, batch_format="pyarrow")
             .groupby("key").sum("cnt").take_all())
    bkeys = np.array([r["key"] for r in big], dtype=np.int64)
    bcnts = np.array([r["sum(cnt)"] for r in big], dtype=np.int64)
    order = np.argsort(bkeys)
    return vtoks, cu, bkeys[order], bcnts[order], V


def lm_score_texts(texts: list[str],
                   model: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Score ``texts`` with a trained model tuple from :func:`_lm_model`
    → (n_bigrams int64, bits float64 rounded 6 dp) arrays. The pure
    scoring kernel, shared by lm_perplexity_ds and pipeline compositions
    that filter on the bits mid-stream (examples/training_data_pipeline)."""
    vt, cu_, bk, bc, V = model
    toks = [t.split(" ") for t in texts]
    lens = np.array([len(x) for x in toks], dtype=np.int64)
    flat = np.asarray([w for x in toks for w in x], dtype=object)
    if len(flat):
        pos = np.searchsorted(vt, flat)
        np.minimum(pos, len(vt) - 1, out=pos)
        ids = np.where(vt[pos] == flat, pos, len(vt)).astype(np.int64)
    else:
        ids = np.empty(0, np.int64)
    ends = np.cumsum(lens)
    valid = np.ones(len(ids), bool)
    if len(ids):
        valid[ends - 1] = False
    keys = ids[:-1] * V + ids[1:]
    pv = valid[:-1]
    cuv = np.zeros(len(keys), np.int64)
    if len(bk) and len(keys):
        p = np.searchsorted(bk, keys)
        np.minimum(p, len(bk) - 1, out=p)
        hit = bk[p] == keys
        cuv[hit] = bc[p[hit]]
    bits_pair = -np.log2((cuv + 1.0) / (cu_[ids[:-1]] + float(V)))
    # per-doc mean over that doc's pairs (segment sum via bincount);
    # a pair belongs to the doc of its LEFT position
    doc_of_pos = np.repeat(np.arange(len(lens)), lens)
    dop = doc_of_pos[:-1] if len(ids) else np.empty(0, np.int64)
    npairs = np.bincount(dop[pv], minlength=len(lens)).astype(np.int64) \
        if len(keys) else np.zeros(len(lens), np.int64)
    sums = np.bincount(dop[pv], weights=bits_pair[pv],
                       minlength=len(lens)) if len(keys) else \
        np.zeros(len(lens))
    bits = np.round(np.divide(sums, npairs, out=np.zeros(len(lens)),
                              where=npairs > 0), 6)
    return npairs, bits


def lm_perplexity_ds(sf_dir: str, vocab_k: int = LM_VOCAB_K,
                     head_bits: float = LM_HEAD_BITS,
                     tail_bits: float = LM_TAIL_BITS):
    """Lazy Dataset of (doc_id, n_bigrams, bits, bucket) — CCNet-style
    QUALITY SCORING by language-model perplexity: train a Laplace-
    smoothed bigram LM with a top-``vocab_k`` vocabulary (+ ``<unk>``)
    on the corpus itself, then score every document with its mean
    bits-per-bigram ``-log2((c(u,v)+1) / (c(u)+V))`` and bucket it
    head/middle/tail on frozen absolute cutoffs (the CCNet deployment
    shape: cutoffs are computed once, offline, then applied as plain
    constants so the scoring pass is embarrassingly parallel).

    Scale shape: the MODEL is capped (top-K vocab ⇒ ≤(K+1)^2 bigrams)
    so it broadcasts once via ``ray.put`` regardless of corpus size;
    training is two count exchanges whose rows are (token, n) /
    (bigram, n) partials pre-combined per batch with np.unique — the
    shuffle moves distinct-gram COUNT rows, never text; scoring is one
    stateless map_batches probing the broadcast arrays with
    searchsorted. Docs with <2 tokens score bits=0.0 (bucket by the
    same CASE). ``<unk>`` is reserved unconditionally (V includes it
    even when the vocab is uncapped) — caveat: a literal corpus token
    ``<unk>`` would alias it."""
    import ray

    vtoks, cu, bkeys, bcnts, V = _lm_model(sf_dir, vocab_k)
    mref = ray.put((vtoks, cu, bkeys, bcnts, V))

    def score(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy()
        npairs, bits = lm_score_texts(batch["text"].to_pylist(),
                                      ray.get(mref))
        bucket = np.where(bits < head_bits, "head",
                          np.where(bits >= tail_bits, "tail", "middle"))
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "n_bigrams": pa.array(npairs.astype(np.int64), pa.int64()),
            "bits": pa.array(bits, pa.float64()),
            "bucket": pa.array(bucket.astype(object), pa.string())})

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(score, batch_format="pyarrow")


def lm_perplexity(sf_dir: str, vocab_k: int = LM_VOCAB_K) -> pa.Table:
    """Driver-side collected form of :func:`lm_perplexity_ds`."""
    df = (lm_perplexity_ds(sf_dir, vocab_k).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


# ------------------------------------------- exact global ntile ranking

_NTILE_BINS = 4096


def exact_global_ntile(ds, col: str, n: int, id_col: str = "doc_id",
                       bins: int = _NTILE_BINS):
    """Exact distributed ``ntile(n) OVER (ORDER BY col, id_col)`` —
    corpus-RELATIVE bucketing (the true CCNet perplexity-tercile shape,
    where cutoffs are data-dependent quantiles, not frozen constants)
    without ever collecting or globally sorting the corpus on the
    driver.

    The docID-allocation prefix-sum pattern applied to VALUE ranges:
    (1) each row gets a deterministic value bin (uniform in
    [min(col), max(col)], so bin order == value order and ties share a
    bin); (2) per-bin counts reduce to a ≤``bins``-row driver table
    whose exclusive prefix sum gives every bin its global starting
    rank; (3) one keyed exchange groups rows by bin and each group
    sorts its own slice by (col, id_col) and adds the local cumsum —
    every row gets its exact 0-based global rank, then the exact
    SQL-ntile bucket (first N%n buckets one larger). Only
    (id, value, bin) rows move; driver state is O(bins). Skewed value
    distributions degrade gracefully: a hot bin becomes one larger
    sort group, never a driver problem."""
    sub = ds.select_columns([id_col, col]).materialize()
    total = sub.count()
    if total == 0:
        return sub
    mn, mx = sub.min(col), sub.max(col)
    width = (mx - mn) / bins if mx > mn else 1.0

    def bin_of(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy()
        b = np.clip(((v - mn) / width).astype(np.int64), 0, bins - 1)
        return pa.table({id_col: batch[id_col], col: batch[col],
                         "_bin": pa.array(b, pa.int64())})

    binned = sub.map_batches(bin_of, batch_format="pyarrow")
    cnt = (binned.groupby("_bin").count().to_pandas()
           .sort_values("_bin").reset_index(drop=True))
    csum = cnt["count()"].to_numpy().cumsum()
    base = dict(zip(cnt["_bin"].astype(int),
                    np.r_[0, csum[:-1]].astype(np.int64)))
    size, rem = total // n, total % n

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([col, id_col], kind="stable")
        k = base[int(g["_bin"].iloc[0])] + np.arange(len(g), dtype=np.int64)
        head = k < rem * (size + 1)
        tile = np.where(head, k // max(size + 1, 1),
                        rem + (k - rem * (size + 1)) // max(size, 1))
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             col: g[col].to_numpy(),
                             "tile": (tile + 1).astype(np.int64)})

    return binned.groupby("_bin").map_groups(rank, batch_format="pandas")


def perplexity_ntile_ds(sf_dir: str, n: int = 3,
                        vocab_k: int = LM_VOCAB_K):
    """Lazy Dataset of (doc_id, bits, tile) — corpus-relative perplexity
    terciles: the :func:`lm_perplexity_ds` bits ranked with
    :func:`exact_global_ntile` (exact SQL-ntile semantics, value-binned
    prefix-sum ranking, no driver-side sort)."""
    return exact_global_ntile(lm_perplexity_ds(sf_dir, vocab_k),
                              "bits", n)


def perplexity_ntile(sf_dir: str, n: int = 3) -> pa.Table:
    """Driver-side collected form of :func:`perplexity_ntile_ds`."""
    df = (perplexity_ntile_ds(sf_dir, n).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df[["doc_id", "bits", "tile"]],
                                preserve_index=False)


# ----------------------------------------- exact-substring (window) scrub

_ESS_SPAN = 5          # window length in whitespace tokens (Lee et al.
                       # 2022 use 50 BPE tokens; the synthetic corpus is
                       # short-doc word soup, so the default matches the
                       # dup_span_frac signal's window)


def exact_substring_scrub_ds(sf_dir: str, span: int = _ESS_SPAN):
    """Lazy Dataset of (doc_id, text_clean, n_tokens, n_removed) —
    ExactSubstr deduplication (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): any ``span``-token window whose
    exact string occurs ≥2 times in the corpus (within- OR cross-doc)
    is a duplicate; the lowest-(doc_id, start) occurrence is KEPT, every
    other occurrence's token range is removed, and each doc's text is
    rebuilt from the surviving tokens. Overlapping duplicate windows
    merge naturally through position coverage.

    Distributed shape (2 keyed exchanges; window TEXT never shuffles —
    the boilerplate_scrub plumbing at window granularity):
      1. rolling-fold window hashes (24 B/window rows) bucket on the
         hash; a window's occurrences all land in one bucket, so each
         bucket picks the kept occurrence (min (doc_id, start)) and
         emits the other occurrences' (doc_id, start) removal coords;
      2. coords meet the doc text in a union-side-tag exchange bucketed
         on doc_id; each bucket rebuilds its docs via a coverage
         difference-array (+1 at start, -1 at start+span, cumsum>0 =
         token removed). Driver state: none. Window identity is the
         64-bit polynomial fold (the shared 2^-64 collision caveat; the
         SQL oracle compares true window strings)."""
    from miru_ray.functions.hashing import hash_strings

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    L = span

    def window_rows(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dids = batch["doc_id"].to_numpy()
        toks = [t.split(" ") for t in texts]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.asarray([w for x in toks for w in x], dtype=object)
        empty = pa.table({"_bkt": pa.array([], pa.int64()),
                          "wh": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64()),
                          "wi": pa.array([], pa.int64())})
        total = len(flat)
        if total < L:
            return empty
        th = hash_strings(flat)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        s = th[: total - L + 1].copy()
        for j in range(1, L):
            s = s * _SPAN_POLY + th[j: total - L + 1 + j]
        valid = doc_of[: total - L + 1] == doc_of[L - 1:]
        if not valid.any():
            return empty
        starts = np.cumsum(lens) - lens
        gpos = np.arange(total - L + 1, dtype=np.int64)[valid]
        d = doc_of[: total - L + 1][valid]
        return pa.table({
            "_bkt": pa.array((s[valid] % np.uint64(_SPAN_BUCKETS))
                             .astype(np.int64)),
            "wh": pa.array(s[valid], pa.uint64()),
            "doc_id": pa.array(dids[d], pa.int64()),
            "wi": pa.array(gpos - starts[d], pa.int64())})

    def removals(g: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket → removal coords: per hash with ≥2
        occurrences, every occurrence EXCEPT the (doc_id, wi)-minimum."""
        h = g["wh"].to_numpy(dtype=np.uint64)
        d = g["doc_id"].to_numpy(dtype=np.int64)
        w = g["wi"].to_numpy(dtype=np.int64)
        order = np.lexsort((w, d, h))
        h, d, w = h[order], d[order], w[order]
        first = np.concatenate([[True], h[1:] != h[:-1]])
        starts = np.flatnonzero(first)
        counts = np.diff(np.concatenate([starts, [len(h)]]))
        dup = np.repeat(counts >= 2, counts)
        drop = dup & ~first                    # keep the group minimum
        return pd.DataFrame({"doc_id": d[drop], "wi": w[drop]})

    rem = (ds.map_batches(window_rows, batch_format="pyarrow",
                          batch_size=1024)
             .groupby("_bkt").map_groups(removals, batch_format="pandas"))

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": t["text"],
                         "wi": pa.array(np.full(len(ids), -1, np.int64)),
                         "_bkt": pa.array(ids % _SPAN_BUCKETS, pa.int64())})

    def tag_rem(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array([""] * len(ids), pa.string()),
                         "wi": t["wi"].cast(pa.int64()),
                         "_bkt": pa.array(ids % _SPAN_BUCKETS, pa.int64())})

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["wi"] < 0]
        cut: dict[int, list[int]] = {}
        for did, wi in zip(g.loc[g["wi"] >= 0, "doc_id"],
                           g.loc[g["wi"] >= 0, "wi"]):
            cut.setdefault(int(did), []).append(int(wi))
        ids, cleans, n_toks, n_rm = [], [], [], []
        for did, text in zip(docs["doc_id"], docs["text"]):
            words = text.split(" ")
            nw = len(words)
            gone = cut.get(int(did))
            if gone:
                delta = np.zeros(nw + 1, np.int64)
                ws = np.asarray(gone, dtype=np.int64)
                np.add.at(delta, ws, 1)
                np.add.at(delta, np.minimum(ws + L, nw), -1)
                covered = np.cumsum(delta[:-1]) > 0
                kept = [w for w, c in zip(words, covered) if not c]
                nrm = int(covered.sum())
            else:
                kept, nrm = words, 0
            ids.append(int(did))
            cleans.append(" ".join(kept))
            n_toks.append(nw)
            n_rm.append(nrm)
        return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                             "text_clean": cleans,
                             "n_tokens": np.asarray(n_toks, np.int64),
                             "n_removed": np.asarray(n_rm, np.int64)})

    tagged = (ds.map_batches(tag_docs, batch_format="pyarrow")
                .union(rem.map_batches(tag_rem, batch_format="pyarrow")))
    return tagged.groupby("_bkt").map_groups(rebuild, batch_format="pandas")


def exact_substring_scrub(sf_dir: str, span: int = _ESS_SPAN) -> pa.Table:
    """Driver-side collected form of :func:`exact_substring_scrub_ds`."""
    got = (exact_substring_scrub_ds(sf_dir, span).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(
        got[["doc_id", "text_clean", "n_tokens", "n_removed"]],
        preserve_index=False)


# ---------------------------------------------- train/val/test split

SPLIT_VAL_CUT = "0d"    # md5(text) hex-prefix cuts: [00,0d) val ≈5.1%,
SPLIT_TEST_CUT = "1a"   # [0d,1a) test ≈5.1%, rest train — content-keyed
                        # like sample_hash/mixture_sample, so membership
                        # is invariant to partitioning/ordering/engine
                        # and a resumed run keeps identical splits


def corpus_split_ds(sf_dir: str, val_cut: str = SPLIT_VAL_CUT,
                    test_cut: str = SPLIT_TEST_CUT):
    """Lazy Dataset of (doc_id, split ∈ {train,val,test}) — the
    held-out-split assignment every training pipeline needs, done the
    only way that survives 100 TB: CONTENT-KEYED (md5-prefix cuts), so
    it is a stateless zero-shuffle map_batches, needs no global count
    or coordination, and two engines (or a killed-and-resumed run)
    assign every document identically. Deterministic-by-content also
    means exact-duplicate texts land in the SAME split — leakage-safe
    by construction (a near-dup pass handles the rest)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        pre = np.asarray([hashlib.md5(t.encode("utf-8")).hexdigest()[:2]
                          for t in batch["text"].to_pylist()], dtype=object)
        split = np.where(pre < val_cut, "val",
                         np.where(pre < test_cut, "test", "train"))
        return pa.table({"doc_id": batch["doc_id"],
                         "split": pa.array(split.astype(object),
                                           pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def corpus_split(sf_dir: str) -> pa.Table:
    """Driver-side collected form of :func:`corpus_split_ds`."""
    df = (corpus_split_ds(sf_dir).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


# --- DSIR importance resampling (Xie et al. 2023) -----------------------

DSIR_BUCKET_HEX = 3     # md5(token) hex-prefix buckets: K = 16^3 = 4096
DSIR_K = 16 ** DSIR_BUCKET_HEX
DSIR_KEEP_TILES = 3     # dsir_sample keeps the top 1/3 by log-ratio

_DSIR_CACHE: dict[tuple, tuple[tuple, tuple]] = {}


def _dsir_buckets(tokens: np.ndarray) -> np.ndarray:
    """md5-hex-prefix feature bucket per token (int64 in [0, DSIR_K)).
    Hashing runs once per DISTINCT token per batch; the md5 prefix is
    the same content key every sampling operator here uses, so the SQL
    oracle reproduces the bucketing exactly (substr(md5(tok),1,3))."""
    uniq, inv = np.unique(tokens, return_inverse=True)
    ub = np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:DSIR_BUCKET_HEX], 16)
         for t in uniq), dtype=np.int64, count=len(uniq))
    return ub[inv]


def _dsir_model(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(raw, target) bucket-count arrays (each DSIR_K int64), trained in
    ONE corpus pass: per batch, tokens hash to buckets and fold to TWO
    K-bounded count rows (raw = every doc, target = the content-keyed
    val slice — the same md5(text) prefix cut as corpus_split), so the
    exchange moves <= 2 * DSIR_K ints per batch and the driver reduces
    int64 partials (exact in any order). Memoized per source file."""
    from miru_ray.state.layout import stat_validated_memo
    import os as _os
    src = _os.path.join(sf_dir, "documents.parquet")

    def build():
        ds = read_table(sf_dir, "documents", columns=["text"])

        def partial(batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            toks = [t.split(" ") for t in texts]
            lens = np.array([len(x) for x in toks], dtype=np.int64)
            flat = np.asarray([w for x in toks for w in x], dtype=object)
            b = (_dsir_buckets(flat) if len(flat)
                 else np.empty(0, np.int64))
            is_tgt = np.repeat(np.asarray(
                [hashlib.md5(t.encode("utf-8")).hexdigest()[:2]
                 < SPLIT_VAL_CUT for t in texts], dtype=bool), lens)
            raw = np.bincount(b, minlength=DSIR_K)
            tgt = np.bincount(b[is_tgt], minlength=DSIR_K)
            return pa.table({"raw": pa.array([raw], pa.list_(pa.int64())),
                             "tgt": pa.array([tgt], pa.list_(pa.int64()))})

        part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        raw = np.zeros(DSIR_K, dtype=np.int64)
        tgt = np.zeros(DSIR_K, dtype=np.int64)
        for r, t in zip(part["raw"], part["tgt"]):
            raw += np.asarray(r, dtype=np.int64)
            tgt += np.asarray(t, dtype=np.int64)
        return raw, tgt

    return stat_validated_memo(_DSIR_CACHE, (_os.path.abspath(src),), src,
                               build, max_entries=2)


def dsir_score_texts(texts: list[str], model: tuple) -> tuple[np.ndarray,
                                                              np.ndarray]:
    """(n_tokens, logratio) per text: mean over tokens of
    log2((tgt[b]+1)/(tgt_tot+K)) - log2((raw[b]+1)/(raw_tot+K)) —
    the hashed-n-gram importance log-weight of DSIR (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"),
    with Laplace-smoothed bucket distributions. Rounded 6 dp to match
    the SQL oracle. Empty text scores over its single '' token (the
    same string_split(' ') convention as the LM family)."""
    raw, tgt = model
    rtot, ttot = int(raw.sum()), int(tgt.sum())
    toks = [t.split(" ") for t in texts]
    lens = np.array([len(x) for x in toks], dtype=np.int64)
    flat = np.asarray([w for x in toks for w in x], dtype=object)
    b = _dsir_buckets(flat) if len(flat) else np.empty(0, np.int64)
    lr = (np.log2((tgt[b] + 1.0) / (ttot + DSIR_K))
          - np.log2((raw[b] + 1.0) / (rtot + DSIR_K)))
    doc_of = np.repeat(np.arange(len(lens)), lens)
    sums = np.bincount(doc_of, weights=lr, minlength=len(lens))
    return lens, np.round(sums / lens, 6)


def dsir_weights_ds(sf_dir: str):
    """Lazy Dataset of (doc_id, n_tokens, logratio) — per-doc DSIR
    importance log-weights against the content-keyed val slice as the
    target distribution. Scale shape: the model is two DSIR_K int64
    arrays trained in one pass (K-bounded partials, exact int
    reduction) and broadcast once via ray.put; scoring is a stateless
    map_batches. Positive logratio = doc looks more like the target
    than like the raw corpus."""
    import ray
    mref = ray.put(_dsir_model(sf_dir))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        import ray as _r
        n, lr = dsir_score_texts(batch["text"].to_pylist(), _r.get(mref))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(n, pa.int64()),
                         "logratio": pa.array(lr, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_weights(sf_dir: str) -> pa.Table:
    """Driver-side collected form of :func:`dsir_weights_ds`."""
    df = (dsir_weights_ds(sf_dir).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


def dsir_sample_ds(sf_dir: str, n_tiles: int = DSIR_KEEP_TILES):
    """Lazy Dataset of (doc_id, logratio) — the docs DSIR keeps: the
    TOP 1/``n_tiles`` of the corpus by importance log-ratio, selected
    with the exact distributed ntile (corpus-RELATIVE, so the rule is
    non-degenerate for any target/raw pair — an absolute >=0 cut
    collapses when the target is a subsample of the raw corpus, since
    smoothing then biases every weight slightly negative)."""
    import pyarrow.compute as pc
    tiles = exact_global_ntile(dsir_weights_ds(sf_dir), "logratio",
                               n_tiles)

    def f(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["tile"], pa.scalar(n_tiles, pa.int64()))
        return batch.filter(keep).select(["doc_id", "logratio"])

    return tiles.map_batches(f, batch_format="pyarrow")


def dsir_sample(sf_dir: str, n_tiles: int = DSIR_KEEP_TILES) -> pa.Table:
    """Driver-side collected form of :func:`dsir_sample_ds`."""
    df = (dsir_sample_ds(sf_dir, n_tiles).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)
