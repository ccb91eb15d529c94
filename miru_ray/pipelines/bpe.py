"""From-scratch BPE tokenizer training + segmentation over ``documents``.

The LLM-pipeline tokenizer component: learn a byte-pair-encoding merge
table from the corpus, then segment documents with it. The scale shape
exploits the classic trainer factorization — BPE training never needs
the corpus, only the DISTINCT-WORD FREQUENCY table (Sennrich et al.
2016 operate on word counts): one keyed count exchange (per-batch
np.unique pre-combine, same plan as the bigram-LM vocab pass) reduces
the corpus to a table bounded by the word vocabulary, and the merge
loop runs on that bounded table driver-side. Segmentation broadcasts
the merge ranks once via ``ray.put`` and applies them per DISTINCT word
per batch (memoized within the batch), so the per-token cost is paid
once per distinct word, not once per occurrence.

Determinism contract (pinned by the pure-python oracle in
tests/test_ops.py): words are whitespace-split, symbols are unicode
characters with NO end-of-word marker, each merge picks the
highest-frequency adjacent pair with ties broken by (left, right)
lexicographic ascending, and pairs are counted weighted by word
frequency with multiple occurrences inside one word all counted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from miru_ray.sources.tables import read_table

__all__ = ["bpe_train", "bpe_merges_from_word_counts", "bpe_segment_word",
           "bpe_token_counts", "bpe_token_counts_ds", "word_counts_table",
           "BPE_N_MERGES"]

BPE_N_MERGES = 200


def word_counts_table(sf_dir: str) -> pd.DataFrame:
    """(word, cnt) over the corpus — the ONE exchange BPE training
    needs. Per-batch np.unique partials shuffle distinct-word count
    rows, never text; the collected table is bounded by the word
    vocabulary (at web scale, train on a deterministic hash-sample of
    documents first — the plan is unchanged)."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = [w for t in batch["text"].to_pylist()
                for w in t.split(" ") if w]
        if not toks:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"word": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("word").sum("cnt").to_pandas())
    out = out.rename(columns={"sum(cnt)": "cnt"})
    return out.sort_values("word").reset_index(drop=True)


def bpe_merges_from_word_counts(wc: pd.DataFrame,
                                n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a (word, cnt) table — bounded driver
    state, no corpus access. Stops early when no pair repeats."""
    seqs: list[list[str]] = [list(w) for w in wc["word"]]
    cnts = wc["cnt"].to_numpy(dtype=np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_cnt: dict[tuple[str, str], int] = {}
        for s, c in zip(seqs, cnts):
            for a, b in zip(s, s[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + int(c)
        if not pair_cnt:
            break
        best = min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        ab = a + b
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == a and s[i + 1] == b:
                    s[i: i + 2] = [ab]
                else:
                    i += 1
    return merges


def bpe_train(sf_dir: str, n_merges: int = BPE_N_MERGES) -> pa.Table:
    """(rank, left, right, merged) learned merge table."""
    merges = bpe_merges_from_word_counts(word_counts_table(sf_dir),
                                         n_merges)
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
        "merged": pa.array([a + b for a, b in merges], pa.string())})


def bpe_segment_word(word: str, rank: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word: repeatedly merge the
    lowest-rank adjacent pair (the standard apply order — NOT the
    training scan order, which coincides for a consistent rank table)."""
    s = list(word)
    while len(s) > 1:
        best_i, best_r = -1, None
        for i, p in enumerate(zip(s, s[1:])):
            r = rank.get(p)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        s[best_i: best_i + 2] = [s[best_i] + s[best_i + 1]]
    return len(s)


def bpe_token_counts_ds(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Lazy Dataset of (doc_id, n_words, n_bpe_tokens): segment every
    doc with the learned merge table. The merge-rank dict broadcasts
    once via ``ray.put``; each batch segments each DISTINCT word once
    (per-batch memo) and sums counts per doc vectorized."""
    import ray

    merges = bpe_merges_from_word_counts(word_counts_table(sf_dir),
                                         n_merges)
    rank = {p: i for i, p in enumerate(merges)}
    rref = ray.put(rank)

    def seg(batch: pa.Table) -> pa.Table:
        r = ray.get(rref)
        memo: dict[str, int] = {}
        dids = batch["doc_id"].to_numpy()
        n_words = np.zeros(len(dids), np.int64)
        n_bpe = np.zeros(len(dids), np.int64)
        for k, t in enumerate(batch["text"].to_pylist()):
            words = [w for w in t.split(" ") if w]
            n_words[k] = len(words)
            tot = 0
            for w in words:
                c = memo.get(w)
                if c is None:
                    c = bpe_segment_word(w, r)
                    memo[w] = c
                tot += c
            n_bpe[k] = tot
        return pa.table({"doc_id": pa.array(dids, pa.int64()),
                         "n_words": pa.array(n_words, pa.int64()),
                         "n_bpe_tokens": pa.array(n_bpe, pa.int64())})

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(seg, batch_format="pyarrow")


def bpe_token_counts(sf_dir: str, n_merges: int = BPE_N_MERGES) -> pa.Table:
    """Driver-side collected form of :func:`bpe_token_counts_ds`."""
    df = (bpe_token_counts_ds(sf_dir, n_merges).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)
