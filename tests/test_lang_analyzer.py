"""Per-language analyzer chain (TermAnalyzers dual): pure-fn vs
vectorized parity, index/query symmetry, resume invalidation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from miru_ray.functions.tokenize import (STOPWORDS, tokenize, tokenize_lang,
                                         tokenize_column_lang)


def test_stopwords_fit_token_grammar():
    """Every stopword must be a single [a-z0-9]+ token — accented forms
    would never match the tokenizer's output."""
    for lang, ws in STOPWORDS.items():
        for w in ws:
            assert tokenize(w) == [w], (lang, w)


def test_tokenize_lang_matches_vectorized():
    texts = ["the quick brown fox is fast",
             "der hund und die katze sind nicht da",
             "le chat est dans la maison",
             "el perro es un animal",
             "unknown language keeps the tokens",   # zh: no filtering
             ""]
    langs = np.array(["en", "de", "fr", "es", "zh", "en"], dtype=object)
    col = tokenize_column_lang(pa.array(texts), langs)
    for i, (t, lg) in enumerate(zip(texts, langs)):
        assert col[i].as_py() == tokenize_lang(t, lg), (i, lg)
    # and the filtering actually removed something per romance lang
    assert "the" not in col[0].as_py()
    assert "der" not in col[1].as_py()
    assert "the" in col[4].as_py()   # zh has no chain → untouched


def test_per_lang_index_query_symmetry(tmp_path, ray_session):
    """An index built with analyzer='per_lang' must answer a stopword-y
    query identically to the stopword-stripped query (query side analyzes
    with the SAME chain), and record the analyzer in its meta."""
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.pipelines.search import search
    from miru_ray.sources.fixtures import generate_pages
    from miru_ray.state.reader import IndexReader

    pages = generate_pages(0, 400)
    d = str(tmp_path / "idx")
    build_index(pages, d, BuildConfig(num_parts=2, num_shards=2,
                                      analyzer="per_lang"))
    r = IndexReader(d)
    assert r.analyzer == "per_lang"
    plain = search(r, "w00001 w00002", k=5, langs=["en"])
    stoppy = search(r, "the w00001 of w00002", k=5, langs=["en"])
    assert plain.equals(stoppy)


def test_analyzer_change_invalidates_resume(tmp_path, ray_session):
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.sources.fixtures import generate_pages

    pages = generate_pages(0, 300)
    d = str(tmp_path / "idx")
    m1 = build_index(pages, d, BuildConfig(num_parts=3, num_shards=2))
    assert m1["skipped_parts"] == []
    m2 = build_index(pages, d, BuildConfig(num_parts=3, num_shards=2,
                                           analyzer="per_lang"))
    assert m2["skipped_parts"] == []    # analyzer changed: full rebuild
    m3 = build_index(pages, d, BuildConfig(num_parts=3, num_shards=2,
                                           analyzer="per_lang"))
    assert sorted(m3["skipped_parts"]) == [0, 1, 2]


def test_per_lang_query_keeps_grammar_tokens(tmp_path, ray_session):
    """en 'or' is a stopword but ``OR`` is the union OPERATOR; field:value
    and prefix* tokens are grammar too — the per-language query analyzer
    must never swallow them (ADVICE-class regression guard)."""
    from miru_ray.pipelines.build import BuildConfig, build_index
    from miru_ray.pipelines.search import search
    from miru_ray.sources.fixtures import generate_pages

    from miru_ray.state.reader import IndexReader

    pages = generate_pages(0, 400)
    d = str(tmp_path / "idx")
    build_index(pages, d, BuildConfig(num_parts=2, num_shards=2,
                                      analyzer="per_lang"))
    r = IndexReader(d)
    u = search(r, "w00001 OR w00002", k=400, langs=["en"])
    a = search(r, "w00001 w00002", k=400, langs=["en"])
    # OR semantics must survive: union is a STRICT superset of the AND
    # result on this fixture (284 vs 271 docs) — if the en stopword 'or'
    # swallowed the operator, the two would collapse to the same rows
    assert u.num_rows > a.num_rows
    assert set(a["doc_id"].to_pylist()) <= set(u["doc_id"].to_pylist())
    # prefix pattern equal to a stopword prefix still expands
    p = search(r, "w0000*", k=400, langs=["en"])
    assert p.num_rows >= u.num_rows
