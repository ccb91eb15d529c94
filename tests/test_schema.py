"""Multi-field IndexSchema: keyword / keyword_list / tokenized secondary
fields, rank+score parity with the brute-force oracle, stored-field gather.

Reference model: per-field posting indexes with multi-field schemas
(MiruFieldDefinition.java:59-127, MiruFullTextNGTest.java:52-60)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from miru_ray.oracle import OracleIndex
from miru_ray.pipelines.build import BuildConfig, build_index
from miru_ray.pipelines.search import search
from miru_ray.sources.fixtures import generate_pages
from miru_ray.state.reader import IndexReader
from miru_ray.state.schema import FieldDef, IndexSchema, field_term

SCHEMA = IndexSchema((
    FieldDef("site", "keyword", stored=True),
    FieldDef("tags", "keyword_list"),
    FieldDef("title", "tokenized"),
    FieldDef("nlen", "numeric"),
    FieldDef("site_lang", "composite", source=("site", "lang"), stored=True),
))


def _fielded_pages(n: int = 500) -> pa.Table:
    pages = generate_pages(0, n)
    site = [u.split("//")[1].split(".")[0] for u in pages["url"].to_pylist()]
    tags = [["hot"] if i % 5 == 0 else
            ["hot", "fresh"] if i % 5 == 1 else
            [] if i % 5 == 2 else ["fresh"] for i in range(n)]
    title = [t.split("\n", 1)[0] for t in pages["text"].to_pylist()]
    nlen = [len(t) - 600 for t in pages["text"].to_pylist()]  # incl. negatives
    return (pages
            .append_column("site", pa.array(site, pa.string()))
            .append_column("tags", pa.array(tags, pa.list_(pa.string())))
            .append_column("title", pa.array(title, pa.string()))
            .append_column("nlen", pa.array(nlen, pa.int64())))


@pytest.fixture(scope="module")
def fielded_index(tmp_path_factory, ray_session):
    pages = _fielded_pages()
    d = str(tmp_path_factory.mktemp("schema_idx") / "index")
    build_index(pages, d, BuildConfig(num_parts=4, num_shards=2,
                                      schema=SCHEMA))
    return pages, d


@pytest.fixture(scope="module")
def fielded_oracle(fielded_index):
    pages, _ = fielded_index
    return OracleIndex(pages, num_parts=4, schema=SCHEMA)


FIELD_QUERIES = [
    "w00001 site:site042",                 # keyword AND text
    "w00000 OR site:site007",              # keyword inside an OR group
    "w00002 -site:site042",                # keyword negation
    "w00001 site:site04*",                 # keyword prefix expansion
    "w00000 tags:hot",                     # keyword_list
    "w00000 tags:hot -tags:fresh",         # list AND NOT list
    "w00001 title:page",                   # tokenized secondary field
    "title:t00000029 w00000",              # tokenized exact title token
    "site:site042",                        # pure field query (zero scores)
    "w00001 nlen:0..400",                  # numeric range (spans negatives)
    "w00000 nlen:-200..0",                 # negative-bounded range
    "w00001 nlen:..150",                   # open lower bound
    "w00002 nlen:300..",                   # open upper bound
    "w00000 site_lang:site007|en",         # composite exact
    "w00000 site_lang:site007|*",          # composite prefix (first component)
    "w00001 -site_lang:site042|en",        # composite negation
]


def test_composite_stored_gather(fielded_index):
    _, d = fielded_index
    reader = IndexReader(d)
    hits = search(reader, "site_lang:site007|en", k=5)
    assert hits.num_rows > 0
    got = reader.gather_docs(hits["doc_id"].to_numpy().astype(np.uint64),
                             columns=["site_lang", "lang"])
    for comp, lang in zip(got["site_lang"].to_pylist(), got["lang"].to_pylist()):
        assert comp == f"site007\x1f{lang}" and lang == "en"


def test_numeric_exact_value_matches_oracle(fielded_index, fielded_oracle):
    _, d = fielded_index
    reader = IndexReader(d)
    # pick a real value so the exact-match query is non-empty
    from miru_ray.sources.fixtures import generate_pages
    val = len(generate_pages(3, 4)["text"][0].as_py()) - 600
    q = f"nlen:{val}"
    hits = search(reader, q, k=50)
    oids, _ = fielded_oracle.search(q, k=50)
    assert hits.num_rows > 0
    assert hits["doc_id"].to_pylist() == oids.tolist()


@pytest.mark.parametrize("q", FIELD_QUERIES)
def test_fielded_search_matches_oracle(fielded_index, fielded_oracle, q):
    _, d = fielded_index
    reader = IndexReader(d)
    hits = search(reader, q, k=15)
    oids, oscores = fielded_oracle.search(q, k=15)
    assert hits["doc_id"].to_pylist() == oids.tolist(), q
    np.testing.assert_array_equal(hits["score"].to_numpy(), oscores, err_msg=q)


def test_schema_persisted_in_meta(fielded_index):
    _, d = fielded_index
    reader = IndexReader(d)
    assert [f.name for f in reader.schema.fields] == [
        "site", "tags", "title", "nlen", "site_lang"]
    assert reader.schema.field("nlen").kind == "numeric"
    assert reader.schema.field("site_lang").source == ("site", "lang")
    assert reader.schema.field("site").kind == "keyword"
    assert reader.schema.field("tags").kind == "keyword_list"
    assert reader.schema.field("title").kind == "tokenized"


def test_keyword_field_df_consistency(fielded_index, fielded_oracle):
    """Field-term stats resolve through the same segments as text terms."""
    _, d = fielded_index
    reader = IndexReader(d)
    t = field_term("tags", "hot")
    stats = reader.term_stats([t])
    assert stats[t][0] == fielded_oracle.df(t) > 0
    assert stats[t][0] == stats[t][1]   # set semantics: cf == df


def test_stored_field_gather(fielded_index):
    _, d = fielded_index
    reader = IndexReader(d)
    hits = search(reader, "site:site042", k=5)
    ids = hits["doc_id"].to_numpy().astype(np.uint64)
    got = reader.gather_docs(ids, columns=["url", "site"])
    for url, site in zip(got["url"].to_pylist(), got["site"].to_pylist()):
        assert url.startswith(f"https://{site}."), (url, site)


def test_bare_prefix_never_crosses_namespaces(fielded_index):
    """A text wildcard must not leak field terms (e.g. s* vs site ns)."""
    _, d = fielded_index
    reader = IndexReader(d)
    for t in reader.expand_prefix("", cap=10_000):
        assert not t.startswith("\x00")


def test_field_terms_do_not_score(fielded_index, fielded_oracle):
    """BM25 score comes from text terms only: adding a field filter never
    raises a doc's score, only restricts the candidate set."""
    _, d = fielded_index
    reader = IndexReader(d)
    plain = search(reader, "w00001", k=600)     # k ≥ all matches: full set
    fielded = search(reader, "w00001 tags:hot", k=600)
    base = dict(zip(plain["doc_id"].to_pylist(), plain["score"].to_pylist()))
    for did, s in zip(fielded["doc_id"].to_pylist(), fielded["score"].to_pylist()):
        assert did in base and base[did] == s


def test_schema_validation():
    with pytest.raises(ValueError):
        FieldDef("x", "bogus")
    with pytest.raises(ValueError):
        IndexSchema((FieldDef("a"), FieldDef("a")))
    with pytest.raises(ValueError):
        IndexSchema((FieldDef("text"),))
