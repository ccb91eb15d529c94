"""ANN index SIP (VERDICT r4 #7): LSH/IVF indexes are segmented per
source file with a stat-validated manifest — an append run (new vector
files) indexes only the new files, leaves prior segment files
byte/stat-untouched, and queries see the union. The base corpus changing
still triggers a full rebuild (IVF additionally retrains its coarse
quantizer only then)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata not present")


def _seg_stats(dirs: list[str]) -> dict[str, tuple[int, int]]:
    out = {}
    for d in dirs:
        for f in sorted(os.listdir(d)):
            p = os.path.join(d, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def _extra_vectors(tmp_path, near_query: bool) -> str:
    """A small extra vector file; when ``near_query`` the planted vector
    is the query vector scaled (cosine 1.0) so any probe must rank it
    first."""
    from miru_ray.pipelines.ann import query_vector
    q = query_vector(SF, 0)
    rng = np.random.default_rng(4242)
    vecs = [(q * 2.0 if near_query else rng.standard_normal(len(q))).tolist()
            for _ in range(5)]
    ids = list(range(10_000_000, 10_000_005))
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float64()))})
    p = str(tmp_path / "extra_vectors.parquet")
    pq.write_table(t, p)
    return p


@pytest.mark.parametrize("index_fn_name", ["lsh_index", "ivf_index"])
def test_append_reuses_base_segments(ray_session, tmp_path, index_fn_name):
    from miru_ray.pipelines import ann
    fn = getattr(ann, index_fn_name)

    def dirs_of(res):
        return res[0] if index_fn_name == "ivf_index" else res

    base_dirs = dirs_of(fn(SF))
    before = _seg_stats(base_dirs)
    assert before, "base build produced no segment files"

    extra = _extra_vectors(tmp_path, near_query=False)
    all_dirs = dirs_of(fn(SF, extra_sources=[extra]))
    assert len(all_dirs) == len(base_dirs) + 1
    # base segment files byte/stat-untouched by the append
    assert {p: s for p, s in _seg_stats(all_dirs).items()
            if p in before} == before
    # idempotent: re-running with the same sources rebuilds nothing
    again = dirs_of(fn(SF, extra_sources=[extra]))
    assert again == all_dirs
    assert {p: s for p, s in _seg_stats(again).items() if p in before} == before


def test_appended_vector_is_queryable(ray_session, tmp_path):
    """A vector appended via a new source file with cosine 1.0 to the
    query must surface at rank 1 through the LSH probe (it hashes to the
    query's own bucket) — and the base-only recall is unchanged."""
    from miru_ray.pipelines import ann
    base = ann.ann_topk_lsh(SF, vec_id=0, k=20)
    extra = _extra_vectors(tmp_path, near_query=True)
    got = ann.ann_topk_lsh(SF, vec_id=0, k=20, extra_sources=[extra])
    ids = got["vec_id"].to_pylist()
    sims = got["sim"].to_pylist()
    assert ids[0] >= 10_000_000 and sims[0] == pytest.approx(1.0)
    # base-only query still matches its pre-append result exactly
    again = ann.ann_topk_lsh(SF, vec_id=0, k=20)
    assert again.equals(base)


def test_ivf_append_keeps_centroids(ray_session, tmp_path):
    """Appends must NOT retrain the coarse quantizer (classic IVF append):
    centroids are byte-identical before and after."""
    from miru_ray.pipelines import ann
    _dirs, cent_before = ann.ivf_index(SF)
    extra = _extra_vectors(tmp_path, near_query=False)
    _dirs2, cent_after = ann.ivf_index(SF, extra_sources=[extra])
    assert np.array_equal(cent_before, cent_after)
    got = ann.ann_topk_ivf(SF, vec_id=0, k=20, extra_sources=[extra])
    assert got.num_rows == 20
