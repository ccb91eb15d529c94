"""Reference query set — 50 deterministic queries (FIXTURES.md §1).

Mirrors the reference's test query construction (random AND-queries over
the fixture dictionary, miru-stream-plugins-test/.../MiruFullTextNGTest.java:215-224)
but deterministic: hot/mid/rare single terms, AND pairs, long ANDs, NOT /
prefix forms, plus time-range and lang-constrained variants.
"""

from __future__ import annotations

import numpy as np

from miru_ray.sources.fixtures import _BASE_TS_US, NEEDLES

__all__ = ["reference_queries"]


def reference_queries(n_rows: int) -> list[dict]:
    """Build the 50-query reference set for a fixture of n_rows pages.

    Returns dicts: {qid, query, time_range: (lo,hi)|None, langs: [..]|None}.
    """
    rng = np.random.default_rng(7)
    qs: list[dict] = []

    def add(query, time_range=None, langs=None):
        qs.append({"qid": len(qs), "query": query,
                   "time_range": time_range, "langs": langs})

    # 20 single-term: hot (zipf head), mid, rare (needles + deep vocab)
    hot = [f"w{i:05d}" for i in range(8)]
    mid = [f"w{i:05d}" for i in (50, 120, 333, 777)]
    rare = [f"w{i:05d}" for i in (3000, 5555, 8200)] + list(NEEDLES.values())[:5]
    for t in hot + mid + rare:
        add(t)
    # 15 AND pairs (hot×mid, mid×rare mixes)
    pool = hot + mid + rare
    for _ in range(15):
        a, b = rng.choice(len(pool), 2, replace=False)
        add(f"{pool[a]} {pool[b]}")
    # 10 long ANDs (3–10 terms)
    for _ in range(10):
        k = int(rng.integers(3, 11))
        picks = rng.choice(30, k, replace=False)
        add(" ".join(f"w{p:05d}" for p in picks))
    # 5 NOT / prefix
    add("w00001 -w00000")
    add("needle31 -w00002")
    add("w012*")
    add("w0001* -w00012")
    add("needle7 OR needle13")

    # constrain a deterministic subset with time-range / lang predicates
    lo = _BASE_TS_US + (n_rows // 4) * 7_000_000
    hi = _BASE_TS_US + (3 * n_rows // 4) * 7_000_000
    for i in range(0, len(qs), 7):
        qs[i]["time_range"] = (lo, hi)
    for i in range(3, len(qs), 11):
        qs[i]["langs"] = ["en", "de"]
    return qs
