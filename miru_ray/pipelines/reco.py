"""Recommendation operator family — the reference's reco/catwalk/strut
plugins re-expressed over the TPC-H-ish tables.

- cf_recommend — the 3-hop collaborative filter
  (miru-reco-plugins/.../reco/CollaborativeFiltering.java:55-213):
  (1) gather my distinct parents (parts I ordered); (2) find other users
  of those parents minus me, top-N contributors by co-occurrence count;
  (3) gather contributors' other parents, scored by contributor weight.
  Users = customers (via orders), docs = lineitems, parents = parts.
  Small sides (my part set, orderkey→custkey map) are broadcast via
  ray.put; the big lineitem scan streams through map_batches. At larger
  scale the orderkey→custkey resolution becomes a partitioned hash join
  (bucket both sides on orderkey) — noted, not needed at sf≤1.
- strut_scores — Catwalk model build + Strut scoring
  (miru-stream-plugins/.../catwalk/Catwalk.java:64-200,
  strut/Strut.java:82-240): per-(label, feature) counts as numerators,
  per-feature totals as denominators, score = numerator/denominator
  (UNIT_WEIGHTED strategy with one feature field).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from miru_ray.functions.rollup import bucketed_sum_rollup
from miru_ray.sources.tables import read_table

__all__ = ["cf_recommend", "strut_scores", "catwalk_model"]


def _orderkey_to_custkey(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """orderkey→custkey lookup, broadcast to every hop task via ray.put.

    Broadcast-size bound: 16 B/order (two int64 columns). TPC-H keeps
    orders at 1.5M rows/SF → 24 MB/SF: ≈ 2.4 GB at SF=100, which still
    fits one object-store copy per node but marks the ceiling. Beyond
    that, replace hops 2/3 with a partitioned hash join: shuffle lineitem
    AND orders by orderkey (ONE co-partitioning reused by both hops),
    join per partition, then the existing partial-agg rollup — the same
    number of all-to-alls as today's broadcast plan, so we defer until a
    corpus actually crosses the bound (VERDICT r1 #6/#8)."""
    import os
    import pyarrow.parquet as pq
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_custkey"])
    ok = orders["o_orderkey"].to_numpy()
    ck = orders["o_custkey"].to_numpy()
    order = np.argsort(ok)
    return ok[order], ck[order]


def cf_recommend(sf_dir: str, custkey: int = 1, n_contributors: int = 20,
                 k: int = 20) -> pa.Table:
    """(p_partkey, score) — parts recommended to ``custkey`` by the 3-hop
    walk; score = Σ contributor co-occurrence weight; top-k by
    (score desc, partkey asc)."""
    ok_s, ck_s = _orderkey_to_custkey(sf_dir)

    # hop 1: my orders → my distinct parts (small; driver-side gather)
    my_orders = ok_s[ck_s == custkey]
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    my_orders_ref = ray.put(np.sort(my_orders))

    def my_parts_batch(t: pa.Table) -> pa.Table:
        mo = ray.get(my_orders_ref)
        keys = t["l_orderkey"].to_numpy()
        pos = np.searchsorted(mo, keys)
        hit = (pos < len(mo)) & (mo[np.minimum(pos, len(mo) - 1)] == keys)
        return pa.table({"l_partkey": pc.unique(pa.array(
            t["l_partkey"].to_numpy()[hit], pa.int64()))})

    my_parts = np.unique(np.concatenate(
        [b["l_partkey"].to_numpy() for b in
         li.map_batches(my_parts_batch, batch_format="pyarrow")
           .iter_batches(batch_format="pyarrow")] or [np.array([], np.int64)]))

    # hop 2: other users of my parts → contributor weights
    lookup_ref = ray.put((ok_s, ck_s, np.sort(my_parts)))

    def contributors_batch(t: pa.Table) -> pa.Table:
        oks, cks, mp = ray.get(lookup_ref)
        pk = t["l_partkey"].to_numpy()
        pos = np.searchsorted(mp, pk)
        hit = (pos < len(mp)) & (mp[np.minimum(pos, len(mp) - 1)] == pk)
        if not hit.any():
            return pa.table({"custkey": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        okk = t["l_orderkey"].to_numpy()[hit]
        cust = cks[np.searchsorted(oks, okk)]
        keep = cust != custkey
        df = pd.DataFrame({"custkey": cust[keep]})
        g = df.groupby("custkey", sort=False).size().reset_index(name="w")
        return pa.Table.from_pandas(g, preserve_index=False)

    contrib = bucketed_sum_rollup(
        li.map_batches(contributors_batch, batch_format="pyarrow"),
        keys=["custkey"], val_cols=["w"]).to_pandas()
    contrib = contrib.sort_values(["w", "custkey"],
                                  ascending=[False, True]).head(n_contributors)
    cw = dict(zip(contrib["custkey"].astype(int), contrib["w"].astype(int)))

    # hop 3: contributors' other parts, scored by contributor weight over
    # DISTINCT (contributor, part) pairs (CollaborativeFiltering.java:197
    # subtracts my parents; distinct parents per contributor)
    hop3_ref = ray.put((ok_s, ck_s, np.sort(np.array(sorted(cw), dtype=np.int64)),
                        np.sort(my_parts)))

    def pairs_batch(t: pa.Table) -> pa.Table:
        oks, cks, cs, mp = ray.get(hop3_ref)
        okk = t["l_orderkey"].to_numpy()
        cust = cks[np.searchsorted(oks, okk)]
        pos = np.searchsorted(cs, cust)
        is_contrib = (pos < len(cs)) & (cs[np.minimum(pos, len(cs) - 1)] == cust)
        pk = t["l_partkey"].to_numpy()
        ppos = np.searchsorted(mp, pk)
        not_mine = ~((ppos < len(mp)) & (mp[np.minimum(ppos, len(mp) - 1)] == pk))
        keep = is_contrib & not_mine
        df = pd.DataFrame({"custkey": cust[keep], "p_partkey": pk[keep]})
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    pairs = (li.map_batches(pairs_batch, batch_format="pyarrow")
               .to_pandas().drop_duplicates())
    pairs["score"] = pairs["custkey"].map(cw).astype(np.int64)
    scores = (pairs.groupby("p_partkey")["score"].sum().reset_index()
              .sort_values(["score", "p_partkey"], ascending=[False, True])
              .head(k))
    return pa.table({"p_partkey": pa.array(scores["p_partkey"].to_numpy(), pa.int64()),
                     "score": pa.array(scores["score"].to_numpy(), pa.int64())})


def catwalk_model(sf_dir: str, top_n: int = 5) -> pa.Table:
    """(event_type, user_id, n) — Catwalk model build: grouped feature
    co-occurrence counts with top-N values kept per label
    (miru-stream-plugins/.../catwalk/Catwalk.java:64-200: numerator counts
    per feature-value, top-N per feature). Partial counts per batch →
    small groupby sum → per-label top-N (count desc, user_id asc)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy()})
        g = df.groupby(["event_type", "user_id"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = bucketed_sum_rollup(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["event_type", "user_id"], val_cols=["n"],
        bucket_key="user_id").to_pandas()
    out = (out.sort_values(["event_type", "n", "user_id"],
                           ascending=[True, False, True])
              .groupby("event_type", sort=True).head(top_n))
    return pa.table({"event_type": pa.array(out["event_type"].tolist(), pa.string()),
                     "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                     "n": pa.array(out["n"].to_numpy(), pa.int64())})


def strut_scores(sf_dir: str, label: str = "purchase", k: int = 50) -> pa.Table:
    """(user_id, score) — Strut UNIT_WEIGHTED: score(user) = numerator /
    denominator with numerator = #events of user with event_type == label,
    denominator = #events of user. Top-k by (score desc, user_id asc),
    rounded to 6 dp."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(),
            "num": (t["event_type"].to_numpy(zero_copy_only=False) == label).astype(np.int64),
        })
        g = df.groupby("user_id", sort=False).agg(
            num=("num", "sum"), den=("num", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = bucketed_sum_rollup(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["user_id"], val_cols=["num", "den"]).to_pandas()
    out["score"] = np.round(out["num"] / out["den"], 6)
    out = out.sort_values(["score", "user_id"], ascending=[False, True]).head(k)
    return pa.table({"user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                     "score": pa.array(out["score"].to_numpy(), pa.float64())})
