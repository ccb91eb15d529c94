"""Relational operator family over the TPC-H-ish tables.

Demonstrates the generic operator surface (filter/project/groupby/sort/
limit/broadcast-semi-join) the reference exposes through its filter +
aggregate plugins, in idiomatic Ray Data:

- pricing_summary — scan-heavy partial+final aggregate (the combiner
  pattern from SURVEY.md §4 "Intra-batch parallelism"): per-batch pandas
  groupby → tiny groupby(Sum) — the shuffle moves O(groups) rows/batch.
- top_orders — sort + limit with deterministic tie-break.
- region_orders — bitmap-style semi-join (the reference's term semi-join,
  MiruBitmapsRoaring.orMultiTx / CollaborativeFiltering.java:108-110):
  the small side (region⋈nation⋈customer) is broadcast via ray.put once
  and each batch filters + maps with a numpy lookup — no shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

from miru_ray.sources.tables import read_table

__all__ = ["pricing_summary", "top_orders", "region_orders"]

_CUTOFF = np.datetime64("1998-09-02", "us")


def _q1_partial(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(_CUTOFF)))
    if batch.num_rows == 0:
        return pa.table({c: pa.array([], t) for c, t in [
            ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
            ("sum_qty", pa.float64()), ("sum_base_price_c", pa.int64()),
            ("sum_disc_price_e4", pa.int64()), ("n_rows", pa.int64())]})
    qty = batch["l_quantity"].to_numpy()
    # money in exact integer cents: fp SUM order must never flip a 2dp
    # rounding boundary (decimal inputs ending in .xx5 are common; the
    # SQL oracle sums DECIMALs, which is exact — so must we)
    price_c = np.rint(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    disc_bp = np.rint(batch["l_discount"].to_numpy() * 100).astype(np.int64)
    df = pd.DataFrame({
        "l_returnflag": batch["l_returnflag"].to_numpy(zero_copy_only=False),
        "l_linestatus": batch["l_linestatus"].to_numpy(zero_copy_only=False),
        "qty": qty, "price_c": price_c,
        "disc_price_e4": price_c * (100 - disc_bp),
    })
    g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
        sum_qty=("qty", "sum"), sum_base_price_c=("price_c", "sum"),
        sum_disc_price_e4=("disc_price_e4", "sum"),
        n_rows=("qty", "size")).reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style pricing summary (partial agg → final groupby)."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount", "l_shipdate"])
    out = (ds.map_batches(_q1_partial, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                        Sum("sum_base_price_c", alias_name="sum_base_price_c"),
                        Sum("sum_disc_price_e4", alias_name="sum_disc_price_e4"),
                        Sum("n_rows", alias_name="count_order")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({
        "l_returnflag": t["l_returnflag"],
        "l_linestatus": t["l_linestatus"],
        "sum_qty": pa.array(np.round(t["sum_qty"].to_numpy(), 2), pa.float64()),
        "sum_base_price": pa.array(t["sum_base_price_c"].to_numpy() / 100.0,
                                   pa.float64()),
        "sum_disc_price": pa.array(
            ((t["sum_disc_price_e4"].to_numpy() + 50) // 100) / 100.0,
            pa.float64()),
        "avg_qty": pa.array(np.round(t["sum_qty"].to_numpy()
                                     / t["count_order"].to_numpy(), 6), pa.float64()),
        "count_order": t["count_order"].cast(pa.int64()),
    })


def top_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k orders by totalprice (sort desc, tie-break orderkey asc)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(k)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table({"o_orderkey": t["o_orderkey"].cast(pa.int64()),
                     "o_totalprice": t["o_totalprice"].cast(pa.float64())})


def region_orders(sf_dir: str, region: str = "ASIA") -> pa.Table:
    """(n_name, n_orders, revenue) for customers of one region — broadcast
    semi-join: dims resolved driver-side (tiny), custkey→nation map shipped
    once via ray.put, orders stream through a vectorized lookup."""
    import pyarrow.parquet as pq
    import os
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    rkeys = set(reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"].to_pylist())
    nat_keep = nat.filter(pc.is_in(nat["n_regionkey"],
                                   value_set=pa.array(sorted(rkeys), pa.int64())))
    nation_name = dict(zip(nat_keep["n_nationkey"].to_pylist(),
                           nat_keep["n_name"].to_pylist()))
    cust_keep = cust.filter(pc.is_in(cust["c_nationkey"],
                                     value_set=pa.array(sorted(nation_name), pa.int64())))
    # broadcast: sorted custkey array + aligned nationkey (numpy searchsorted lookup)
    ck = np.array(cust_keep["c_custkey"].to_pylist(), dtype=np.int64)
    nk = np.array(cust_keep["c_nationkey"].to_pylist(), dtype=np.int64)
    order_ = np.argsort(ck)
    lookup_ref = ray.put((ck[order_], nk[order_]))

    def partial(batch: pa.Table) -> pa.Table:
        ck_s, nk_s = ray.get(lookup_ref)
        keys = batch["o_custkey"].to_numpy()
        pos = np.searchsorted(ck_s, keys)
        pos_c = np.minimum(pos, len(ck_s) - 1)
        hit = ck_s[pos_c] == keys
        if not hit.any():
            return pa.table({"n_nationkey": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64()),
                             "revenue_c": pa.array([], pa.int64())})
        price_c = np.rint(batch["o_totalprice"].to_numpy()[hit] * 100).astype(np.int64)
        df = pd.DataFrame({"n_nationkey": nk_s[pos_c[hit]], "price_c": price_c})
        g = df.groupby("n_nationkey", sort=False).agg(
            n_orders=("price_c", "size"), revenue_c=("price_c", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("n_nationkey")
             .aggregate(Sum("n_orders", alias_name="n_orders"),
                        Sum("revenue_c", alias_name="revenue_c")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    names = [nation_name[k] for k in t["n_nationkey"].to_pylist()]
    return pa.table({
        "n_name": pa.array(names, pa.string()),
        "n_orders": t["n_orders"].cast(pa.int64()),
        "revenue": pa.array(t["revenue_c"].to_numpy() / 100.0, pa.float64()),
    })
