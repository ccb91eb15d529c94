"""Inbox / unread-tracking family — the reference's per-stream special
indexes re-expressed as one co-partitioned pass over the event log.

Semantics ported (not code): MiruInboxIndex keeps a per-streamId doc set
(miru-plugin/.../index/MiruInboxIndex.java), MiruUnreadTrackingIndex
keeps the unread subset and ``applyRead(streamId, ts)`` clears everything
at-or-before the read watermark (MiruUnreadTrackingIndex.java;
miru-service/.../index/lab/LabUnreadTrackingIndex.java), and the
backfillerizer rebuilds both in bulk from the read-tracking WAL
(miru-plugin/.../backfill/MiruJustInTimeBackfillerizer.java:40-101).

Mapping onto the driver's ``events`` table: a user's INBOX is their
non-'view' events (the activity stream); their READ-MARKS are their
'view' events (the read-tracking WAL analog); the read CURSOR is the
latest mark, and an inbox item is UNREAD iff it is strictly newer than
the cursor (no marks → everything unread). ``inbox_unread`` is the bulk
backfill: ONE hash exchange keyed on ``user_id % B`` BUCKETS (not raw
user ids — Ray's per-group overhead is ~ms/group, measured 45 s at 15k
groups elsewhere in this repo), with the per-bucket kernel entirely on
pandas C paths (groupby max/size/sum + one merge) — no Python loop over
users, no driver-side state, no broadcast that grows with the user
population.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from miru_ray.sources.tables import read_table

__all__ = ["inbox_unread", "apply_unread_delta", "unread_counts",
           "inbox_unread_delta", "UnreadTracker"]

_MARK_TYPE = "view"
_BUCKETS = 64


def _tag_bucket(t: pa.Table) -> pa.Table:
    """Append the user-hash exchange key — THE partitioning rule for all
    inbox state and reduces (one definition; fold and counts must agree)."""
    b = t["user_id"].to_numpy() % _BUCKETS
    return t.append_column("bucket", pa.array(b, pa.int64()))


def _unread_bucket_group(g: pd.DataFrame) -> pd.DataFrame:
    """One user-bucket: per-user inbox count, unread count past the
    latest read-mark, and the cursor itself (NaT when the user never
    read). All-C pandas ops; users with only read-marks emit no row."""
    marks = g[g["side"] == 1]
    inbox = g[g["side"] == 0]
    if inbox.empty:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "n_inbox": pd.Series([], dtype=np.int64),
            "n_unread": pd.Series([], dtype=np.int64),
            "read_ts": pd.Series([], dtype="datetime64[us]"),
        })
    cur = marks.groupby("user_id")["ts"].max().rename("read_ts")
    j = inbox[["user_id", "ts"]].merge(cur, on="user_id", how="left")
    unread = j["read_ts"].isna() | (j["ts"] > j["read_ts"])
    agg = (pd.DataFrame({"user_id": j["user_id"], "unread": unread})
           .groupby("user_id", sort=True)
           .agg(n_inbox=("unread", "size"), n_unread=("unread", "sum"))
           .reset_index())
    agg = agg.merge(cur, on="user_id", how="left")
    return pd.DataFrame({
        "user_id": agg["user_id"].astype(np.int64),
        "n_inbox": agg["n_inbox"].astype(np.int64),
        "n_unread": agg["n_unread"].astype(np.int64),
        "read_ts": agg["read_ts"].astype("datetime64[us]"),
    })


def inbox_unread(sf_dir: str) -> pa.Table:
    """(user_id, n_inbox, n_unread, read_ts) — per-user inbox size,
    unread count past the read cursor, and the cursor (latest
    read-mark). One column-pruned read, one bucketed user-hash
    exchange."""
    ds = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        side = pc.cast(pc.equal(t["event_type"], _MARK_TYPE), pa.int8())
        bucket = t["user_id"].to_numpy() % _BUCKETS
        return (t.select(["ts", "user_id"]).append_column("side", side)
                 .append_column("bucket", pa.array(bucket, pa.int64())))

    out = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("bucket").map_groups(_unread_bucket_group,
                                           batch_format="pandas"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


# --------------------------------------------------- realtime unread deltas
#
# The reference delivers per-event unread updates live: MiruUnreadTracking-
# Index.applyUnread ORs a new doc into the stream's unread bitmap and
# applyRead ANDNOTs everything at-or-before the read watermark
# (miru-service/.../index/lab/LabUnreadTrackingIndex.java:120-168). The
# bulk backfill above rebuilds that state from scratch; the fold below
# maintains it INCREMENTALLY from event deltas, so a 100-TB deployment
# replays only the tail, not the corpus. State rows (one table, hash-
# partitioned by user at scale; parquet-resident between folds):
#
#   kind=0  unread inbox item   (user_id, ts)
#   kind=1  per-user counter    (user_id, ts=read cursor | NaT, n=n_inbox)
#
# Delta rows are tagged kind=2 (new inbox item) / kind=3 (new read-mark)
# and folded per user-bucket: cursors only advance, items never
# resurrect, so folding in any batch split yields the same state as one
# bulk pass (pinned by tests/test_intake.py::test_unread_delta_*).

_STATE_SCHEMA = pa.schema([("user_id", pa.int64()),
                           ("ts", pa.timestamp("us")),
                           ("kind", pa.int8()),
                           ("n", pa.int64())])


def _fold_bucket_group(g: pd.DataFrame) -> pd.DataFrame:
    """Fold one user-bucket of state + delta rows into new state rows.
    All-C pandas ops (groupby max/size/sum, one merge)."""
    cur_rows = g[g["kind"].isin((1, 3))].dropna(subset=["ts"])
    cur = cur_rows.groupby("user_id")["ts"].max()
    base = g[g["kind"] == 1].groupby("user_id")["n"].sum()
    new_n = g[g["kind"] == 2].groupby("user_id").size()
    n_inbox = base.add(new_n, fill_value=0).astype(np.int64)
    items = g[g["kind"].isin((0, 2))][["user_id", "ts"]]
    j = items.merge(cur.rename("cur"), on="user_id", how="left")
    items = j.loc[j["cur"].isna() | (j["ts"] > j["cur"]),
                  ["user_id", "ts"]]
    users = n_inbox.index.union(
        g.loc[g["kind"].isin((1, 3)), "user_id"].unique())
    counters = pd.DataFrame({
        "user_id": np.asarray(users, dtype=np.int64),
        "ts": cur.reindex(users).astype("datetime64[us]"),
        "kind": np.int8(1),
        "n": n_inbox.reindex(users, fill_value=0).astype(np.int64).to_numpy(),
    })
    item_rows = pd.DataFrame({
        "user_id": items["user_id"].astype(np.int64).to_numpy(),
        "ts": items["ts"].astype("datetime64[us]").to_numpy(),
        "kind": np.int8(0),
        "n": np.int64(0),
    })
    return pd.concat([item_rows, counters], ignore_index=True)


def _counts_from_state(st: pd.DataFrame) -> pd.DataFrame:
    """Per-user counts from folded state rows (one bucket's worth)."""
    counters = st[st["kind"] == 1]
    n_unread = (st[st["kind"] == 0].groupby("user_id").size()
                .rename("n_unread"))
    out = counters.loc[counters["n"] > 0, ["user_id", "ts", "n"]].rename(
        columns={"n": "n_inbox", "ts": "read_ts"})
    out = out.merge(n_unread, on="user_id", how="left")
    out["n_unread"] = out["n_unread"].fillna(0).astype(np.int64)
    out["read_ts"] = out["read_ts"].astype("datetime64[us]")
    return out[["user_id", "n_inbox", "n_unread", "read_ts"]]


def _folded(state, delta, group_fn):
    """state ∪ tagged delta → ONE bucketed user-hash exchange →
    ``group_fn`` per bucket. Shared plumbing for fold and fold+count."""
    import ray.data as rd

    def tag_delta(t: pa.Table) -> pa.Table:
        kind = pc.if_else(pc.equal(t["event_type"], _MARK_TYPE),
                          pa.scalar(3, pa.int8()), pa.scalar(2, pa.int8()))
        if isinstance(kind, pa.ChunkedArray):
            kind = kind.combine_chunks()
        return pa.Table.from_arrays(
            [t["user_id"].combine_chunks(),
             pc.cast(t["ts"], pa.timestamp("us")).combine_chunks(),
             kind, pa.array(np.zeros(len(t), np.int64))],
            schema=_STATE_SCHEMA)

    delta_ds = delta if isinstance(delta, rd.Dataset) \
        else rd.from_arrow(delta)
    rows = delta_ds.map_batches(tag_delta, batch_format="pyarrow")
    if state is not None:
        state_ds = state if isinstance(state, rd.Dataset) \
            else rd.from_arrow(state)
        rows = rows.union(state_ds)

    return (rows.map_batches(_tag_bucket, batch_format="pyarrow")
                .groupby("bucket").map_groups(group_fn,
                                              batch_format="pandas"))


def apply_unread_delta(state, delta):
    """Fold a delta of raw events (Dataset or Table with ts/user_id/
    event_type) into the unread state; ``state=None`` starts empty.
    One bucketed user-hash exchange over state ∪ delta.

    Returns the new state as a LAZY Dataset: folds chain without driver
    materialization (the state is O(unread items) — far too big to
    collect at deployment scale) and execute when consumed. A deployment
    persisting state between jobs writes ``state.write_parquet(dir)``
    (already partitioned by user-hash bucket) and reloads with
    ``read_parquet``; consumers reading one fold twice should
    ``.materialize()`` it themselves."""
    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return _fold_bucket_group(g)

    def fix_schema(t: pa.Table) -> pa.Table:
        return t.select(_STATE_SCHEMA.names).cast(_STATE_SCHEMA)

    return _folded(state, delta, fold).map_batches(
        fix_schema, batch_format="pyarrow")


def unread_counts(state) -> pa.Table:
    """State → the bulk ``inbox_unread`` shape (user_id, n_inbox,
    n_unread, read_ts), rows only for users with inbox items. The
    per-user reduce runs distributed; only the RESULT is collected."""
    import ray.data as rd
    state_ds = state if isinstance(state, rd.Dataset) else rd.from_arrow(state)

    res = (state_ds.map_batches(_tag_bucket, batch_format="pyarrow")
                   .groupby("bucket").map_groups(_counts_from_state,
                                                 batch_format="pandas"))
    df = res.to_pandas().sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def inbox_unread_delta(sf_dir: str,
                       cuts: tuple[str, ...] = ("2024-01-05",
                                                "2024-01-10")) -> pa.Table:
    """The realtime-delivery proof: build unread state from the events
    BEFORE the first cut, then fold each later slice in as a delta —
    the result must equal the bulk backfill (same SQL oracle as
    ``inbox_unread``).

    Topology mirrors the reference deployment: unread state is OWNED by
    a user shard and never moves (LabUnreadTrackingIndex lives inside
    its partition); deltas are routed to shards. So events exchange
    ONCE on the user-hash bucket, and each shard folds its slices
    sequentially in place — per-user state transitions identical to
    cross-job ``apply_unread_delta`` folds (pinned equal in
    tests/test_intake.py), without paying one distributed exchange per
    delta. The per-user count reduce fuses into the same exchange."""
    import pandas as _pd
    cut_ts = [_pd.Timestamp(c) for c in cuts]

    def fold_slices(g: pd.DataFrame) -> pd.DataFrame:
        bounds = [None, *cut_ts, None]
        state = None
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            m = _pd.Series(True, index=g.index)
            if lo is not None:
                m &= g["ts"] >= lo
            if hi is not None:
                m &= g["ts"] < hi
            delta = g.loc[m, ["user_id", "ts", "kind", "n"]]
            state = _fold_bucket_group(
                delta if state is None
                else _pd.concat([state, delta], ignore_index=True))
        return _counts_from_state(state)

    ds = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type"])
    res = _folded(None, ds, fold_slices)
    df = res.to_pandas().sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


class UnreadTracker:
    """Per-event realtime form of the same fold — the actor a live
    deployment would shard by user hash (one tracker per user range;
    Ray actor pool). Single-event appliance of applyUnread/applyRead;
    ``counts()`` matches the bulk backfill exactly
    (tests/test_intake.py::test_unread_tracker_streaming)."""

    def __init__(self):
        self._n_inbox: dict[int, int] = {}
        self._cursor: dict[int, object] = {}
        self._unread: dict[int, list] = {}

    def apply_event(self, user_id: int, event_type: str, ts) -> None:
        if event_type == _MARK_TYPE:
            old = self._cursor.get(user_id)
            if old is None or ts > old:
                self._cursor[user_id] = ts
                items = self._unread.get(user_id)
                if items:
                    self._unread[user_id] = [t for t in items if t > ts]
        else:
            self._n_inbox[user_id] = self._n_inbox.get(user_id, 0) + 1
            cur = self._cursor.get(user_id)
            if cur is None or ts > cur:
                self._unread.setdefault(user_id, []).append(ts)

    def counts(self) -> pa.Table:
        users = sorted(u for u, n in self._n_inbox.items() if n > 0)
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n_inbox": pa.array([self._n_inbox[u] for u in users],
                                pa.int64()),
            "n_unread": pa.array([len(self._unread.get(u, ())) for u in users],
                                 pa.int64()),
            "read_ts": pa.array([self._cursor.get(u) for u in users],
                                pa.timestamp("us")),
        })
