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
backfill: ONE hash exchange by user_id (same partitioning contract as
pipelines/joins.py), cursor + counts computed vectorized per group — no
driver-side state, no broadcast that grows with the user population.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

__all__ = ["inbox_unread"]

_MARK_TYPE = "view"


def _unread_group(g: pd.DataFrame) -> pd.DataFrame:
    """One user's history: inbox count, unread count past the latest
    read-mark, and the cursor itself (NaT when the user never read)."""
    marks = g[g["side"] == 1]
    inbox = g[g["side"] == 0]
    if inbox.empty:     # users with only read-marks have no inbox rows
        return pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "n_inbox": pd.Series([], dtype=np.int64),
            "n_unread": pd.Series([], dtype=np.int64),
            "read_ts": pd.Series([], dtype="datetime64[us]"),
        })
    its = inbox["ts"].to_numpy().astype("datetime64[us]")
    if marks.empty:
        read_ts = np.datetime64("NaT", "us")
        n_unread = len(inbox)
    else:
        read_ts = marks["ts"].to_numpy().astype("datetime64[us]").max()
        n_unread = int((its > read_ts).sum())
    return pd.DataFrame({
        "user_id": np.array([inbox["user_id"].iloc[0]], dtype=np.int64),
        "n_inbox": np.array([len(inbox)], dtype=np.int64),
        "n_unread": np.array([n_unread], dtype=np.int64),
        "read_ts": np.array([read_ts], dtype="datetime64[us]"),
    })


def inbox_unread(sf_dir: str) -> pa.Table:
    """(user_id, n_inbox, n_unread, read_ts) — per-user inbox size,
    unread count past the read cursor, and the cursor (latest
    read-mark). One column-pruned read, one user-hash exchange."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "user_id", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        side = pc.cast(pc.equal(t["event_type"], _MARK_TYPE), pa.int8())
        return t.select(["ts", "user_id"]).append_column("side", side)

    out = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("user_id").map_groups(_unread_group,
                                            batch_format="pandas"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
