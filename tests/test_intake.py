"""App-tier intakes (LogMill / SampleTrawl) + realtime unread delivery.

Reference semantics pinned here:
- LogMill.mill (miru-stumptown-deployable/.../LogMill.java:33-93)
- SampleTrawl.trawl (miru-anomaly-deployable/.../SampleTrawl.java:32-86)
- LabUnreadTrackingIndex applyUnread/applyRead
  (miru-service/.../index/lab/LabUnreadTrackingIndex.java:120-168)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from miru_ray.pipelines.inbox import (UnreadTracker, apply_unread_delta,
                                      inbox_unread, inbox_unread_delta,
                                      unread_counts)
from miru_ray.pipelines.intake import mill_log_batch, trawl_metrics_batch

SF = "/root/testdata/sf0.001"
I64_MIN = np.iinfo(np.int64).min


def test_mill_defaults_and_token_sets():
    t = pa.table({
        "datacenter": ["dc1", None, ""],
        "level": [None, "WARN", ""],
        "message": ["Don't PANIC panic, 42!", None, "a-b a'b"],
        "thrown_stack_trace": [
            ["at Foo.bar(X.java:3)", "at Foo.bar(X.java:3)"], None, []],
    })
    m = mill_log_batch(t)
    # null AND empty both become 'unknown'; level's default is INFO
    assert m["datacenter"].to_pylist() == ["dc1", "unknown", "unknown"]
    assert m["level"].to_pylist() == ["INFO", "WARN", "INFO"]
    # absent columns are all-default
    assert m["host"].to_pylist() == ["unknown"] * 3
    # LogMill.tokenize: split on [^a-zA-Z0-9']+, lowercased, SET semantics
    assert m["message_terms"].to_pylist() == [
        ["42", "don't", "panic"], [], ["a", "a'b", "b"]]
    # stack trace lines tokenize into ONE union set per row
    assert m["stack_terms"].to_pylist() == [
        ["3", "at", "bar", "foo", "java", "x"], [], []]


def test_trawl_bits_sign_and_clamp():
    t = pa.table({
        "path": [["a", "b"], [], ["x", "", "y"], ["z"]],
        "value": pa.array([5, -3, I64_MIN, 0], pa.int64()),
    })
    a = trawl_metrics_batch(t)
    # metric = '>'-joined path; empty path -> 'unknown' (firstNonNull)
    assert a["metric"].to_pylist() == ["a>b", "unknown", "x>>y", "z"]
    bits = a["bits"].to_pylist()
    assert bits[0] == ["+", "0", "2"]            # 5 = 0b101
    assert bits[1] == ["-", "0", "1"]            # -3 -> |3| = 0b11
    # Long.MIN_VALUE clamps to MAX_VALUE: bits 0..62 all set
    assert bits[2] == ["-"] + [str(i) for i in range(63)]
    assert bits[3] == ["+"]                      # zero: sign token only
    # tags = sanitize(path): empties dropped, order kept
    assert a["tags"].to_pylist() == [["a", "b"], [], ["x", "y"], ["z"]]


def test_bits_reconstruct_exact_sum():
    # Anomaly.java:16-60 / SampleTrawl.main identity: for any int64s,
    # sum = Σ⁺ count(bit_i)·2^i − Σ⁻ count(bit_i)·2^i  (exact)
    rng = np.random.RandomState(7)
    v = rng.randint(-10**12, 10**12, size=500).astype(np.int64)
    t = pa.table({"path": [["m"]] * len(v), "value": pa.array(v)})
    a = trawl_metrics_batch(t)
    total = 0
    for row in a["bits"].to_pylist():
        sign = 1 if row[0] == "+" else -1
        total += sign * sum(1 << int(b) for b in row[1:])
    assert total == int(v.astype(object).sum())


def test_unread_delta_matches_bulk(ray_session):
    bulk = inbox_unread(SF).to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    delta = inbox_unread_delta(SF).to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    cols = ["user_id", "n_inbox", "n_unread", "read_ts"]
    pd.testing.assert_frame_equal(bulk[cols], delta[cols])


def _ev(user, typ, ts):
    return {"user_id": user, "event_type": typ, "ts": pd.Timestamp(ts)}


def test_unread_delta_late_mark_clears(ray_session):
    # fold 1: two inbox items; fold 2: a read-mark AFTER both -> both
    # cleared, n_inbox preserved; a third fold's newer item stays unread
    d1 = pa.Table.from_pandas(pd.DataFrame(
        [_ev(1, "click", "2024-01-01"), _ev(1, "click", "2024-01-02")]),
        preserve_index=False)
    d2 = pa.Table.from_pandas(pd.DataFrame(
        [_ev(1, "view", "2024-01-03")]), preserve_index=False)
    d3 = pa.Table.from_pandas(pd.DataFrame(
        [_ev(1, "click", "2024-01-04"), _ev(2, "view", "2024-01-01")]),
        preserve_index=False)
    st = apply_unread_delta(None, d1)
    st = apply_unread_delta(st, d2)
    st = apply_unread_delta(st, d3)
    c = unread_counts(st).to_pandas()
    # user 2 has marks only -> no row (bulk parity)
    assert c["user_id"].tolist() == [1]
    assert c["n_inbox"].tolist() == [3]
    assert c["n_unread"].tolist() == [1]
    assert c["read_ts"].tolist() == [pd.Timestamp("2024-01-03")]


def test_unread_tracker_streaming_matches_bulk(ray_session):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["ts", "user_id", "event_type"])
    tr = UnreadTracker()
    for r in t.to_pandas().sort_values("ts").itertuples():
        tr.apply_event(r.user_id, r.event_type, r.ts)
    bulk = inbox_unread(SF).to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    got = tr.counts().to_pandas()
    pd.testing.assert_frame_equal(got, bulk)


# ---- property tests: vectorized kernels vs pure-python references ----

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

_PY_SPLIT = _re.compile(r"[^a-z0-9']+")


def _py_mill_tokens(msg):
    """LogMill.tokenize reproduced row-wise in plain Python."""
    if msg is None:
        return []
    return sorted({t for t in _PY_SPLIT.split(msg.lower()) if t})


@settings(max_examples=80, deadline=None)
@given(msgs=st.lists(st.one_of(st.none(), st.text(max_size=40)),
                     max_size=12))
def test_mill_tokenize_matches_python(msgs):
    t = pa.table({"message": pa.array(msgs, pa.string())})
    got = mill_log_batch(t)["message_terms"].to_pylist()
    assert got == [_py_mill_tokens(m) for m in msgs]


def _py_bits(v: int) -> list[str]:
    """SampleTrawl.trawl bit tokens reproduced in plain Python."""
    out = ["+" if v >= 0 else "-"]
    mag = v if v >= 0 else (I64_MAX_PY if v == I64_MIN else -v)
    out.extend(str(i) for i in range(64) if (mag >> i) & 1)
    return out


I64_MAX_PY = (1 << 63) - 1


@settings(max_examples=80, deadline=None)
@given(vals=st.lists(st.integers(min_value=I64_MIN,
                                 max_value=I64_MAX_PY), max_size=12))
def test_trawl_bits_match_python(vals):
    t = pa.table({"path": pa.array([["m"]] * len(vals),
                                   pa.list_(pa.string())),
                  "value": pa.array(vals, pa.int64())})
    got = trawl_metrics_batch(t)["bits"].to_pylist()
    assert got == [_py_bits(v) for v in vals]


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10**6), ncut=st.integers(1, 3))
def test_unread_delta_random_streams(seed, ncut):
    # randomized: any event stream + any cut points fold to the bulk state
    rng = np.random.RandomState(seed)
    n = int(rng.randint(20, 300))
    ts0 = pd.Timestamp("2024-01-01").value // 1000
    ts = np.sort(rng.randint(0, 10**9, n)) + ts0
    df = pd.DataFrame({
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.randint(0, 12, n),
        "event_type": rng.choice(["view", "click", "buy"], n,
                                 p=[0.4, 0.4, 0.2]),
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    cuts = np.sort(rng.choice(ts, size=ncut, replace=False))
    state = None
    bounds = [None, *[pd.Timestamp(c, unit="us") for c in cuts], None]
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        m = pd.Series(True, index=df.index)
        if lo is not None:
            m &= df["ts"] >= lo
        if hi is not None:
            m &= df["ts"] < hi
        state = apply_unread_delta(
            state, pa.Table.from_pandas(df[m], preserve_index=False))
    got = unread_counts(state).to_pandas().reset_index(drop=True)
    # bulk reference, computed in plain pandas
    marks = df[df["event_type"] == "view"].groupby("user_id")["ts"].max()
    inbox = df[df["event_type"] != "view"]
    j = inbox.merge(marks.rename("cur"), on="user_id", how="left")
    unread = j["cur"].isna() | (j["ts"] > j["cur"])
    want = (pd.DataFrame({"user_id": j["user_id"], "u": unread})
            .groupby("user_id")
            .agg(n_inbox=("u", "size"), n_unread=("u", "sum"))
            .reset_index())
    want["n_unread"] = want["n_unread"].astype(np.int64)
    want = want.merge(marks.rename("read_ts"), on="user_id", how="left")
    want["read_ts"] = want["read_ts"].astype("datetime64[us]")
    want = want.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "n_inbox", "n_unread", "read_ts"]], want)
