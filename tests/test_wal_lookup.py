"""Cursor-paged range WAL lookup: page contiguity, disjointness, and
the one-page-window edge."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def test_pages_are_contiguous_and_disjoint(ray_session):
    from miru_ray.pipelines.events import _wal_page

    p1 = _wal_page(SF, "2024-01-10", "2024-01-20", 50, None)
    cursor = (p1["ts"].iloc[-1], int(p1["event_id"].iloc[-1]))
    p2 = _wal_page(SF, "2024-01-10", "2024-01-20", 50, cursor)

    con = duckdb.connect()
    want = con.sql(f"""
        SELECT event_id FROM '{SF}/events.parquet'
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        ORDER BY ts, event_id LIMIT 100""").df()["event_id"].tolist()
    got = p1["event_id"].tolist() + p2["event_id"].tolist()
    assert got == want
    assert not set(p1["event_id"]) & set(p2["event_id"])


def test_window_smaller_than_page_yields_empty_page2(ray_session):
    from miru_ray.pipelines.events import wal_range_lookup

    # a one-minute window holds < 50 events at sf0.001 → page 2 empty
    out = wal_range_lookup(SF, t0="2024-01-10", t1="2024-01-10 00:01:00")
    assert out.num_rows == 0
    assert out.column_names == ["event_id", "ts", "user_id", "event_type"]
