"""Driver-contract parity: every ``queries()`` entry vs its ``oracle_sql()``
on sf0.01 via DuckDB (exact value equality after the declared rounding) —
the same comparison the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


_SQL = E.oracle_sql()
_QUERIES = E.queries()


@pytest.mark.parametrize("name", sorted(_SQL))
def test_query_matches_oracle(name, con, ray_session):
    res = _QUERIES[name](SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    mine = _norm(pd.DataFrame(res))
    ora = _norm(con.sql(_SQL[name]).df())
    assert list(mine.columns) == list(ora.columns)
    assert len(mine) == len(ora)
    pd.testing.assert_frame_equal(mine, ora, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_SQL)))
def test_rows_only_queries_run(name, ray_session):
    res = _QUERIES[name](SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    assert res is not None
    assert len(res.columns) > 0


def test_entry_smoke(ray_session):
    df = E.entry()
    assert len(df) > 0
    assert {"qid", "doc_id", "rank", "score"} <= set(df.columns)
