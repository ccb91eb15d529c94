"""Multi-feature Catwalk model + Strut combine strategies (VERDICT r2
next-round #4): the driver entry covers strategy="max"; these tests pin
the remaining finalizeScore strategies (Strut.java:367-395) value-exact
against DuckDB, and the model's top-N-per-feature contract."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con


def _model_sql(top_n: int) -> str:
    import __ray_entry__ as E
    return E._catwalk_multi_sql("purchase", top_n)


@pytest.mark.parametrize("strategy,comb", [
    ("unit_weighted",
     "(CASE WHEN s0 > 0 THEN s0 ELSE 0 END + CASE WHEN s1 > 0 THEN s1 "
     "ELSE 0 END + CASE WHEN s2 > 0 THEN s2 ELSE 0 END) / 3.0"),
    ("regression_weighted",
     "CASE WHEN s0 > 0 THEN s0 ELSE 0 END + CASE WHEN s1 > 0 THEN s1 "
     "ELSE 0 END + CASE WHEN s2 > 0 THEN s2 ELSE 0 END"),
    ("max", "greatest(s0, s1, s2, 0.0)"),
])
def test_strut_strategy_matches_duckdb(strategy, comb, ray_session):
    from miru_ray.pipelines.reco import strut_scores_strategy
    got = strut_scores_strategy(SF, strategy=strategy, k=50).to_pandas()
    sql = _model_sql(50) + f""",
ev AS (
  SELECT event_id, user_id, json_extract(props, '$.k')::BIGINT AS k
  FROM events
),
sc AS (
  SELECT e.event_id,
         COALESCE(m0.numerator::DOUBLE / m0.denominator, 0.0) AS s0,
         COALESCE(m1.numerator::DOUBLE / m1.denominator, 0.0) AS s1,
         COALESCE(m2.numerator::DOUBLE / m2.denominator, 0.0) AS s2
  FROM ev e
  LEFT JOIN model m0 ON m0.feature_id = 0 AND m0.f_user_id = e.user_id
  LEFT JOIN model m1 ON m1.feature_id = 1 AND m1.f_k = e.k
  LEFT JOIN model m2 ON m2.feature_id = 2 AND m2.f_user_id = e.user_id
                     AND m2.f_k = e.k
)
SELECT event_id, round({comb}, 6) AS score
FROM sc ORDER BY {comb} DESC, event_id ASC LIMIT 50
"""
    con = _con()
    want = con.sql(sql).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())


def test_catwalk_multi_topn_and_sentinels(ray_session):
    from miru_ray.pipelines.reco import catwalk_model_multi
    m = catwalk_model_multi(SF, top_n=7).to_pandas()
    # exactly three features, <= top_n rows each
    assert sorted(m["feature_id"].unique()) == [0, 1, 2]
    assert (m.groupby("feature_id").size() <= 7).all()
    # sentinel discipline: F0 has no k, F1 has no user, F2 has both
    assert (m.loc[m.feature_id == 0, "f_k"] == -1).all()
    assert (m.loc[m.feature_id == 1, "f_user_id"] == -1).all()
    assert (m.loc[m.feature_id == 2, ["f_user_id", "f_k"]] != -1).all().all()
    # numerator never exceeds denominator (Catwalk's validity invariant,
    # Catwalk.java:165-175)
    assert (m["numerator"] <= m["denominator"]).all()
    # top-N is by numerator desc within each feature
    for fid, g in m.groupby("feature_id"):
        assert (np.diff(g["numerator"].to_numpy()) <= 0).all()


def test_strut_strategy_unknown_raises(ray_session):
    from miru_ray.pipelines.reco import strut_scores_strategy
    with pytest.raises(ValueError):
        strut_scores_strategy(SF, strategy="nope", k=5)


def test_cf_hop2_plans_value_identical(ray_session, monkeypatch):
    """cf_recommend's hop-2 broadcast-vs-shuffle plan choice must be
    invisible in the result: force the co-partitioned exchange (cutover
    at 0) and compare with the default pushdown plan."""
    from miru_ray.pipelines import reco
    a = reco.cf_recommend(SF, custkey=1, k=20)
    monkeypatch.setattr(reco, "_CF_BROADCAST_MAX_ORDERKEYS", 0)
    b = reco.cf_recommend(SF, custkey=1, k=20)
    assert a.equals(b)
