from __future__ import annotations

import datetime as dt

from airflow_retail_etl_spark.operators.marts import (
    daily_revenue_summary,
    events_summary,
    funnel_by_dim,
    top_k,
)
from airflow_retail_etl_spark.plans.explain import has_broadcast_join

D1 = dt.date(2019, 10, 1)
D2 = dt.date(2019, 10, 2)


def _events(spark):
    return spark.createDataFrame(
        [
            (D1, "view", 1, 100, 9.99),
            (D1, "view", 1, 101, 9.99),
            (D1, "cart", 1, 100, 9.99),
            (D1, "purchase", 1, 100, 9.99),
            (D2, "purchase", 2, 101, 5.00),  # zero-view day
        ],
        ["event_date", "event_type", "product_id", "user_id", "price"],
    )


def test_daily_revenue_summary_kpis_and_ratios(spark):
    out = {r["event_date"]: r for r in daily_revenue_summary(_events(spark)).collect()}
    d1 = out[D1]
    assert d1["revenue"] == 9.99
    assert d1["unique_users"] == 2
    assert (d1["views"], d1["carts"], d1["purchases"]) == (2, 1, 1)
    assert d1["cart_rate"] == 0.5
    # zero-view day: NULL ratios (SURVEY §4.3.1), not inf
    d2 = out[D2]
    assert d2["views"] == 0 and d2["cart_rate"] is None


def test_funnel_by_dim_broadcasts_and_aggregates(spark):
    dim = spark.createDataFrame(
        [(1, "apple", "electronics"), (2, "acme", "home")],
        ["product_id", "brand", "category_code"],
    )
    out = funnel_by_dim(_events(spark), dim)
    assert has_broadcast_join(out)
    rows = {(r["event_date"], r["brand"]): r for r in out.collect()}
    assert rows[(D1, "apple")]["views"] == 2
    assert rows[(D1, "apple")]["revenue"] == 9.99
    assert rows[(D2, "acme")]["purchases"] == 1


def test_top_k_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 9.0), ("d", 1.0)], ["brand", "revenue"]
    )
    out = top_k(df, "revenue", 3, tiebreak=["brand"]).collect()
    assert [r["brand"] for r in out] == ["c", "a", "b"]


def test_events_summary_filters_and_counts(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2019, 10, 1, 10), "view"),
            (dt.datetime(2019, 10, 1, 11), "view"),
            (dt.datetime(2019, 10, 1, 12), "other"),
            (None, "view"),
        ],
        ["event_time", "event_type"],
    )
    out = events_summary(df, allowed_types=("view", "addtocart")).collect()
    assert len(out) == 1
    assert out[0]["event_count"] == 2


def test_daily_revenue_summary_approx_mode(spark, sf_dir):
    from airflow_retail_etl_spark import adapters
    from airflow_retail_etl_spark.operators import marts

    ev = adapters.staging_events(spark, sf_dir)
    exact = {
        r["event_date"]: r["unique_users"]
        for r in marts.daily_revenue_summary(ev).collect()
    }
    approx = {
        r["event_date"]: r["unique_users"]
        for r in marts.daily_revenue_summary(ev, exact=False).collect()
    }
    assert set(exact) == set(approx)
    for d, n in exact.items():
        # HLL++ default rsd is 5%; allow 3 sigma
        assert abs(approx[d] - n) <= max(3, 0.15 * n), (d, n, approx[d])
    # the approx plan must NOT contain the distinct expand
    plan = marts.daily_revenue_summary(ev, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
