from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def q():
    return entry.queries()


def test_session_windows_partition_events(spark, sf_dir, q):
    out = q["session_window_stats"](spark, sf_dir)
    n_sessions = out.count()
    n_events = (
        out.agg(F.sum("n_events").alias("s")).collect()[0]["s"]
    )
    ev = entry.load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    assert n_events == ev.count()
    assert 0 < n_sessions <= n_events
    # every session spans >= its gap-closed duration and ends after start
    bad = out.filter(F.col("session_end") <= F.col("session_start"))
    assert bad.count() == 0


def test_session_window_matches_sessionize_count(spark, sf_dir, q):
    # native session_window and the lag/cumsum islands must agree on the
    # number of (user, session) groups at the same 30-minute gap
    native = q["session_window_stats"](spark, sf_dir).count()
    islands = q["sessionize"](spark, sf_dir).count()
    assert native == islands


def test_brand_price_corr_bounded(spark, sf_dir, q):
    rows = q["brand_price_corr"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["corr_qty_price"] is not None:
            assert -1.0 <= r["corr_qty_price"] <= 1.0
        assert r["n_lines"] > 0


def test_compound_growth_index_is_cumulative_product(spark, sf_dir, q):
    rows = q["compound_growth_index"](spark, sf_dir).collect()
    assert len(rows) >= 2
    vals = [r["growth_index"] for r in rows]
    # positive daily revenue ⇒ strictly increasing compounding index
    assert all(b > a for a, b in zip(vals, vals[1:]))
    assert vals[0] > 1.0


def test_reconciliation_statuses_cover_all_days(spark, sf_dir, q):
    out = q["revenue_reconciliation"](spark, sf_dir)
    statuses = {r["status"] for r in out.select("status").distinct().collect()}
    assert statuses <= {
        "matched",
        "mismatch",
        "missing_in_events",
        "missing_in_orders",
    }
    # the day column is unique (full outer on a key keeps one row per day)
    assert (
        out.groupBy("day").count().filter(F.col("count") > 1).count() == 0
    )


def test_matryoshka_recall_monotone_in_dims(spark, sf_dir, q):
    rows = q["matryoshka_recall"](spark, sf_dir).collect()
    ks = [r["k_dims"] for r in rows]
    rec = [r["recall"] for r in rows]
    assert ks == sorted(ks)
    # more prefix dims can only help on average
    assert all(b >= a for a, b in zip(rec, rec[1:]))
    assert all(0.0 <= r <= 1.0 for r in rec)
