from __future__ import annotations

import datetime as dt

import pytest

from airflow_retail_etl_spark.operators import temporal

B = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes: int) -> dt.datetime:
    return B + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes(spark):
    # (sym, q_ts, px) — the right side of the as-of join
    return spark.createDataFrame(
        [
            ("A", _t(0), 10.0),
            ("A", _t(10), 11.0),
            ("A", _t(20), 12.0),
            ("B", _t(5), 100.0),
        ],
        ["sym", "q_ts", "px"],
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _t(4)),    # → px 10 (q@0)
            (2, "A", _t(10)),   # → px 11 (inclusive: q exactly at ts)
            (3, "A", _t(99)),   # → px 12 (latest)
            (4, "B", _t(4)),    # → NULL (no quote yet)
            (5, "B", _t(6)),    # → px 100
            (6, "C", _t(50)),   # → NULL (no quotes for C at all)
        ],
        ["trade_id", "sym", "ts"],
    )


def test_asof_join_backward_inclusive(trades, quotes):
    out = {
        r["trade_id"]: r["px"]
        for r in temporal.asof_join(
            trades,
            quotes,
            by=["sym"],
            left_ts="ts",
            right_ts="q_ts",
            value_cols=["px"],
        ).collect()
    }
    assert out == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: 100.0, 6: None}


def test_asof_join_carries_multiple_value_cols(trades, quotes):
    q2 = quotes.withColumnRenamed("q_ts", "qt").selectExpr(
        "sym", "qt AS q_ts", "px", "px * 2 AS px2"
    )
    row = (
        temporal.asof_join(
            trades.filter("trade_id = 3"),
            q2,
            by=["sym"],
            left_ts="ts",
            right_ts="q_ts",
            value_cols=["px", "px2"],
        )
        .collect()[0]
    )
    assert (row["px"], row["px2"]) == (12.0, 24.0)


def test_range_join_inner_and_left(spark):
    events = spark.createDataFrame(
        [(1, _t(30)), (2, _t(90)), (3, _t(300))], ["event_id", "ts"]
    )
    windows = spark.createDataFrame(
        [("w1", _t(0), _t(60)), ("w2", _t(60), _t(120)), ("w3", _t(25), _t(35))],
        ["win_id", "w_start", "w_end"],
    )
    inner = {
        (r["event_id"], r["win_id"])
        for r in temporal.range_join(
            events,
            windows,
            left_ts="ts",
            start_col="w_start",
            end_col="w_end",
            bucket="1 hour",
        ).collect()
    }
    # event 1 ∈ w1 and w3 (overlapping windows both match); event 2 ∈ w2
    assert inner == {(1, "w1"), (1, "w3"), (2, "w2")}
    left = temporal.range_join(
        events,
        windows,
        left_ts="ts",
        start_col="w_start",
        end_col="w_end",
        bucket="1 hour",
        how="left",
    )
    rows = left.collect()
    assert len(rows) == 4  # 3 matches + unmatched event 3
    assert {r["event_id"] for r in rows if r["win_id"] is None} == {3}


def test_range_join_rejects_other_how(spark):
    df = spark.createDataFrame([(1, _t(0))], ["i", "ts"])
    w = spark.createDataFrame([("w", _t(0), _t(1))], ["w", "s", "e"])
    with pytest.raises(ValueError):
        temporal.range_join(
            df, w, left_ts="ts", start_col="s", end_col="e", how="full"
        )
