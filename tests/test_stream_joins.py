from __future__ import annotations

import datetime as dt

import pytest

from airflow_retail_etl_spark.streaming.daily_ingest import (
    run_available_now,
    stream_events,
)
from airflow_retail_etl_spark.streaming.joins import attribute_purchases

B = dt.datetime(2024, 1, 1, 10, 0, 0)


def _feeds(spark, tmp_path):
    carts = [
        (1, 100, B),                                # joins u100's purchase
        (2, 100, B - dt.timedelta(hours=2)),        # too old
        (3, 200, B + dt.timedelta(minutes=30)),     # after purchase → no
        (4, 300, B - dt.timedelta(minutes=59)),     # just inside window
    ]
    purchases = [
        (10, 100, B + dt.timedelta(minutes=5)),
        (11, 200, B),
        (12, 300, B),
        (13, 400, B),                               # user with no cart
    ]
    cdf = spark.createDataFrame(carts, ["event_id", "user_id", "event_time"])
    pdf = spark.createDataFrame(
        purchases, ["event_id", "user_id", "event_time"]
    )
    cpath, ppath = str(tmp_path / "carts"), str(tmp_path / "purchases")
    cdf.write.parquet(cpath)
    pdf.write.parquet(ppath)
    return cdf, pdf, cpath, ppath


EXPECTED_INNER = {(10, 1), (12, 4)}


def test_batch_attribution(spark, tmp_path):
    cdf, pdf, _, _ = _feeds(spark, tmp_path)
    out = attribute_purchases(cdf, pdf, max_lag="1 hour")
    got = {(r.p_event_id, r.c_event_id) for r in out.collect()}
    assert got == EXPECTED_INNER
    lags = {r.p_event_id: r.lag_seconds for r in out.collect()}
    assert lags == {10: 300, 12: 59 * 60}


def test_stream_equals_batch(spark, tmp_path):
    cdf, pdf, cpath, ppath = _feeds(spark, tmp_path)
    cs = stream_events(spark, cpath, cdf.schema, watermark="2 hours")
    ps = stream_events(spark, ppath, pdf.schema, watermark="2 hours")
    joined = attribute_purchases(cs, ps, max_lag="1 hour")
    assert joined.isStreaming
    run_available_now(
        joined,
        checkpoint=str(tmp_path / "ckpt"),
        out_path="attrib_out",
        out_format="memory",
        output_mode="append",
    )
    got = {
        (r.p_event_id, r.c_event_id)
        for r in spark.table("attrib_out").collect()
    }
    assert got == EXPECTED_INNER


def test_invalid_join_type_rejected(spark, tmp_path):
    cdf, pdf, _, _ = _feeds(spark, tmp_path)
    with pytest.raises(ValueError):
        attribute_purchases(cdf, pdf, how="full_outer")
