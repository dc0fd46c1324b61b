from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.streaming import run_available_now, stream_events
from airflow_retail_etl_spark.streaming.stateful import streaming_attribution

B = dt.datetime(2024, 1, 1, 10, 0, 0)


def _mins(m):
    return B + dt.timedelta(minutes=m)


# (event_id, user, ts, type, value)
EVENTS = [
    (1, 1, _mins(0), "click", 0.0),
    (2, 1, _mins(20), "purchase", 50.0),   # 20min after click → attributed
    (3, 1, _mins(30), "click", 0.0),       # newer click
    (4, 1, _mins(100), "purchase", 70.0),  # 70min after click → NOT attributed
    (5, 2, _mins(5), "purchase", 10.0),    # no click ever → NOT attributed
    (6, 3, _mins(0), "click", 0.0),
    (7, 3, _mins(59), "purchase", 30.0),   # 59min → attributed
]


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("attr") / "events")
    spark.createDataFrame(
        EVENTS, ["event_id", "user_id", "event_time", "event_type", "value"]
    ).write.parquet(path)
    return path


def test_streaming_attribution_matches_batch_rule(spark, event_dir, tmp_path):
    batch = spark.read.parquet(event_dir)
    stream = stream_events(
        spark, event_dir, batch.schema, watermark="10 minutes"
    )
    attr = streaming_attribution(stream, window_minutes=60)
    assert attr.isStreaming
    run_available_now(
        attr,
        checkpoint=str(tmp_path / "ckpt"),
        out_path="attr_out",
        out_format="memory",
        output_mode="append",
    )
    got = {
        (r["user_id"], r["purchase_ts"], r["click_ts"], r["value"])
        for r in spark.table("attr_out").collect()
    }
    assert got == {
        (1, _mins(20), _mins(0), 50.0),
        (3, _mins(59), _mins(0), 30.0),
    }


def test_streaming_attribution_equals_batch_carry_forward(
    spark, event_dir, tmp_path
):
    # the batch twin: carry-forward max click-ts window, purchase within 1h
    from pyspark.sql import Window

    batch = spark.read.parquet(event_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_time", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("event_time"))
    ).over(w)
    expected = {
        (r["user_id"], r["event_time"], r["last_click"], r["value"])
        for r in batch.withColumn("last_click", last_click)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click").isNotNull()
            & (
                F.col("event_time")
                <= F.col("last_click") + F.expr("INTERVAL 1 HOUR")
            )
        )
        .collect()
    }
    stream = stream_events(
        spark, event_dir, batch.schema, watermark="10 minutes"
    )
    run_available_now(
        streaming_attribution(stream, window_minutes=60),
        checkpoint=str(tmp_path / "ckpt2"),
        out_path="attr_out2",
        out_format="memory",
        output_mode="append",
    )
    got = {
        (r["user_id"], r["purchase_ts"], r["click_ts"], r["value"])
        for r in spark.table("attr_out2").collect()
    }
    assert got == expected
