from __future__ import annotations

import datetime as dt
from collections import Counter

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_retail_etl_spark.operators.scd import scd2_from_snapshots
from airflow_retail_etl_spark.streaming.daily_ingest import stream_events
from airflow_retail_etl_spark.streaming.incremental import scd2_stream_sink

D = dt.date

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("tier", T.StringType()),
        T.StructField("snap_date", T.DateType()),
    ]
)

DAY1 = [(1, "gold", D(2020, 1, 1)), (2, "bronze", D(2020, 1, 1))]
DAY2 = [(1, "silver", D(2020, 1, 2)), (3, "gold", D(2020, 1, 2))]
DAY3 = [(1, "silver", D(2020, 1, 3)), (2, "gold", D(2020, 1, 3))]


def _drain(spark, feed_dir, hist_dir, ckpt_dir):
    stream = (
        spark.readStream.format("parquet").schema(SCHEMA).load(feed_dir)
    )
    q = scd2_stream_sink(
        stream,
        history_path=hist_dir,
        checkpoint=ckpt_dir,
        keys=["user_id"],
        attrs=["tier"],
        snap_col="snap_date",
    )
    q.awaitTermination(120)


def test_streamed_history_equals_batch_rebuild(spark, tmp_path):
    feed = str(tmp_path / "feed")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    for day in (DAY1, DAY2, DAY3):
        spark.createDataFrame(day, SCHEMA).write.mode("append").parquet(feed)
    _drain(spark, feed, hist, ckpt)

    all_snaps = spark.createDataFrame(DAY1 + DAY2 + DAY3, SCHEMA)
    expected = scd2_from_snapshots(
        all_snaps, ["user_id"], ["tier"], "snap_date"
    )
    got = spark.read.parquet(hist)
    assert Counter(map(tuple, got.select(*expected.columns).collect())) == Counter(
        map(tuple, expected.collect())
    )
    cur = {r.user_id: r.tier for r in got.filter("is_current").collect()}
    assert cur == {1: "silver", 2: "gold", 3: "gold"}


def test_second_drain_continues_from_checkpoint(spark, tmp_path):
    feed = str(tmp_path / "feed")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    for day in (DAY1, DAY2):
        spark.createDataFrame(day, SCHEMA).write.mode("append").parquet(feed)
    _drain(spark, feed, hist, ckpt)

    spark.createDataFrame(DAY3, SCHEMA).write.mode("append").parquet(feed)
    _drain(spark, feed, hist, ckpt)  # only DAY3 is new — checkpoint resumes

    all_snaps = spark.createDataFrame(DAY1 + DAY2 + DAY3, SCHEMA)
    expected = scd2_from_snapshots(
        all_snaps, ["user_id"], ["tier"], "snap_date"
    )
    got = spark.read.parquet(hist)
    assert Counter(map(tuple, got.select(*expected.columns).collect())) == Counter(
        map(tuple, expected.collect())
    )
