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


def _batch_attribution(batch_df, window_expr="INTERVAL 30 MINUTES"):
    """The batch carry-forward rule (last click ≤ window before purchase)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_time", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("event_time"))
    ).over(w)
    return {
        (r["user_id"], r["event_time"], r["last_click"], r["value"])
        for r in batch_df.withColumn("last_click", last_click)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click").isNotNull()
            & (
                F.col("event_time")
                <= F.col("last_click") + F.expr(window_expr)
            )
        )
        .collect()
    }


def _drain_batched(spark, feed, name, ckpt, *, watermark="2 hours",
                   window_minutes=30):
    """Stream `feed` one file per micro-batch (files process in write
    order) through attribution into an in-memory table."""
    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(feed)
        .withColumn("event_time", F.col("event_time").cast("timestamp"))
        .withWatermark("event_time", watermark)
    )
    q = (
        streaming_attribution(stream, window_minutes=window_minutes)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    return {
        (r["user_id"], r["purchase_ts"], r["click_ts"], r["value"])
        for r in spark.table(name).collect()
    }


COLS = ["event_id", "user_id", "event_time", "event_type", "value"]

# Out-of-order arrival plan (event-time minutes, 30-min window, 2h
# watermark so everything below stays in-watermark):
#   user 1: click t0 → batch1, LATE click t20 → batch2, purchase t45 →
#           batch3. Click arrives out of order but before its purchase —
#           stream must attribute to t20 exactly like batch.
#   user 2: purchase t30 → batch1, LATE click t10 → batch2. Retro case:
#           batch attributes, append-mode stream cannot — documented drop.
#   user 3: click t100 → batch1, purchase t110 → batch3 (in order, split
#           across batches) — control, attributes in both.
#   user 4: click t100 and purchase t115 BOTH in batch2 but written
#           purchase-row-first — in-batch disorder, sorted away.
LATE_B1 = [(1, 1, 0, "click", 0.0), (5, 2, 30, "purchase", 10.0),
           (6, 3, 100, "click", 0.0)]
LATE_B2 = [(8, 4, 115, "purchase", 25.0), (7, 4, 100, "click", 0.0),
           (2, 1, 20, "click", 0.0), (4, 2, 10, "click", 0.0)]
LATE_B3 = [(3, 1, 45, "purchase", 40.0), (9, 3, 110, "purchase", 30.0)]


def test_late_in_watermark_clicks_match_batch_except_retro(spark, tmp_path):
    feed = str(tmp_path / "feed")
    for rows in (LATE_B1, LATE_B2, LATE_B3):
        spark.createDataFrame(
            [(i, u, _mins(m), t, v) for i, u, m, t, v in rows], COLS
        ).coalesce(1).write.mode("append").parquet(feed)

    got = _drain_batched(spark, feed, "attr_late", str(tmp_path / "ckpt"))
    expected_batch = _batch_attribution(spark.read.parquet(feed))

    # the only divergence is the retro pair (user 2: click processed
    # after its purchase — append mode cannot retro-emit)
    retro = {(2, _mins(30), _mins(10), 10.0)}
    assert expected_batch == {
        (1, _mins(45), _mins(20), 40.0),   # late click still wins
        (2, _mins(30), _mins(10), 10.0),
        (3, _mins(110), _mins(100), 30.0),
        (4, _mins(115), _mins(100), 25.0),
    }
    assert got == expected_batch - retro


def test_in_batch_disorder_is_invisible(spark, tmp_path):
    # single micro-batch, rows shuffled hard: purchase rows written before
    # the clicks that precede them in event time
    rows = [(4, 7, 25, "purchase", 9.0), (3, 7, 55, "purchase", 11.0),
            (1, 7, 20, "click", 0.0), (2, 7, 40, "click", 0.0),
            (5, 8, 10, "purchase", 5.0)]
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(i, u, _mins(m), t, v) for i, u, m, t, v in rows], COLS
    ).coalesce(1).write.parquet(feed)
    got = _drain_batched(spark, feed, "attr_inb", str(tmp_path / "ckpt"))
    assert got == _batch_attribution(spark.read.parquet(feed))
    assert got == {(7, _mins(25), _mins(20), 9.0),
                   (7, _mins(55), _mins(40), 11.0)}


def test_beyond_watermark_rows_reach_operator_not_autofiltered(
    spark, tmp_path
):
    """Spark does NOT late-filter applyInPandasWithState input: a click
    below the watermark still lands in state and attributes a later
    purchase (verified behavior this build; the docstring's pre-filter
    guidance exists because of exactly this)."""
    feed = str(tmp_path / "feed")
    b1 = [(1, 9, 100, "click", 0.0)]          # watermark → t90 after batch
    b2 = [(2, 5, 80, "click", 0.0),           # below watermark
          (3, 5, 95, "purchase", 42.0)]
    for rows in (b1, b2):
        spark.createDataFrame(
            [(i, u, _mins(m), t, v) for i, u, m, t, v in rows], COLS
        ).coalesce(1).write.mode("append").parquet(feed)
    got = _drain_batched(
        spark, feed, "attr_wm", str(tmp_path / "ckpt"),
        watermark="10 minutes",
    )
    assert got == {(5, _mins(95), _mins(80), 42.0)}


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
