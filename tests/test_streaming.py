from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from airflow_retail_etl_spark.sources.tables import load_table
from airflow_retail_etl_spark.streaming import (
    hourly_event_counts,
    run_available_now,
    stream_events,
)


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """Copy a slice of events into a plain-parquet dir (streamable source)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("ts").alias("event_time"),
            "event_type",
            F.col("value").alias("price"),
        )
        .write.parquet(path)
    )
    return path


def test_available_now_matches_batch(spark, event_dir, tmp_path):
    batch = spark.read.parquet(event_dir)
    expected = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in hourly_event_counts(
            batch, revenue_col="price"
        ).collect()
    }

    stream = stream_events(
        spark, event_dir, batch.schema, watermark="2 hours"
    )
    agg = hourly_event_counts(stream, revenue_col="price")
    assert agg.isStreaming
    run_available_now(
        agg,
        checkpoint=str(tmp_path / "ckpt"),
        out_path="hourly_counts",
        out_format="memory",
        output_mode="complete",
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("hourly_counts").collect()
    }
    assert got == expected


def test_append_mode_respects_watermark(spark, event_dir, tmp_path):
    batch = spark.read.parquet(event_dir)
    stream = stream_events(spark, event_dir, batch.schema, watermark="1 hour")
    agg = hourly_event_counts(stream)
    out = str(tmp_path / "out")
    run_available_now(
        agg, checkpoint=str(tmp_path / "ckpt2"), out_path=out
    )
    result = spark.read.parquet(out)
    # append mode emits only watermark-finalized windows: strictly fewer
    # than the full batch result, and none within the watermark horizon
    n_batch = hourly_event_counts(batch).count()
    assert 0 < result.count() < n_batch
    max_emitted = result.agg(F.max("window_start")).first()[0]
    max_event = batch.agg(F.max("event_time")).first()[0]
    assert max_emitted < max_event


def test_streaming_dedup_collapses_replayed_batches(spark, tmp_path):
    import datetime as dt

    from airflow_retail_etl_spark.streaming import streaming_dedup

    b = dt.datetime(2024, 1, 1, 10, 0, 0)
    path = str(tmp_path / "dup_events")
    rows1 = [(1, b), (2, b + dt.timedelta(minutes=1))]
    rows2 = [(2, b + dt.timedelta(minutes=1)),  # exact replay of event 2
             (3, b + dt.timedelta(minutes=2))]
    df1 = spark.createDataFrame(rows1, ["event_id", "event_time"])
    df1.write.mode("append").parquet(path)
    spark.createDataFrame(rows2, ["event_id", "event_time"]).write.mode(
        "append"
    ).parquet(path)

    stream = stream_events(
        spark, path, df1.schema, watermark="10 minutes"
    )
    deduped = streaming_dedup(stream, id_cols=("event_id",))
    assert deduped.isStreaming
    run_available_now(
        deduped,
        checkpoint=str(tmp_path / "ckpt"),
        out_path="dedup_out",
        out_format="memory",
        output_mode="append",
    )
    got = [r["event_id"] for r in spark.table("dedup_out").collect()]
    assert sorted(got) == [1, 2, 3]  # the replayed event 2 emitted once


def test_streaming_dedup_batch_form_equals_drop_duplicates(spark, sf_dir):
    from airflow_retail_etl_spark.streaming import streaming_dedup

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_time", F.col("ts").cast("timestamp")
    )
    doubled = ev.unionByName(ev)
    out = streaming_dedup(doubled, id_cols=("event_id",))
    assert out.count() == ev.select("event_id").distinct().count()


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window runs unchanged under Structured Streaming:
    AvailableNow over the same rows reproduces the batch sessions."""
    src = str(tmp_path / "sess_src")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        # watermarks require TIMESTAMP (not NTZ); session tz is pinned UTC
        # so the cast is stable
        .select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    )
    ev.write.parquet(src)
    batch = spark.read.parquet(src)

    def sessions(df):
        return (
            df.groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("w")
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("s"),
                F.col("w.end").alias("e"),
                "n_events",
            )
        )

    expected = {
        (r["user_id"], r["s"], r["e"]): r["n_events"]
        for r in sessions(batch).collect()
    }

    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(src)
        .withWatermark("ts", "2 hours")
    )
    agg = sessions(stream)
    assert agg.isStreaming
    run_available_now(
        agg,
        checkpoint=str(tmp_path / "sess_ckpt"),
        out_path="session_window_counts",
        out_format="memory",
        output_mode="complete",
    )
    got = {
        (r["user_id"], r["s"], r["e"]): r["n_events"]
        for r in spark.table("session_window_counts").collect()
    }
    assert got == expected
