"""Structured Streaming surface (SURVEY §2.10).

The reference's "stream" is a dated file feed consumed in daily batches
(@asset(schedule="@daily"), retail_pipeline_assets.py:34). Spark-native, the
same feed is a file-source stream:

    readStream → watermark(event_time) → tumbling window agg → writeStream

``Trigger.AvailableNow`` reproduces the daily-batch semantics exactly (drain
everything currently in the directory, then stop) while the identical plan
runs continuously in production. The watermark bounds state for late data —
the thing the reference's replace-the-table approach could never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_retail_etl_spark.functions.columns import money_sum


def stream_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    fmt: str = "parquet",
    watermark: str = "1 day",
    ts_col: str = "event_time",
) -> DataFrame:
    """File-source event stream with a late-data watermark.

    Watermarks require TimestampType (LTZ); an NTZ event-time column is cast
    — the identity on wall-clock values under the engine's pinned UTC
    session timezone."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    df = reader.load(path)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def hourly_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "event_time",
    type_col: str = "event_type",
    revenue_col: str | None = None,
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts (+optional revenue) — works on batch AND
    stream frames (same logical plan; Catalyst adds stateful exec only under
    a streaming sink)."""
    aggs = [F.count("*").alias("n_events")]
    if revenue_col is not None:
        aggs.append(money_sum(F.col(revenue_col)).alias("total_value"))
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col(type_col)
        )
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            *[F.col(c) for c in ("n_events",)],
            *([F.col("total_value")] if revenue_col is not None else []),
        )
    )


def streaming_dedup(
    events: DataFrame,
    *,
    id_cols: tuple[str, ...] = ("event_id",),
    within_watermark: bool = True,
) -> DataFrame:
    """Exactly-once-per-key streaming deduplication.

    The streaming complement of ``operators.dedup.exact_dedup``: an
    at-least-once feed (replayed files, retried producers) is reduced to
    one row per key. ``within_watermark=True`` uses
    ``dropDuplicatesWithinWatermark`` — state for a key is EVICTED once the
    watermark passes it, so state size is O(keys per watermark horizon),
    not O(all keys ever): the only shape that runs forever at 100 TB/day.
    The input must already carry a watermark (``stream_events`` sets one).
    ``within_watermark=False`` keeps state for every key seen (exact global
    dedup — bounded feeds / batch frames only, where it equals
    ``dropDuplicates``).
    """
    cols = list(id_cols)
    if within_watermark and events.isStreaming:
        return events.dropDuplicatesWithinWatermark(cols)
    return events.dropDuplicates(cols)


def run_available_now(
    df: DataFrame,
    *,
    checkpoint: str,
    out_path: str | None = None,
    out_format: str = "parquet",
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> None:
    """Drain the stream once (daily-batch semantics) and stop.

    With ``out_path=None`` writes to a noop sink (force full execution);
    with ``out_format="memory"`` ``out_path`` is the in-memory table name
    (observable results for tests — pair with output_mode="complete", since
    append-mode window aggs only emit watermark-expired windows)."""
    writer = (
        df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if out_path is None:
        query = writer.format("noop").start()
    elif out_format == "memory":
        query = writer.format("memory").queryName(out_path).start()
    else:
        query = writer.format(out_format).start(out_path)
    try:
        query.awaitTermination(timeout_sec)
    finally:
        query.stop()
