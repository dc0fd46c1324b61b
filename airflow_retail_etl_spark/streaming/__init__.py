from airflow_retail_etl_spark.streaming.daily_ingest import (
    hourly_event_counts,
    run_available_now,
    stream_events,
    streaming_dedup,
)

__all__ = [
    "hourly_event_counts",
    "run_available_now",
    "stream_events",
    "streaming_dedup",
]
