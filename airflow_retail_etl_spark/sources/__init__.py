from airflow_retail_etl_spark.sources.tables import load_table, register_views
from airflow_retail_etl_spark.sources.csv_events import (
    EmptyInputError,
    read_day_csv,
    read_events_csv,
)

__all__ = [
    "load_table",
    "register_views",
    "EmptyInputError",
    "read_day_csv",
    "read_events_csv",
]
