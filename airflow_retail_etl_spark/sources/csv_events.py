"""Daily retail-event CSV ingest (SURVEY §2.1 S1/S4, §2.3 P4/P5).

Reference behavior re-expressed Spark-first:

- one-day scan + empty-input abort: retail_pipeline_assets.py:36-43
- audit columns event_date / loaded_at: retail_pipeline_assets.py:27,30,44-45
- null imputation (category_code→'Unknown', brand→'Generic'):
  retail_pipeline_assets.py:26-31
- historical bulk chunked read (pyc …281473178407232): Spark's input-split
  partitioning subsumes pandas ``chunksize`` — one ``read.csv`` of the glob.

Scale notes: explicit schema (no inference pass over 100 TB), the per-day path
is a partition-pruned glob, and the empty guard uses ``df.isEmpty()`` (reads at
most one partition) rather than ``count()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_retail_etl_spark.schemas import EVENT_CSV_SCHEMA

#: Null-imputation defaults (retail_pipeline_assets.py:28-29).
FILL_DEFAULTS = {"category_code": "Unknown", "brand": "Generic"}


class EmptyInputError(ValueError):
    """Raised when a day's feed is empty (retail_pipeline_assets.py:42-43)."""


def _clean(df: DataFrame) -> DataFrame:
    return df.fillna(FILL_DEFAULTS)


def read_events_csv(
    spark: SparkSession, path: str, *, keep_corrupt: bool = False
) -> DataFrame:
    """Bulk CSV scan with the explicit event schema (no inference).

    ``keep_corrupt=True`` adds a ``_corrupt_record`` column (PERMISSIVE
    mode): malformed rows land there with NULL data columns instead of
    silently disappearing — at 100 TB you quarantine and count bad rows,
    never drop them blind. Default keeps the clean schema.
    """
    schema = EVENT_CSV_SCHEMA
    reader = spark.read.option("header", True)
    if keep_corrupt:
        schema = T.StructType(
            list(EVENT_CSV_SCHEMA.fields)
            + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.schema(schema).csv(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a keep_corrupt=True scan.

    Spark refuses to filter on ``_corrupt_record`` referenced alone against
    the raw CSV scan (the parser would have to re-run inconsistently), so
    the parsed frame is cached first — which a quarantining ingest wants
    anyway: both halves are consumed.
    """
    df = df.cache()
    corrupt = F.col("_corrupt_record").isNotNull()
    return (
        df.filter(~corrupt).drop("_corrupt_record"),
        df.filter(corrupt),
    )


def read_day_csv(
    spark: SparkSession,
    root: str,
    date: str,
    *,
    allow_empty: bool = False,
) -> DataFrame:
    """One day's events: scan → empty guard → clean → audit columns.

    Layout: ``{root}/Day_Wise/{date}/event.csv`` (README.md:98-99 of the
    reference). Returns the staging-shaped DataFrame (STAGING_EVENTS_SCHEMA).
    """
    path = f"{root.rstrip('/')}/Day_Wise/{date}/event.csv"
    df = read_events_csv(spark, path)
    if not allow_empty and df.isEmpty():
        raise EmptyInputError(f"no data for {date} at {path}")
    return (
        _clean(df)
        .withColumn("event_date", F.to_date(F.lit(date)))
        .withColumn("loaded_at", F.current_timestamp())
    )
