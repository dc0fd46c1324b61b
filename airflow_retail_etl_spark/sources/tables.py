"""Parquet table loaders for the driver testdata (TESTDATA.md).

The testdata writes some timestamp columns as parquet TIMESTAMP(NANOS), which
Spark only reads with ``spark.sql.legacy.parquet.nanosAsLong=true`` — they
arrive as LongType nanoseconds. ``load_table`` rebuilds proper
``timestamp_ntz`` values with exact integer math (``div 1000`` then
``timestamp_micros``), so downstream date/window derivations match an ANSI
oracle bit-for-bit. ``timestamp_ntz`` (not LTZ) is deliberate: the oracle's
TIMESTAMP is wall-clock, and NTZ keeps results independent of session zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_retail_etl_spark.session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns that should be timestamps in every table (whatever physical type
#: the parquet used). Long → assumed ns since epoch; timestamp → cast to ntz.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _normalize_timestamps(df: DataFrame, table: str) -> DataFrame:
    for col_name in _TS_COLS.get(table, ()):
        dtype = dict(df.dtypes).get(col_name)
        if dtype == "bigint":
            # exact: integer floor-div to micros, then epoch-micros → ntz.
            # Session tz is pinned to UTC by configure(), so the cast through
            # TimestampType is the identity on wall-clock values.
            df = df.withColumn(
                col_name,
                F.timestamp_micros(F.expr(f"{col_name} div 1000")).cast(
                    T.TimestampNTZType()
                ),
            )
        elif dtype == "timestamp":
            df = df.withColumn(col_name, F.col(col_name).cast(T.TimestampNTZType()))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with normalized timestamp columns."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    return _normalize_timestamps(df, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql pipelines)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def date_sequence(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar row source (SURVEY §2.1 S3): one row per date, inclusive.

    Reference: ``pd.date_range("2019-10-01","2020-03-31")``
    (retail_pipeline_assets.py:129) → here a lazily-exploded ``sequence`` that
    never touches the driver.
    """
    return spark.sql(
        f"""
        SELECT explode(sequence(to_date('{start}'), to_date('{end}'),
                                interval 1 day)) AS date
        """
    )
