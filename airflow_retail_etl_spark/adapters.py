"""Map the driver's testdata schema onto the engine's retail schema.

Per FIXTURES.md §B, the driver's ``events`` table stands in for
``staging_events``: ``ts→event_time``, ``value→price``, ``props→user_session``
and the JSON key ``k`` inside ``props`` as the surrogate ``product_id``
(it ranges 0..99, a subset of ``part.p_partkey`` 0..1999, so the star join
events⋈part is well-defined). ``part`` stands in for the product dimension
with ``p_brand→brand`` and space-separated ``p_type`` as the category path.

Funnel event-type mapping (driver domain is {view, click, purchase, signup,
error}): view→view, click→cart, purchase→purchase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_retail_etl_spark.sources.tables import load_table

#: Driver-domain funnel literals (view_value, cart_value, purchase_value).
FUNNEL_TYPES = ("view", "click", "purchase")

#: Regex used on BOTH engines to pull the surrogate product key out of props.
PRODUCT_KEY_REGEX = r'"k": (\d+)'


def staging_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → staging_events shape (S1+P4+P5 surface on driver data)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("ts").alias("event_time"),
        F.col("user_id"),
        F.coalesce(F.col("event_type"), F.lit("unknown")).alias("event_type"),
        F.col("value").alias("price"),
        F.coalesce(F.col("props"), F.lit("{}")).alias("user_session"),
        # try_cast: a non-matching props row yields NULL, not an ANSI error
        F.regexp_extract(F.col("props"), PRODUCT_KEY_REGEX, 1)
        .try_cast("bigint")
        .alias("product_id"),
        F.to_date(F.col("ts")).alias("event_date"),
    )


def product_dim_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → product-dimension source columns."""
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("category_code"),
        F.col("p_retailprice").alias("price"),
    )
