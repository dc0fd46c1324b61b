"""Bucketed co-located joins: the repeated fact⋈dim join with NO shuffle.

At 100 TB the funnel mart joins fact⋈dim_product every day; bucketing both
tables on the join key at write time makes every subsequent join
exchange-free (SortMergeJoin reads co-located buckets). This test pins that
plan property end-to-end through the session catalog.
"""

from __future__ import annotations

import re

import pytest

from airflow_retail_etl_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def bucketed(spark):
    fact = spark.createDataFrame(
        [(i % 50, f"e{i}", float(i)) for i in range(1000)],
        ["product_id", "event", "price"],
    )
    dim = spark.createDataFrame(
        [(i, f"brand{i % 7}") for i in range(50)], ["product_id", "brand"]
    )
    for name, df in [("b_fact", fact), ("b_dim", dim)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "product_id")
            .sortBy("product_id")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark.table("b_fact"), spark.table("b_dim")
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    fact, dim = bucketed
    # disable auto-broadcast so the test proves bucket co-location, not AQE
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = fact.join(dim, "product_id")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert not re.search(r"(?<!Broadcast)Exchange \(\d+\)", plan), plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_shuffle(spark, bucketed):
    fact, _ = bucketed
    plan = formatted_plan(fact.groupBy("product_id").count())
    assert not re.search(r"(?<!Broadcast)Exchange \(\d+\)", plan), plan
