from __future__ import annotations

import pytest

from airflow_retail_etl_spark import quality


@pytest.fixture(scope="module")
def products(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0), (1, "a", 6.0), (2, None, -1.0), (3, "c", 2.0)],
        ["product_id", "brand", "price"],
    )


def test_not_null(products):
    rows = {r["column"]: r for r in quality.check_not_null(products, ["product_id", "brand"]).collect()}
    assert rows["product_id"]["passed"] is True
    assert rows["brand"]["violations"] == 1 and rows["brand"]["passed"] is False


def test_unique_key(products):
    r = quality.check_unique_key(products, ["product_id"]).first()
    assert r["violations"] == 1 and r["passed"] is False


def test_referential(spark, products):
    facts = spark.createDataFrame([(1,), (9,)], ["product_id"])
    r = quality.check_referential(facts, "product_id", products, "product_id").first()
    assert r["violations"] == 1 and r["passed"] is False


def test_in_range_and_run_checks(products):
    report = quality.run_checks(
        [
            quality.check_in_range(products, "price", min_value=0.0),
            quality.check_not_null(products, ["product_id"]),
        ]
    )
    rows = report.collect()
    assert len(rows) == 2
    failed = [r for r in rows if not r["passed"]]
    assert len(failed) == 1 and failed[0]["check"] == "in_range"
