from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, "a", None),
            (3, None, 2.5),
            (4, "b", 2.5),
        ],
        "id long, s string, v double",
    )


def test_profile_values(spark, df):
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 4
    assert (rows["id"]["min_value"], rows["id"]["max_value"]) == ("1", "4")
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["null_frac"] == 0.25
    assert rows["v"]["n_distinct"] == 2
    assert (rows["v"]["min_value"], rows["v"]["max_value"]) == ("1.5", "2.5")


def test_profile_empty_table_null_frac_is_null(spark):
    empty = spark.createDataFrame([], "id long, s string")
    rows = {r["column"]: r for r in profile_table(empty).collect()}
    assert rows["id"]["n_rows"] == 0
    assert rows["id"]["null_frac"] is None   # NULLIF guard, not ANSI error


def test_profile_single_scan(spark, df):
    # one full-table aggregation: the plan must scan the input once
    plan = profile_table(
        df, exact_distinct=False
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") == 1
    # exact multi-distinct rewrites to expand+agg, still one scan
    plan2 = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("ExistingRDD") == 1
    assert "Expand" in plan2


def test_profile_approx_mode(spark, df):
    rows = {
        r["column"]: r
        for r in profile_table(df, exact_distinct=False).collect()
    }
    # HLL on tiny inputs is exact in practice; assert sane bounds
    assert rows["id"]["n_distinct"] >= 3
    assert rows["s"]["n_distinct"] >= 1


def test_profile_subset_and_empty_cols(spark, df):
    assert profile_table(df, ["v"]).count() == 1
    with pytest.raises(ValueError):
        profile_table(df, [])
