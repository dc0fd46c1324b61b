from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.pipeline import (
    PipelineConfig,
    build_dim_date,
    run_backfill,
    run_day,
)

HEADER = (
    "event_time,event_type,product_id,category_id,category_code,"
    "brand,price,user_id,user_session\n"
)


def _day_rows(date: str, rows: list[tuple[str, int, str, str, float, int]]) -> str:
    body = HEADER
    for t, pid, code, brand, price, uid in rows:
        body += f"{date} {t},{_typ(t)},{pid},9,{code},{brand},{price},{uid},s-{uid}\n"
    return body


def _typ(t: str) -> str:
    # encode event_type in the seconds field for terseness: 00=view 01=cart 02=purchase
    return {"0": "view", "1": "cart", "2": "purchase"}[t[-1]]


@pytest.fixture(scope="module")
def cfg(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("retail")
    raw = root / "raw"
    for date, rows in {
        "2019-10-01": [
            ("10:00:00", 1, "electronics.phone", "apple", 999.0, 1),
            ("10:01:00", 1, "electronics.phone", "apple", 999.0, 2),
            ("10:02:01", 1, "electronics.phone", "apple", 999.0, 1),
            ("10:03:02", 1, "electronics.phone", "apple", 999.0, 1),
            ("11:00:02", 2, "home", "", 19.99, 3),
        ],
        "2019-10-02": [
            ("09:00:00", 1, "electronics.phone", "apple", 999.0, 1),
            ("09:01:01", 3, "", "acme", 5.0, 4),
        ],
    }.items():
        d = raw / "Day_Wise" / date
        d.mkdir(parents=True)
        (d / "event.csv").write_text(_day_rows(date, rows))
    cfg = PipelineConfig(
        raw_root=str(raw),
        warehouse_root=str(root / "wh"),
        mart_root=str(root / "mart"),
        calendar=("2019-10-01", "2019-10-05"),
    )
    run_backfill(spark, cfg, ["2019-10-01", "2019-10-02"])
    build_dim_date(spark, cfg)
    return cfg


def test_staging_partitions(spark, cfg):
    staging = spark.read.parquet(f"{cfg.warehouse_root}/staging_events")
    assert staging.count() == 7
    # imputation applied (empty CSV fields → NULL → defaults)
    assert staging.filter(F.col("brand") == "Generic").count() == 1
    assert staging.filter(F.col("category_code") == "Unknown").count() == 1


def test_fact_partitions_and_revenue(spark, cfg):
    fact = spark.read.parquet(f"{cfg.warehouse_root}/fact_events")
    d1 = fact.filter(F.col("dt") == "2019-10-01")
    total = d1.agg(F.sum("total_revenue")).first()[0]
    assert total == pytest.approx(999.0 + 19.99)


def test_dim_product_split_and_dedup(spark, cfg):
    prod = spark.read.parquet(f"{cfg.warehouse_root}/dim_product").filter(
        F.col("dt") == "2019-10-01"
    )
    rows = {r["product_id"]: r for r in prod.collect()}
    assert rows[1]["category"] == "electronics"
    assert rows[1]["sub_category1"] == "phone"
    assert rows[1]["sub_category2"] == "na"
    assert rows[2]["category"] == "home"
    assert prod.count() == 2


def test_marts_written_per_date(spark, cfg):
    mart = spark.read.parquet(
        f"{cfg.mart_root}/aggregates/daily_revenue_summary"
    )
    by_dt = {str(r["dt"]): r for r in mart.collect()}
    assert by_dt["2019-10-01"]["revenue"] == pytest.approx(1018.99)
    assert (
        by_dt["2019-10-01"]["views"],
        by_dt["2019-10-01"]["carts"],
        by_dt["2019-10-01"]["purchases"],
    ) == (2, 1, 2)
    assert by_dt["2019-10-01"]["unique_users"] == 3
    assert by_dt["2019-10-02"]["purchases"] == 0
    assert by_dt["2019-10-02"]["revenue"] == 0.0


def test_rerun_is_idempotent(spark, cfg):
    before = spark.read.parquet(f"{cfg.warehouse_root}/fact_events").count()
    run_day(spark, cfg, "2019-10-01")  # re-run one date
    after = spark.read.parquet(f"{cfg.warehouse_root}/fact_events").count()
    assert before == after


def test_dim_date_calendar(spark, cfg):
    cal = spark.read.parquet(f"{cfg.warehouse_root}/dim_date")
    assert cal.count() == 5
    r = cal.filter(F.col("date") == dt.date(2019, 10, 1)).first()
    assert (r["weekday"], r["week"]) == (1, 40)  # Tuesday, ISO week 40


def test_build_dims_incremental_snapshots(spark, cfg):
    from airflow_retail_etl_spark.pipeline import build_dims_incremental

    build_dims_incremental(spark, cfg, "2019-10-01")
    build_dims_incremental(spark, cfg, "2019-10-02")
    prod = spark.read.parquet(f"{cfg.warehouse_root}/dim_product_scd")
    latest = prod.filter(F.col("dt") == "2019-10-02")
    # the latest snapshot is the COMPLETE dim: day-1 products survive,
    # day-2 products merged in
    assert {r["product_id"] for r in latest.collect()} == {1, 2, 3}
    day1 = prod.filter(F.col("dt") == "2019-10-01")
    assert {r["product_id"] for r in day1.collect()} == {1, 2}
    # re-running day 2 is idempotent (dynamic partition overwrite)
    build_dims_incremental(spark, cfg, "2019-10-02")
    again = spark.read.parquet(f"{cfg.warehouse_root}/dim_product_scd").filter(
        F.col("dt") == "2019-10-02"
    )
    assert again.count() == 3
    users = spark.read.parquet(f"{cfg.warehouse_root}/dim_user_scd").filter(
        F.col("dt") == "2019-10-02"
    )
    # accumulated (user, session) pairs across both days: day-1 {1,2,3}
    # plus day-2's new user 4 (user 1's pair is unchanged → no dup)
    assert users.count() == 4
