from __future__ import annotations

from airflow_retail_etl_spark.io import (
    compact_partitions,
    save_as_table,
    write_csv,
    write_mart,
    write_partitioned,
)


def test_write_mart_partition_layout(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    wrote = write_mart(df, str(tmp_path), "daily_revenue_summary", "2019-10-05")
    assert wrote
    out = spark.read.parquet(
        str(tmp_path / "aggregates" / "daily_revenue_summary")
    )
    rows = out.collect()
    # partition-column type inference reads dt back as a date
    assert str(rows[0]["dt"]) == "2019-10-05"


def test_write_mart_skips_empty(spark, tmp_path):
    df = spark.createDataFrame([], "id int, v string")
    assert not write_mart(df, str(tmp_path), "m", "2019-10-05")


def test_compact_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2019-10-01", i) for i in range(64)], ["dt", "v"]
    ).repartition(8)
    write_partitioned(df, path)  # 8 writer tasks → up to 8 files
    before = len(list((tmp_path / "t" / "dt=2019-10-01").glob("*.parquet")))
    compact_partitions(spark, path)
    after = len(list((tmp_path / "t" / "dt=2019-10-01").glob("*.parquet")))
    assert after == 1 < before
    assert spark.read.parquet(path).count() == 64


def test_write_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    path = str(tmp_path / "csv_out")
    write_csv(df, path)
    back = spark.read.option("header", True).csv(path)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        ("1", "a"),
        ("2", "b"),
    ]


def test_save_as_table_registers_catalog(spark):
    df = spark.createDataFrame([("2019-10-01", 1)], ["dt", "v"])
    save_as_table(df, "t_catalog_check", partition_by=["dt"])
    try:
        assert spark.catalog.tableExists("t_catalog_check")
        # partition registration: readable via catalog, partition pruned
        assert spark.table("t_catalog_check").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_catalog_check")


def test_dynamic_partition_overwrite_keeps_other_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    d1 = spark.createDataFrame([("2019-10-01", 1), ("2019-10-02", 2)], ["dt", "v"])
    write_partitioned(d1, path)
    # overwrite only dt=2019-10-02 with a new value; 10-01 must survive
    d2 = spark.createDataFrame([("2019-10-02", 99)], ["dt", "v"])
    write_partitioned(d2, path)
    out = {str(r["dt"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert out == {"2019-10-01": 1, "2019-10-02": 99}
