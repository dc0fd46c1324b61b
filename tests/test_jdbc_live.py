"""Live JDBC round-trip over embedded Derby (the one JDBC driver on
Spark's stock classpath) — exercises read_jdbc_query's partition-column
range splitting and write_jdbc for real, not just option assembly.

Reference parity: the reference reads Postgres via pd.read_sql
(retail_pipeline_assets.py:71) and writes via to_sql; this proves the
distributed equivalents against an actual JDBC endpoint. Identifier
note: Spark's JDBC writer creates columns with QUOTED (case-sensitive)
names, so queries against standards-strict engines must quote them —
and the derived-table alias must not start with an underscore (Derby
rejects it; the Postgres-only spelling masked both until this test).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.sources.jdbc import (
    jdbc_read_options,
    read_jdbc_query,
    write_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby")
    # keep derby.log out of the repo root
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    url = f"jdbc:derby:{home}/db;create=true"
    props = {"driver": DRIVER}
    src = spark.range(100).selectExpr("id", "id * 2 AS v")
    write_jdbc(src, url, "t1", mode="overwrite", properties=props)
    return url, props


def test_partitioned_range_read_round_trip(spark, derby):
    url, props = derby
    back = read_jdbc_query(
        spark,
        url,
        'SELECT "id", "v" FROM t1 WHERE "v" >= 20',
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        properties=props,
    )
    # the scan really splits into 4 parallel range queries...
    assert back.rdd.getNumPartitions() == 4
    per_part = {
        r["pid"]: r["n"]
        for r in back.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_part) == 4 and all(n > 0 for n in per_part.values())
    # ...and the WHERE pushdown + ranges reassemble the exact result
    assert back.count() == 90
    assert back.agg(F.sum("v")).first()[0] == sum(
        2 * i for i in range(10, 100)
    )


def test_query_pushdown_unpartitioned(spark, derby):
    url, props = derby
    one = read_jdbc_query(
        spark, url, "SELECT COUNT(*) AS n FROM t1", properties=props
    )
    assert one.first()[0] == 100


def test_overwrite_is_replace_not_append(spark, derby):
    url, props = derby
    again = spark.range(50).selectExpr("id", "id * 3 AS v")
    write_jdbc(again, url, "t2", mode="overwrite", properties=props)
    write_jdbc(again, url, "t2", mode="overwrite", properties=props)
    assert read_jdbc_query(
        spark, url, "SELECT COUNT(*) AS n FROM t2", properties=props
    ).first()[0] == 50


def test_partition_options_shape():
    opts = jdbc_read_options(
        "jdbc:derby:memory:x",
        "SELECT 1 AS a FROM t",
        partition_column="a",
        lower_bound=0,
        upper_bound=10,
        num_partitions=3,
    )
    assert opts["dbtable"].endswith("AS spark_jdbc_src")
    assert not opts["dbtable"].split("AS ")[-1].startswith("_")
