"""JDBC source/sink parity (SURVEY §2.1 S2, §2.2 K1).

The reference reads Postgres with ``pd.read_sql(query, engine)`` — pulling
the FULL result set into one process — and writes with ``to_sql``. The
Spark-native equivalents below keep the transfer distributed:

- ``read_jdbc_query`` pushes the whole query down to the database and reads
  the result through Spark's JDBC source; with ``partition_column`` the read
  is split into ``num_partitions`` parallel range queries.
- ``write_jdbc`` writes partition-parallel batches.

No database (or JDBC driver jar) ships in this environment, so these are
thin, untested-against-a-live-DB wrappers — the point is the shape: at
100 TB you bound JDBC to dimension-sized tables and land facts as files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """SQL-pushdown table scan, optionally range-partitioned."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for key, value in (properties or {}).items():
        reader = reader.option(key, value)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Partition-parallel JDBC write (the reference's ``to_sql`` replace
    semantics map to mode="overwrite" + ``truncate=true``)."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for key, value in (properties or {}).items():
        writer = writer.option(key, value)
    writer.save()
