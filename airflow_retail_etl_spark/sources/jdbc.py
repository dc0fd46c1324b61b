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


def jdbc_read_options(
    url: str,
    query: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Reader options for a pushed-down, optionally range-partitioned scan.

    Spark's JDBC source rejects ``query`` combined with ``partitionColumn``
    ("Options 'query' and 'partitionColumn' can not be specified together"),
    so the partitioned path wraps the query as a ``dbtable`` derived table —
    the documented escape hatch, same pushdown, and Spark appends the
    per-partition range predicates to it. The derived-table alias must not
    start with an underscore: SQL-standard engines (Derby, live-tested in
    tests/test_jdbc_live.py) reject leading-underscore identifiers that
    Postgres happens to tolerate.
    """
    opts: dict[str, str] = {"url": url}
    if partition_column is None:
        opts["query"] = query
    else:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        opts["dbtable"] = f"({query}) AS spark_jdbc_src"
        opts["partitionColumn"] = partition_column
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    opts.update(properties or {})
    return opts


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
    opts = jdbc_read_options(
        url,
        query,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        num_partitions=num_partitions,
        properties=properties,
    )
    return spark.read.format("jdbc").options(**opts).load()


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
