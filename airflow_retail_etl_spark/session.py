"""SparkSession construction and runtime tuning.

One session per process; every conf here is chosen for the 100 TB posture
(AQE on, dynamic partition overwrite, Arrow transfers) while staying correct
on ``local[*]`` test runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Confs that are safe (and required) to set on an already-running session.
#: - session.timeZone=UTC pins date/timestamp derivations so results match an
#:   ANSI-SQL oracle regardless of host timezone.
#: - nanosAsLong lets Spark read parquet TIMESTAMP(NANOS) columns (the driver
#:   testdata uses them); sources/tables.py rebuilds proper timestamps.
#: - dynamic partition overwrite implements the reference's per-date
#:   "replace" intent (retail_pipeline_assets.py:48) without dropping history.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Recursive CTEs (e.g. the calendar-stepped compound-growth index) do one
    # step per distinct day; Spark's default level limit is 100, which a
    # quarter-over-quarter window already exceeds. Size for multi-decade
    # calendars — the row limit stays a backstop against runaway recursion.
    "spark.sql.cteRecursionLevelLimit": "20000",
    "spark.sql.cteRecursionRowLimit": "10000000",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (e.g. one the driver built).

    Every conf in RUNTIME_CONFS is a runtime SQL conf, so this works after
    ``getOrCreate()``; unknown/immutable confs are skipped rather than fatal.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # immutable on this build — keep going
            pass
    return spark


def get_spark(
    app_name: str = "airflow-retail-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the process-wide session.

    ``shuffle_partitions`` defaults to Spark's 200 under AQE coalescing, which
    is right for a real cluster; tests pass a small value to cut latency.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.config("spark.master", master)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return configure(builder.getOrCreate())
