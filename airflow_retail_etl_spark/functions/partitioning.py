"""Partition-spreading helper for compute-heavy projections.

The HOF-materialization pattern (repartition by id, then run the
lambda-heavy shingle/anchor/n-gram projection on top of the exchange —
see ``operators/dedup._with_shingles``) has a trap of its own:
``df.repartition(col)`` leaves the partition COUNT to the planner, and
AQE's coalescer sizes the exchange by BYTES (64 MB target), blind to
downstream compute. A 1.5 MB corpus collapses to ONE partition, and the
per-character hashing that follows runs on one core of 32 — measured 9×
slower end-to-end on the shared-span anchor scan (8.5 s → 0.9 s at
sf0.1).

``spread`` keeps the materialization barrier but pins an EXPLICIT
partition count (user-specified numPartitions disables AQE coalescing
for that exchange), sized from ``spark.sql.shuffle.partitions`` — 32 in
local tests, the cluster-tuned value in production. Compute-bound stages
want one partition per core regardless of input bytes; IO-bound stages
should keep using plain ``repartition``/AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def spread(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Repartition by ``cols`` with an explicit partition count so AQE
    cannot coalesce the exchange feeding a compute-heavy projection."""
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" or unset — fall back to cores
        n = spark.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def _spread_id(df: DataFrame) -> DataFrame:
    """``df.transform(_spread_id)`` — chainable ``spread(df, "id")``."""
    return spread(df, "id")


def spread_unsplittable(df: DataFrame, *cols: Column | str) -> DataFrame:
    """:func:`spread` ONLY when the source cannot parallelize on its own.

    The guide's unsplittable-input rule (§2.5: one huge gzip/single-
    row-group file → repartition immediately after the read), made
    scale-adaptive instead of unconditional: a compute-heavy projection
    fused into a scan with fewer input splits than half the target
    parallelism runs on 1-of-32 cores locally (every testdata parquet
    has ONE row group — round-15 measurements: the classifier feature
    scans ran as 0.9-1.2 s single-task stages), while the same plan on
    a production table with thousands of splits is already parallel —
    there the exchange would shuffle the whole corpus to buy nothing,
    exactly the local-only win an optimization must not hard-code. The
    split count is read from the physical scan (driver-side planning
    only, no job)."""
    spark = df.sparkSession
    try:
        n_in = df.rdd.getNumPartitions()
    except Exception:  # exotic plan — keep the source layout
        return df
    try:
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        target = spark.sparkContext.defaultParallelism
    if 2 * n_in <= target:
        return spread(df, *cols)
    return df
