"""Budgeted corpus selection: exact global prefix sums without a global
window.

The training-data use case: "fill a token budget with the best-quality
documents" — rank the corpus by a quality key, take documents until the
cumulative token count crosses the budget. The natural SQL
(``SUM(tokens) OVER (ORDER BY quality DESC)``) collapses to a SINGLE
partition in Spark (WindowExec with an empty partition spec), which is
the textbook driver-shaped bottleneck at 100 TB.

``global_cumsum`` computes the identical exact prefix sum in three
distributed steps:

1. range-repartition on the (total) ordering key — Spark's
   RangePartitioner puts partition i's every row before partition i+1's
   in key order, and the ordering key is made total (unique tiebreak
   column), so ranges are disjoint;
2. one tiny per-partition aggregate (``num_partitions`` rows) whose
   running total — the only sequential step — is a window over those
   few rows, broadcast back as per-partition offsets;
3. a WITHIN-partition cumulative window (partitioned by the range id),
   so no executor ever sees more than its partition.

The result is bit-identical to the single-partition window for exact
value types (integer token counts, DECIMAL money) because addition is
associative there — which is also why the money/metric policy matters:
a DOUBLE value column would make the partition split observable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order: Sequence[Column],
    value_col: str,
    *,
    out_col: str = "cum",
    num_partitions: int = 16,
) -> DataFrame:
    """Annotate ``df`` with the exact running sum of ``value_col`` in
    ``order`` (which must be a TOTAL order — include a unique tiebreak).

    ``num_partitions`` bounds per-executor window size; the sequential
    offset pass touches ``num_partitions`` rows, never data rows.
    """
    part = df.repartitionByRange(num_partitions, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    totals = part.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "__pid",
        F.coalesce(F.sum("__psum").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, F.col("__off") + F.sum(value_col).over(w_in))
        .drop("__pid", "__off")
    )


def budget_select(
    df: DataFrame,
    order: Sequence[Column],
    value_col: str,
    budget: int,
    *,
    cum_col: str = "cum",
    num_partitions: int = 16,
) -> DataFrame:
    """Rows whose running ``value_col`` total (in ``order``) stays within
    ``budget`` — greedy budgeted selection, the distributed form of
    "take the best docs until the token budget is spent"."""
    cum = global_cumsum(
        df, order, value_col, out_col=cum_col, num_partitions=num_partitions
    )
    return cum.filter(F.col(cum_col) <= F.lit(budget))
