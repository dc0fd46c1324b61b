"""Data-quality checks (reference README.md:121 left these as a TODO:
"Add Great Expectations or Data Quality checks").

Each check is one aggregation returning a row in a uniform report frame —
run them in a single pass per table, fail the pipeline on `passed=false`
rows. No driver-side loops; a check over 100 TB is the same one-shuffle
aggregation as over 100 rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("check", "column", "violations", "total", "passed")


def _report(
    df: DataFrame, check: str, column: str, violations: Column
) -> DataFrame:
    return df.agg(
        F.lit(check).alias("check"),
        F.lit(column).alias("column"),
        violations.cast("bigint").alias("violations"),
        F.count("*").alias("total"),
        (violations == 0).alias("passed"),
    )


def check_not_null(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """One report row per column: count of NULLs."""
    reports = [
        _report(
            df,
            "not_null",
            c,
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)),
        )
        for c in columns
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out


def check_unique_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Violations = rows beyond the first per key (exact, one shuffle)."""
    dupes = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.col("n") - 1).alias("v"), F.sum("n").alias("t"))
    )
    return dupes.select(
        F.lit("unique_key").alias("check"),
        F.lit(",".join(keys)).alias("column"),
        F.coalesce(F.col("v"), F.lit(0)).cast("bigint").alias("violations"),
        F.col("t").alias("total"),
        (F.coalesce(F.col("v"), F.lit(0)) == 0).alias("passed"),
    )


def check_referential(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Orphan child rows (anti join against the parent key set)."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    # total via a 1-row × 1-row cross join so the whole report stays ONE
    # lazy plan (no driver-side count() action at build time)
    o = orphans.agg(F.count("*").alias("violations"))
    t = child.agg(F.count("*").alias("total"))
    return o.crossJoin(t).select(
        F.lit("referential").alias("check"),
        F.lit(f"{child_key}->{parent_key}").alias("column"),
        F.col("violations").cast("bigint").alias("violations"),
        F.col("total"),
        (F.col("violations") == 0).alias("passed"),
    )


def check_in_range(
    df: DataFrame, column: str, *, min_value=None, max_value=None
) -> DataFrame:
    cond = F.lit(False)
    if min_value is not None:
        cond = cond | (F.col(column) < min_value)
    if max_value is not None:
        cond = cond | (F.col(column) > max_value)
    return _report(
        df, "in_range", column, F.sum(F.when(cond, 1).otherwise(0))
    )


def run_checks(checks: Sequence[DataFrame]) -> DataFrame:
    """Union report frames into one; `.filter("NOT passed")` gates the run."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out
