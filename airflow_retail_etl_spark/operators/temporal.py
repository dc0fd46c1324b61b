"""Temporal joins Spark lacks as built-ins: as-of and range (interval).

Both are implemented as compositions of existing DataFrame ops chosen for
their 100 TB shape — no per-key loops, no cross joins, no
BroadcastNestedLoop:

- ``asof_join``: union the two sides with a side marker, ONE shuffle on the
  key, one ordered window pass carrying the right side's values forward
  with ``last(ignorenulls)``. Cost is a sort within each key partition —
  the same plan Spark gives any window — regardless of how many left rows
  match each right row. (The naive inequality join is a BroadcastNestedLoop
  that goes quadratic per key.)
- ``range_join``: bucketize time so the interval join becomes an equi-join
  on (key?, bucket): each right interval explodes into the coarse buckets
  it covers, left rows join their single bucket, then the exact BETWEEN
  predicate filters. Work scales with overlap count + interval/bucket
  ratio, not |left|×|right|. Pick ``bucket`` ≈ median interval length.

Both have exact DuckDB twins (ASOF JOIN / BETWEEN join) in the correctness
gate — bit-exact, not rows-only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join: each left row gets the value columns of the
    LATEST right row with ``right_ts <= left_ts`` within its ``by`` group
    (inclusive — a right row exactly at ``left_ts`` matches).

    Right side must be unique per (by, right_ts) — pre-dedup with
    ``dedup_keep_first`` if it isn't; ambiguity there has no well-defined
    as-of semantics (DuckDB's ASOF would pick arbitrarily too).

    Output: all left columns + ``value_cols`` (NULL where no prior right
    row exists).
    """
    by = list(by)
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.col(left_ts).alias("__ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(right_ts).alias("__ts"),
    ).select(*[c for c in l_tagged.columns])  # align column order
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal timestamps (__side 0 < 1),
    # so "at-or-before" is inclusive; last(ignorenulls) carries the most
    # recent right values forward to each left row
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__asof_{c}").alias(c) for c in value_cols
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Interval containment join: left rows ⋈ right intervals with
    ``start <= ts <= end`` (plus optional equi-keys), as a bucketized
    equi-join.

    Each right interval explodes into every coarse time bucket it touches;
    left rows compute their single bucket; the equi-join on
    (by…, bucket) localizes candidates and the exact BETWEEN filter
    finishes. ``how="left"`` keeps unmatched left rows (NULL right
    columns).
    """
    by = list(by)

    def epoch(c: str):
        # NTZ won't cast to double directly; via TIMESTAMP it's the wall
        # clock's epoch seconds under the engine's pinned UTC session tz
        return F.col(c).cast("timestamp").cast("double")

    lb = left.withColumn(
        "__bucket", F.floor(epoch(left_ts) / _bucket_seconds(bucket))
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(epoch(start_col) / _bucket_seconds(bucket)),
                F.floor(epoch(end_col) / _bucket_seconds(bucket)),
            )
        ),
    )
    joined = lb.join(rb, on=by + ["__bucket"], how="inner").filter(
        (F.col(left_ts) >= F.col(start_col))
        & (F.col(left_ts) <= F.col(end_col))
    )
    matched = joined.drop("__bucket")
    if how == "inner":
        return matched
    if how == "left":
        # unmatched = left rows absent from the exact matched result
        right_cols = [c for c in right.columns if c not in by]
        unmatched = left.join(
            matched.select(*left.columns).dropDuplicates(left.columns),
            on=left.columns,
            how="left_anti",
        )
        for c in right_cols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(right.schema[c].dataType)
            )
        return matched.unionByName(unmatched)
    raise ValueError(f"range_join supports inner/left, got {how!r}")


def _bucket_seconds(bucket: str) -> int:
    """'N unit' → seconds (day/hour/minute/second)."""
    n, unit = bucket.split()
    mult = {
        "day": 86_400,
        "days": 86_400,
        "hour": 3_600,
        "hours": 3_600,
        "minute": 60,
        "minutes": 60,
        "second": 1,
        "seconds": 1,
    }[unit.lower()]
    return int(n) * mult
