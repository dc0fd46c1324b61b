"""Slowly-changing-dimension type-2 history (versioned dimensions).

Complements star.upsert_dim (SCD-1: updates overwrite) with the
warehouse-standard SCD-2 shape: every attribute change opens a new
version row with an effective interval, so facts can join the dimension
AS OF their event time (see operators.temporal.asof_join).

Two construction paths, both pure DataFrame ops:

- :func:`scd2_from_snapshots` — rebuild the full history from a stack of
  dated snapshots. Change detection is per-key ``lag`` over one window
  exchange; interval close is ``lead`` over the same partitioning, which
  Spark plans as a single shuffle (both windows share the key hash).
  Right shape for backfills: cost is one shuffle of the snapshot stack
  regardless of how many days it spans.
- :func:`scd2_upsert` — fold one day's batch into an existing history:
  close changed current rows, insert new versions, pass everything else
  through untouched. One key-hash join + union; the daily incremental
  path. Folding batches through it reproduces scd2_from_snapshots
  exactly (pinned by tests/test_scd.py).

NULL attribute values are compared with null-safe equality (a NULL→value
transition IS a change), matching ``IS DISTINCT FROM`` in the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(attrs: Sequence[str], lagged: dict[str, Column]) -> Column:
    """True iff any attr is (null-safely) distinct from its lagged value."""
    out = F.lit(False)
    for a in attrs:
        out = out | ~F.col(a).eqNullSafe(lagged[a])
    return out


def scd2_from_snapshots(
    snapshots: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    snap_col: str,
) -> DataFrame:
    """Full SCD-2 history from dated snapshots.

    ``snapshots`` must hold at most one row per (keys, snap_col) — pick a
    deterministic survivor first (dedup_keep_first) if the feed has more.
    Output: keys + attrs + (effective_from, effective_to, is_current),
    where effective_to is the NEXT change's date (NULL while current) —
    half-open intervals [from, to).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(snap_col).asc())
    lagged = {a: F.lag(F.col(a)).over(w) for a in attrs}
    # explicit first-row marker: an all-NULL first snapshot must still open
    # a version, and NULL eqNullSafe NULL would hide it
    first_row = F.lag(F.lit(True)).over(w).isNull()
    changes = snapshots.withColumn(
        "__chg", first_row | _changed(attrs, lagged)
    ).filter(F.col("__chg"))
    w2 = Window.partitionBy(*keys).orderBy(F.col(snap_col).asc())
    return changes.select(
        *keys,
        *attrs,
        F.col(snap_col).alias("effective_from"),
        F.lead(F.col(snap_col)).over(w2).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def scd2_current(history: DataFrame) -> DataFrame:
    """The SCD-1 view of an SCD-2 history: current versions only."""
    return history.filter(F.col("is_current")).drop(
        "effective_to", "is_current"
    )


def scd2_upsert(
    history: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    batch_date: Column,
) -> DataFrame:
    """Fold one dated batch into an SCD-2 history.

    ``batch`` holds at most one row per key (the day's final state);
    ``batch_date`` must be strictly later than every effective_from in
    ``history``. Changed keys get their current row closed at
    ``batch_date`` and a new current version; new keys open their first
    version; unchanged keys and closed history pass through untouched.
    """
    key_cols = list(keys)
    cur = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    # presence markers (not attr NULL-checks) so legitimately-NULL
    # attributes can't masquerade as a missing join partner
    b_marked = batch.select(
        *key_cols, *[F.col(a).alias(f"__new_{a}") for a in attrs]
    ).withColumn("__in_batch", F.lit(True))
    joined = cur.join(b_marked, key_cols, "left")
    diff = F.lit(False)
    for a in attrs:
        diff = diff | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))
    change = F.coalesce(F.col("__in_batch"), F.lit(False)) & diff

    closing = joined.filter(change).select(
        *key_cols,
        *attrs,
        F.col("effective_from"),
        batch_date.alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    unchanged_cur = joined.filter(~change).select(
        *key_cols, *attrs, "effective_from", "effective_to", "is_current"
    )

    c_marked = cur.select(
        *key_cols, *[F.col(a).alias(f"__cur_{a}") for a in attrs]
    ).withColumn("__has_cur", F.lit(True))
    opens = batch.join(c_marked, key_cols, "left")
    cur_diff = F.lit(False)
    for a in attrs:
        cur_diff = cur_diff | ~F.col(a).eqNullSafe(F.col(f"__cur_{a}"))
    opening = opens.filter(
        ~F.coalesce(F.col("__has_cur"), F.lit(False)) | cur_diff
    ).select(
        *key_cols,
        *attrs,
        batch_date.alias("effective_from"),
        F.lit(None)
        .cast(history.schema["effective_to"].dataType)
        .alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        closed.unionByName(unchanged_cur)
        .unionByName(closing)
        .unionByName(opening)
    )


def scd2_asof(
    history: DataFrame,
    as_of: Column,
    *,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Point-in-time slice of an SCD-2 history: the version whose
    half-open [effective_from, effective_to) interval covers ``as_of``
    — the time-travel read every versioned dimension exists for.

    A pure filter over the history (at most one row per key survives by
    the SCD-2 invariant): no shuffle, no window — it rides whatever
    layout the history is stored in, and a history partitioned or
    range-clustered on ``effective_from`` (io.write_sorted) prunes at
    the scan. NULL effective_to (the current version) matches any
    as_of ≥ its start.
    """
    return history.filter(
        (F.col(from_col) <= as_of)
        & (F.col(to_col).isNull() | (F.col(to_col) > as_of))
    )
