"""Skew-mitigation operators for hot keys (SURVEY §7.4 scale posture).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py). The
two tools here cover what AQE does not:

- ``salted_agg``: two-phase aggregation for hot GROUP BY keys. Phase 1
  aggregates on (key, salt) — spreading one hot key over ``salt_buckets``
  reducers — phase 2 merges the partials. Algebraic aggregates only
  (count/sum/min/max): their partials compose exactly, so results are
  identical to the unsalted plan.
- ``salted_join``: explodes the small side ``salt_buckets`` times and salts
  the big side's key, so one hot join key lands on many reducers. For when
  the small side is too big to broadcast but the key histogram is spiky.

The salt is derived from stable row content (xxhash64 pmod buckets), not
``rand()`` — deterministic retries, deterministic tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: phase-2 merge function for each phase-1 aggregate
_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from all columns of the row."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)
    ).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output name → (kind, input column) with kind in
    count|sum|min|max. Example::

        salted_agg(events, ["user_id"],
                   {"n": ("count", F.lit(1)),
                    "revenue": ("sum", F.col("price"))})
    """
    phase1_cols = []
    for name, (kind, col) in aggs.items():
        if kind == "count":
            phase1_cols.append(F.count(col).alias(name))
        elif kind == "sum":
            phase1_cols.append(F.sum(col).alias(name))
        elif kind == "min":
            phase1_cols.append(F.min(col).alias(name))
        elif kind == "max":
            phase1_cols.append(F.max(col).alias(name))
        else:
            raise ValueError(f"non-algebraic aggregate: {kind}")
    partial = df.withColumn("__salt", _salt(df, salt_buckets)).groupBy(
        *keys, "__salt"
    ).agg(*phase1_cols)
    merge_cols = [
        _MERGE[kind](F.col(name)).alias(name)
        for name, (kind, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*merge_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Each big-side row gets one salt; each small-side row is exploded into
    all ``salt_buckets`` salts, so the join key becomes (key, salt) and a
    hot key spreads over ``salt_buckets`` reducers. Row multiplicity is
    unchanged — results are exactly the plain join's — for join types that
    preserve only the big (left) side: each big row carries exactly one
    salt, while small-side rows are replicated per salt, so a
    small-side-preserving join (right/full outer) would emit unmatched
    small rows ``salt_buckets`` times. Those types are rejected.
    """
    allowed = {
        "inner", "cross",
        "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r};"
            " right/full outer would replicate unmatched small-side rows"
        )
    big_salted = big.withColumn("__salt", _salt(big, salt_buckets))
    small_salted = small.withColumn(
        "__salt",
        F.explode_outer(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = big_salted.join(small_salted, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame, key_col: str, *, top: int = 10, dp: int = 6
) -> DataFrame:
    """Join/GROUP BY key-skew diagnosis — the report an operator reads
    BEFORE choosing between a plain shuffle, :func:`salted_agg`, or a
    broadcast: the ``top`` heaviest keys with their share of all rows,
    each row annotated with the global histogram shape (distinct keys,
    total rows, max/avg per-key count and their ratio — the skew
    factor; a factor ≫ cores means one reducer owns the job's tail).

    Exact integer counts; the only doubles are three single divisions
    rounded ``dp`` (the ratio policy). Cost: one map-side-combined
    count aggregation, a broadcast one-row global fold, and a
    TakeOrderedAndProject for the top slice (distributed top-k — no
    single-task window). NULL keys count as a key (NULL is a real skew
    source in joins). Returns
    (key, n, share, n_keys, n_rows, max_n, avg_n, skew_factor),
    ordered by (n DESC, key ASC).
    """
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    glob = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
    ).select(
        "n_keys",
        "n_rows",
        "max_n",
        F.round(
            F.col("n_rows").cast("double") / F.col("n_keys").cast("double"),
            dp,
        ).alias("avg_n"),
    )
    # explicit NULLS FIRST: Spark's asc() default — spelled out because
    # the DuckDB oracle must order identically for the LIMIT to pick
    # the same boundary rows (DuckDB defaults to NULLS LAST)
    top_keys = counts.orderBy(
        F.col("n").desc(), F.col("key").asc_nulls_first()
    ).limit(top)
    return top_keys.crossJoin(F.broadcast(glob)).select(
        "key",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("n_rows").cast("double"), dp
        ).alias("share"),
        "n_keys",
        "n_rows",
        "max_n",
        "avg_n",
        F.round(
            F.col("max_n").cast("double") / F.col("avg_n"), dp
        ).alias("skew_factor"),
    ).orderBy(F.col("n").desc(), F.col("key").asc_nulls_first())
