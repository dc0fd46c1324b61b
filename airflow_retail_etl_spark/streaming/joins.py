"""Stream-stream interval joins (cart → purchase attribution).

Structured Streaming's stream-stream join buffers both sides in state;
without bounds that state grows forever. The attribution join below is
written the way Spark's state-cleanup planner needs it:

- BOTH inputs are watermarked (late rows past the watermark are dropped
  rather than buffered),
- the join predicate carries an explicit EVENT-TIME RANGE
  (cart.ts ∈ [purchase.ts − max_lag, purchase.ts]), which lets the
  engine evict a buffered cart row once the purchase-side watermark
  passes cart.ts + max_lag — state is bounded by max_lag × arrival
  rate, independent of stream length.

The same builder works on BATCH frames (identical logical plan, Catalyst
just skips the stateful operators), which is how the batch≡stream
equivalence is pinned in tests; the batch form's SQL twin is the plain
BETWEEN join the oracle-graded ``range_join`` query already covers.

``left_outer`` emits unattributed purchases with NULL cart columns once
the watermark proves no in-window cart can still arrive (Spark emits
these only at watermark advance — an inner join is eager, outer results
trail by one watermark update)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    carts: DataFrame,
    purchases: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "event_time",
    max_lag: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Every purchase joined to the user's carts within ``max_lag`` before.

    Output: purchase columns prefixed ``p_``, cart columns prefixed
    ``c_``, plus ``lag_seconds``. For streaming inputs both frames must
    already carry watermarks (daily_ingest.stream_events does).
    """
    if how not in ("inner", "left_outer", "leftOuter"):
        raise ValueError(
            f"stream-stream attribution supports inner/left_outer, got {how!r}"
        )
    p = purchases.select(
        *[F.col(c).alias(f"p_{c}") for c in purchases.columns]
    )
    c = carts.select(*[F.col(col).alias(f"c_{col}") for col in carts.columns])
    cond = (
        (F.col(f"p_{user_col}") == F.col(f"c_{user_col}"))
        & (F.col(f"c_{ts_col}") <= F.col(f"p_{ts_col}"))
        & (
            F.col(f"c_{ts_col}")
            >= F.col(f"p_{ts_col}") - F.expr(f"INTERVAL {max_lag}")
        )
    )
    return p.join(c, cond, how).withColumn(
        "lag_seconds",
        (
            F.col(f"p_{ts_col}").cast("long")
            - F.col(f"c_{ts_col}").cast("long")
        ),
    )
