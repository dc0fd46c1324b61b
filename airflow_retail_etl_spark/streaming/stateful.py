"""Custom stateful streaming operator: gap-based sessionization.

Spark has no built-in streaming session operator with per-session
aggregates under arbitrary logic, so this is the designed escape hatch
(SURVEY §2.10 mapping): ``applyInPandasWithState`` — per-key state on the
state store, Arrow-batched user code, watermark-driven timeouts.

Semantics (mirror of the batch ``q_sessionize``): events for a user belong
to one session while consecutive gaps are ≤ ``gap``; a longer gap closes
the session. A closed session is emitted as soon as the closing event is
seen; the still-open tail session lives in the state store and is emitted
when the event-time timeout fires (watermark passes last_ts + gap).

Scale: state is one small tuple per active user; shuffle is one exchange on
user_id; batches stream through Arrow. This is exactly the shape that holds
at 1000 executors — no global sort, no unbounded state (timeouts evict).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("closed", T.BooleanType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType(), True),  # epoch ms
        T.StructField("last_ts", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)


def _sessionize_fn(gap_ms: int):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(start_ms: int, end_ms: int, n: int, closed: bool) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "closed": [closed],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n = state.get
                yield emit(start_ms, last_ms, n, True)
                state.remove()
            return

        rows = pd.concat(list(pdfs))
        ts_ms = (
            rows["event_time"].astype("int64") // 1_000_000
        ).sort_values().tolist()

        if state.exists:
            start_ms, last_ms, n = state.get
            # a late in-watermark event may predate the stored session start;
            # pull the start back so the emitted span covers it. (Events that
            # arrive out of order can only extend the open session — a
            # retroactive re-split to match a full batch sort is impossible
            # in append-mode streaming; see tests for the equivalence bound.)
            start_ms = min(start_ms, ts_ms[0])
        else:
            start_ms, last_ms, n = ts_ms[0], ts_ms[0], 0

        for t in ts_ms:
            if t - last_ms > gap_ms:
                yield emit(start_ms, last_ms, n, True)
                start_ms, n = t, 0
            last_ms = max(last_ms, t)
            n += 1

        state.update((start_ms, last_ms, n))
        # event-time timeout: fires when the watermark passes last_ts + gap
        state.setTimeoutTimestamp(last_ms + gap_ms)

    return fn


def streaming_sessionize(
    events: DataFrame,
    *,
    ts_col: str = "event_time",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Sessionize a (watermarked) event stream. Works on batch frames too
    — Catalyst runs the same grouped-map plan without state."""
    prepared = events.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("event_time")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_minutes * 60 * 1000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming last-click attribution (stateful twin of q_funnel_conversion)
# ---------------------------------------------------------------------------

ATTRIBUTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("purchase_ts", T.TimestampType(), True),
        T.StructField("click_ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

ATTR_STATE_SCHEMA = T.StructType(
    [T.StructField("last_click_ms", T.LongType(), True)]
)


def _attribution_fn(window_ms: int, click_type: str, convert_type: str):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # the watermark passed last_click + window: no future purchase
            # can attribute to it — evict so state stays O(active users)
            state.remove()
            return

        rows = pd.concat(list(pdfs)).sort_values(["event_time", "event_id"])
        last_click = state.get[0] if state.exists else None
        out_ts, out_click, out_val = [], [], []
        for _, r in rows.iterrows():
            t_ms = int(pd.Timestamp(r["event_time"]).value // 1_000_000)
            if r["event_type"] == click_type:
                last_click = (
                    t_ms if last_click is None else max(last_click, t_ms)
                )
            elif (
                r["event_type"] == convert_type
                and last_click is not None
                and t_ms - last_click <= window_ms
                and t_ms >= last_click
            ):
                out_ts.append(pd.Timestamp(t_ms, unit="ms"))
                out_click.append(pd.Timestamp(last_click, unit="ms"))
                out_val.append(float(r["value"]))
        if last_click is not None:
            state.update((last_click,))
            state.setTimeoutTimestamp(last_click + window_ms)
        if out_ts:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ts),
                    "purchase_ts": out_ts,
                    "click_ts": out_click,
                    "value": out_val,
                }
            )

    return fn


def streaming_attribution(
    events: DataFrame,
    *,
    ts_col: str = "event_time",
    user_col: str = "user_id",
    window_minutes: int = 60,
    click_type: str = "click",
    convert_type: str = "purchase",
) -> DataFrame:
    """Last-click attribution over a (watermarked) event stream: emit one
    row per conversion within ``window_minutes`` of the user's most
    recent click — the streaming face of the batch carry-forward window
    in ``q_funnel_conversion``.

    State is ONE timestamp per user with a click in flight; the
    event-time timeout evicts it once the watermark passes
    click + window, so state is bounded by concurrently-active users,
    not corpus history. Emission is immediate (append mode) — a
    conversion attributes in the micro-batch that carries it.

    Late/out-of-order semantics (pinned by tests/test_stream_attribution):

    - WITHIN a micro-batch, rows are re-sorted by (event_time, event_id)
      before the state walk, so arbitrary in-batch disorder is invisible:
      stream ≡ batch exactly.
    - ACROSS micro-batches, stream ≡ batch holds whenever each conversion
      is processed in a batch at-or-after the click that should win it —
      the realistic late-click case (click delayed past unrelated events
      but arriving before its conversion) attributes identically, because
      state keeps max(click_ts) regardless of arrival order.
    - The one divergence is retro-emission: a click processed in a LATER
      batch than a conversion it should have attributed cannot emit that
      row (append mode has no retraction); the conversion is dropped
      relative to the batch answer. The watermark bounds the window in
      which this can happen.
    - Rows BELOW the watermark are NOT auto-filtered: unlike windowed
      aggregations, Spark hands applyInPandasWithState all rows and
      leaves late-data policy to the operator (verified on this build).
      A beyond-watermark click therefore still creates/refreshes state —
      but its key's previous state may already be timeout-evicted, so
      results beyond the watermark are arrival-order-dependent.
      Pre-filter ``ts >= watermark`` upstream if determinism beyond the
      watermark matters more than recovering stragglers.
    """
    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("event_time"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _attribution_fn(
            window_minutes * 60 * 1000, click_type, convert_type
        ),
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
