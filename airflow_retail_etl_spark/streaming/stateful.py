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
