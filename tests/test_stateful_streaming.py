from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.streaming import run_available_now, stream_events
from airflow_retail_etl_spark.streaming.stateful import streaming_sessionize

B = dt.datetime(2024, 1, 1, 10, 0, 0)


def _mins(m):
    return B + dt.timedelta(minutes=m)

# user 1: two sessions (gap 45min > 30min); user 2: one session
EVENTS = [
    (1, _mins(0)),
    (1, _mins(10)),
    (1, _mins(55)),   # closes session 1 (45min gap), starts session 2
    (1, _mins(60)),
    (2, _mins(5)),
]


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sess") / "events")
    spark.createDataFrame(EVENTS, ["user_id", "event_time"]).write.parquet(path)
    return path


def test_streaming_sessionize_emits_closed_sessions(spark, event_dir, tmp_path):
    batch = spark.read.parquet(event_dir)
    stream = stream_events(
        spark, event_dir, batch.schema, watermark="10 minutes"
    )
    sessions = streaming_sessionize(stream)
    assert sessions.isStreaming
    run_available_now(
        sessions,
        checkpoint=str(tmp_path / "ckpt"),
        out_path="sessions_out",
        out_format="memory",
        output_mode="append",
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_out").collect()
    }
    # the in-batch closed session must be emitted immediately
    assert (1, _mins(0), _mins(10), 2) in got
    # open tails emit only via event-time timeout; the final watermark in a
    # drain-once run is max_ts - 10min, which hasn't passed last+gap → the
    # open sessions stay in state (exactly the streaming semantics we want)
    assert all(r[0] in (1, 2) for r in got)


def test_streaming_sessionize_batch_equivalence_of_closed(spark, event_dir, tmp_path):
    # closed sessions from the stream match the batch window computation
    batch = spark.read.parquet(event_dir)
    w_gap = 30 * 60
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_time")
    flagged = batch.withColumn(
        "new_s",
        F.when(
            F.col("event_time").cast("long")
            - F.lag("event_time").over(w).cast("long")
            > w_gap,
            1,
        ).otherwise(0),
    )
    seq = flagged.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = (
        seq.groupBy("user_id", "sid")
        .agg(
            F.min("event_time").alias("session_start"),
            F.max("event_time").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    # drop each user's last (open) session — those stay in streaming state
    last = sessions.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    closed_batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessions.join(last, "user_id")
        .filter(F.col("sid") < F.col("last_sid"))
        .collect()
    }

    stream = stream_events(
        spark, event_dir, batch.schema, watermark="10 minutes"
    )
    run_available_now(
        streaming_sessionize(stream),
        checkpoint=str(tmp_path / "ckpt2"),
        out_path="sessions_out2",
        out_format="memory",
        output_mode="append",
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_out2").collect()
    }
    assert closed_batch <= got


class _FakeState:
    """Minimal GroupState stand-in for direct unit tests of the session fn."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.timeout = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts


def test_late_in_window_event_moves_session_start_back():
    import pandas as pd

    from airflow_retail_etl_spark.streaming.stateful import _sessionize_fn

    gap_ms = 30 * 60 * 1000
    fn = _sessionize_fn(gap_ms)
    t0 = int(pd.Timestamp("2024-01-01 10:00:00").value // 1_000_000)
    # existing open session [10:00, 10:10] with 2 events
    state = _FakeState((t0, t0 + 10 * 60_000, 2))
    # late event at 09:55 — within watermark, predates the stored start
    late = pd.DataFrame(
        {"event_time": [pd.Timestamp("2024-01-01 09:55:00")]}
    )
    emitted = list(fn((1,), iter([late]), state))
    assert emitted == []  # session stays open — no gap exceeded
    start_ms, last_ms, n = state.get
    assert start_ms == t0 - 5 * 60_000  # start pulled back to 09:55
    assert last_ms == t0 + 10 * 60_000  # end unchanged
    assert n == 3
