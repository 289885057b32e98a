"""Custom stateful streaming operator: applyInPandasWithState.

SURVEY §2.9's escape hatch for session logic beyond the built-ins:
an arbitrary-state sessionizer that tracks per-user open sessions and
emits each session only when it CLOSES (gap exceeded or state timed
out) — something session_window's append mode can't express directly
(it emits per-window aggregates, not close events with custom state).

This mirrors the reference's per-flight state machine shape
(FlightAnalysis.py:134-330): sequential per-key state, updated tick
by tick, emitting an episode row when the episode completes — here
with engine-managed fault-tolerant state instead of a Python dict.

State per user: (session_start_s, last_ts_s, n_events, sum_value).
Emission: one row per closed session.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("session_start_s", DoubleType()),
    StructField("last_ts_s", DoubleType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_s", DoubleType()),
    StructField("session_end_s", DoubleType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _close_sessions(gap_seconds: float, use_timeout: bool):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                s0, last, n, sv = state.get
                closed.append((user_id, s0, last, n, sv))
                state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in OUTPUT_SCHEMA.fields])
            return

        if state.exists:
            s0, last, n, sv = state.get
        else:
            s0 = last = None
            n, sv = 0, 0.0

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts_s")
        for ts_s, value in zip(rows["ts_s"], rows["value"]):
            if s0 is None:
                s0, last, n, sv = ts_s, ts_s, 1, float(value)
            elif ts_s - last > gap_seconds:
                closed.append((user_id, s0, last, n, sv))
                s0, last, n, sv = ts_s, ts_s, 1, float(value)
            else:
                # rows are sorted within a batch only; an out-of-order
                # event ARRIVING in a later micro-batch must extend the
                # open session's bounds monotonically — a bare
                # last = ts_s would rewind the session end, inverting
                # bounds and mis-splitting subsequent events (the event
                # merges into the open session: at-least-once session
                # semantics for arrivals inside the gap)
                s0 = min(s0, ts_s)
                last = max(last, ts_s)
                n += 1
                sv += float(value)
        state.update((s0, last, n, sv))
        if use_timeout:
            state.setTimeoutDuration(int(gap_seconds * 1000))
        yield pd.DataFrame(closed, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return fn


def closed_sessions(
    events: DataFrame, gap_seconds: float = 3600.0, use_timeout: bool = True
) -> DataFrame:
    """events (streaming, with ts timestamp/user_id/value) -> stream
    of CLOSED sessions via applyInPandasWithState.

    use_timeout=True (continuous streams): open sessions flush via a
    processing-time timeout when a user goes quiet. Set False for
    bounded replays (availableNow) — a pending processing-time
    timeout keeps the trigger alive past the last data batch, so
    bounded runs would never terminate; gap-based closes still emit.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col("user_id"),
        F.col("ts").cast("double").alias("ts_s"),
        F.col("value"),
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _close_sessions(gap_seconds, use_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
