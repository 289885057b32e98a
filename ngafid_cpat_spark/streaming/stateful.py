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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

def has_transform_with_state_runtime() -> bool:
    """transformWithStateInPandas ships its own Python driver worker
    that speaks protobuf to the JVM; without the google.protobuf
    package the worker crashes at init (STREAMING_PYTHON_RUNNER_
    INITIALIZATION_FAILURE). Gate callers on this instead of letting
    the stream die mid-start."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_running_totals():
    """Per-user RUNNING totals processor for the Spark 4
    transformWithState API — the successor to applyInPandasWithState:
    typed state handles (ValueState here; ListState/MapState/timers
    available), state schema declared per handle instead of one
    monolithic state struct, and state that outlives any one
    micro-batch.

    Update-mode emission: one (user_id, n_events, sum_cents) row per
    key per batch with the cumulative totals so far — the streaming
    materialized-view shape. Integer cents keep emission values
    bit-portable (same trick as the windowed-count queries). Built by
    a factory so the StatefulProcessor import stays lazy (the
    subclass is pickled to executors whole)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            cents = 0
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            if self._tot.exists():
                prev_n, prev_cents = self._tot.get()
                n += int(prev_n)
                cents += int(prev_cents)
            self._tot.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return _RunningTotals()


def running_user_totals(events: DataFrame) -> DataFrame:
    """events (streaming) -> update-mode stream of cumulative
    per-user totals. State is one 16-byte ValueState row per user —
    bounded by key cardinality, independent of stream length.

    Requires the transformWithState Python runtime (protobuf) — the
    capability gate raises here with the missing piece named instead
    of letting the stream crash at worker init. Callers must also run
    with the RocksDB state store provider (the only one the operator
    supports)."""
    from pyspark.sql import functions as F

    if not has_transform_with_state_runtime():
        raise RuntimeError(
            "transformWithStateInPandas needs the google.protobuf "
            "package for its streaming Python runner; not installed "
            "in this environment"
        )
    prepared = events.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_totals(),
        outputStructType="user_id BIGINT, n_events BIGINT, sum_cents BIGINT",
        outputMode="Update",
        timeMode="None",
    )
