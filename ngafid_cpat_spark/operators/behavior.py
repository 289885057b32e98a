"""Behavioral / event-sequence operators over an events fact table.

The reference's approach state machine (FlightAnalysis.py:134-330) is
an ordered-sequence operator over per-flight telemetry; these are the
same family over per-user event streams — the shapes every product-
analytics deployment of the engine runs daily:

  * funnel     ordered multi-step conversion (each step strictly
               after the previous) — chained unbounded window mins
               over ONE partitioning of the fact, so the whole
               funnel costs a single shuffle regardless of depth.
  * retention  periodic cohort retention (first-active period vs
               each later active period).

Both are pure column expressions — no state handling in Python, no
per-user collect, no self-join per step (the naive N-step funnel as
N-1 self-joins shuffles the fact N times; this shuffles once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user first-completion timestamp of each funnel step, where
    step i+1 must occur STRICTLY after the user's step-i completion.
    Returns one row per user with a nullable ``ts_<step>`` column per
    step (null = never reached).

    All steps share one ``Window.partitionBy(user)`` — Spark plans
    the chain as consecutive Window operators over a single Exchange,
    so funnel depth adds no shuffles (verified in test_plans_quality
    style: one Exchange for the whole chain)."""
    w = Window.partitionBy(user_col)
    df = events
    prev: Column | None = None
    out_cols = []
    for step in steps:
        col_name = f"ts_{step}"
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        df = df.withColumn(
            col_name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = F.col(col_name)
        out_cols.append(col_name)
    return df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in out_cols]
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Single-row funnel rollup: total users plus the count reaching
    each step in order (``n_<step>`` columns)."""
    per_user = funnel_steps(events, steps, user_col, type_col, ts_col)
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        *[F.count(f"ts_{s}").alias(f"n_{s}") for s in steps],
    )


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: users bucketed by first-active period
    (date_trunc'd), counted once in every later period they are
    active. Offsets are exact integer day arithmetic (no float, no
    month-length ambiguity). One shuffle on the user, one on the
    (cohort, offset) rollup."""
    w = Window.partitionBy(user_col)
    wk = events.select(
        user_col, F.date_trunc(period, F.col(ts_col)).alias("wk")
    ).withColumn("cohort", F.min("wk").over(w))
    d = wk.select(
        user_col,
        F.to_date("cohort").alias("cohort_week"),
        F.call_function(
            "div",
            F.datediff(F.to_date("wk"), F.to_date("cohort")).cast("long"),
            F.lit(period_days).cast("long"),
        ).alias("week_offset"),
    ).distinct()
    return d.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
