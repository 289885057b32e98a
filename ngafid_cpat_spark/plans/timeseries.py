"""Time-series catalog: densification (gap fill), LOCF imputation,
multi-granularity rollup reuse, higher-order array functions, and
regex extract-all — the hypertable-style operations a metrics store
layers on the ordered-series core (SURVEY §2.5).

  * calendar densification + LOCF: every (user, day) cell exists even
    with zero events, and the last known daily value carries forward —
    the standard gap-fill a downsampled dashboard needs. Generalizes
    the reference's per-tick carry of state across telemetry gaps
    (FlightAnalysis.py:142-269 holds phase state between sparse
    in-band ticks).
  * hourly->daily rollup reuse: the daily aggregate is computed FROM
    the hourly aggregate, not from raw rows — the incremental-rollup
    contract (exact because partials are integer cents).
  * higher-order functions over bounded per-group arrays:
    filter/exists/forall/aggregate/slice/reverse.
  * regexp_extract_all: multi-match extraction (scrub's dual —
    keep the matches instead of masking them).

Every query is oracle-paired; scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load
from .relational import (
    CENTS_SUM_LONG_SQL,
    CENTS_SUM_SQL,
    cents_sum,
    cents_sum_long,
    register,
)

_CAL_START = "2024-01-01"
_CAL_END = "2024-01-30"


@register(
    "gapfill_locf_daily",
    f"""
    WITH cal AS (
        SELECT CAST(unnest(generate_series(
                   DATE '{_CAL_START}', DATE '{_CAL_END}', INTERVAL 1 DAY))
               AS DATE) AS day
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n_events,
               {CENTS_SUM_SQL('value')} AS day_value
        FROM events
        GROUP BY user_id, day
    )
    SELECT u.user_id, c.day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           d.day_value,
           last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY u.user_id ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM users u
    CROSS JOIN cal c
    LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
    """,
)
def gapfill_locf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + last-observation-carried-forward:
    every (user, day) cell over a fixed calendar, days with no events
    get n_events=0 and the previous day's value carried forward.

    Scale shape: the dense grid is users x days — dimension-sized
    next to the event fact (150 users x 30 days here; even 10M users
    x 10 years is ~37B cheap rows vs trillions of events). The daily
    pre-aggregate shrinks the fact BEFORE the grid join, so the join
    input is already grid-sized; LOCF is one partition-local window
    per user (days are few per partition — no unbounded state). The
    calendar is generated map-side by sequence+explode, never
    collected on the driver."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        cents_sum("value").alias("day_value"),
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(_CAL_START).cast("date"),
                    F.lit(_CAL_END).cast("date"),
                )
            ).alias("day"),
        )
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
    )


@register(
    "rollup_hourly_daily",
    f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour,
               COUNT(*) AS n,
               {CENTS_SUM_LONG_SQL('value')} AS sum_c
        FROM events
        GROUP BY hour
    )
    SELECT CAST(date_trunc('day', hour) AS DATE) AS day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           SUM(sum_c) / 100.0 AS sum_value,
           COUNT(*)          AS n_hours
    FROM hourly
    GROUP BY day
    """,
)
def rollup_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup REUSE: the daily aggregate reads the
    hourly aggregate's partials, never the raw fact. Exact because
    the partials are integer cents + counts (associative re-
    aggregation; a mean or float sum would not recompose exactly).
    This is the hypertable continuous-aggregate contract: at 100 TB
    the hourly rollup is materialized incrementally and every coarser
    granularity (day/week/month) derives from it — each level costs
    a shuffle of the LEVEL ABOVE's cardinality, not a fact scan.
    n_hours counts only hours that had events on both engines."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        cents_sum_long("value").alias("sum_c"),
    )
    return hourly.groupBy(F.to_date("hour").alias("day")).agg(
        F.sum("n").alias("n_events"),
        (F.sum("sum_c") / 100.0).alias("sum_value"),
        F.count(F.lit(1)).alias("n_hours"),
    )


@register(
    "hof_value_arrays",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                       AS n_vals,
           CAST(COUNT(*) FILTER (WHERE c > 5000) AS BIGINT) AS n_above,
           bool_or(c > 15000)                             AS any_big,
           bool_and(c >= 0)                               AS all_nonneg,
           CAST(SUM(c) AS BIGINT)                         AS total_cents,
           CAST(SUM(c) FILTER (WHERE rn <= 3) AS BIGINT)  AS top3_cents
    FROM (
        SELECT user_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ROUND(value * 100, 0) AS BIGINT) DESC) AS rn
        FROM events
    )
    GROUP BY user_id
    """,
)
def hof_value_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over a bounded per-user array:
    filter (count above threshold), exists (any big), forall (all
    non-negative), aggregate (exact integer-cents fold), and
    reverse+slice+aggregate (top-3 sum from the sorted array). The
    oracle computes the same six facts with plain SQL aggregates —
    proving the HOF pipeline against the relational semantics.

    Scale note: HOFs evaluate per-row over an ALREADY-GROUPED array
    (one array per user, bounded by that user's event count) — they
    are interpreted, not codegen'd, so the engine keeps them OFF the
    per-event hot path; the one shuffle is the user groupBy. Ties in
    top-3 are value-identical, so the sum is tie-order-invariant."""
    ev = load(spark, sf_dir, "events")
    arrs = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.round(F.col("value") * 100, 0).cast("long"))
        ).alias("arr")
    )
    zero = F.lit(0).cast("long")
    return arrs.select(
        "user_id",
        F.size("arr").cast("long").alias("n_vals"),
        F.size(F.filter("arr", lambda v: v > 5000)).cast("long").alias("n_above"),
        F.exists("arr", lambda v: v > 15000).alias("any_big"),
        F.forall("arr", lambda v: v >= 0).alias("all_nonneg"),
        F.aggregate("arr", zero, lambda a, v: a + v).alias("total_cents"),
        F.aggregate(
            F.slice(F.reverse("arr"), 1, 3), zero, lambda a, v: a + v
        ).alias("top3_cents"),
    )


@register(
    "scd2_purchase_history",
    """
    SELECT user_id, event_id, ts AS valid_from,
           lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(CASE WHEN lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def scd2_purchase_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history: each purchase opens
    a version valid until the user's next purchase; the open-ended
    row is flagged current. This is the versioned generalization of
    latest_snapshot_events (that query keeps only the last version;
    this one keeps the full validity-interval history — the table an
    as-of join probes). One shuffle on user_id; deterministic
    tie-break on event_id. At scale the history table partitions on
    the business key and valid_from orders within partitions, so an
    as-of probe prunes to one partition and binary-searches the
    sorted run."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    )


@register(
    "regexp_extract_all_events",
    """
    SELECT event_id,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums,
           CAST(COALESCE(list_aggregate(
                    list_transform(regexp_extract_all(props, '[0-9]+'),
                                   x -> CAST(x AS BIGINT)),
                    'sum'), 0) AS BIGINT) AS sum_nums,
           CAST(regexp_extract_all(props, '[0-9]+')[1] AS BIGINT) AS first_num
    FROM events
    """,
)
def regexp_extract_all_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction (the keep-side dual of
    pii_scrub_events): all digit runs in the raw props payload,
    counted, summed (transform+aggregate fold to BIGINT), and the
    first match surfaced (F.get — NULL when no match, ANSI-safe).
    Pure map-side expressions, zero shuffle; pattern stays in the
    RE2 ∩ java.util.regex common dialect so both engines extract
    identical match sets."""
    ev = load(spark, sf_dir, "events")
    nums = F.regexp_extract_all("props", F.lit("[0-9]+"), 0)
    zero = F.lit(0).cast("long")
    return ev.select(
        "event_id",
        F.size(nums).cast("long").alias("n_nums"),
        F.coalesce(
            F.aggregate(
                F.transform(nums, lambda x: x.cast("long")), zero, lambda a, v: a + v
            ),
            zero,  # NULL props -> NULL array -> 0, like the oracle's COALESCE
        ).alias("sum_nums"),
        F.get(nums, 0).cast("long").alias("first_num"),
    )
