"""Behavioral operator tests (operators/behavior.py): ordered funnel
semantics and cohort retention arithmetic."""

import datetime as dt

from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import behavior as B


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            {
                "user_id": u,
                "event_type": t,
                "ts": dt.datetime(2024, 1, d, h, 0, 0),
            }
            for (u, t, d, h) in rows
        ]
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: full funnel in order
        (1, "view", 1, 0), (1, "click", 1, 1), (1, "purchase", 1, 2),
        # user 2: click BEFORE view -> stops at view
        (2, "click", 1, 0), (2, "view", 1, 1), (2, "purchase", 1, 2),
        # user 3: never views
        (3, "click", 1, 0), (3, "purchase", 1, 1),
    ]
    out = B.funnel_counts(
        _ev(spark, rows), ["view", "click", "purchase"]
    ).collect()[0]
    assert out["n_users"] == 3
    assert out["n_view"] == 2       # users 1 and 2
    assert out["n_click"] == 1      # only user 1 clicked after viewing
    assert out["n_purchase"] == 1
    # user 2's purchase DID follow their view, but not a post-view
    # click — the funnel is strictly sequential, stage by stage


def test_funnel_equal_timestamp_does_not_advance(spark):
    rows = [(1, "view", 1, 0), (1, "click", 1, 0)]  # same instant
    out = B.funnel_counts(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert out["n_view"] == 1 and out["n_click"] == 0


def test_funnel_uses_first_qualifying_event(spark):
    # user views at 00 and 03; clicks at 01 -> click qualifies via
    # the FIRST view even though a later view follows it
    rows = [(1, "view", 1, 0), (1, "click", 1, 1), (1, "view", 1, 3)]
    per_user = B.funnel_steps(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert per_user["ts_view"] == dt.datetime(2024, 1, 1, 0)
    assert per_user["ts_click"] == dt.datetime(2024, 1, 1, 1)


def test_funnel_depth_adds_no_shuffles(spark):
    rows = [(1, "a", 1, 0), (1, "b", 1, 1), (2, "a", 2, 0)]
    df = B.funnel_steps(_ev(spark, rows), ["a", "b", "a", "b"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Exchange for the window chain + one for the groupBy —
    # never one per funnel step
    assert plan.count("Exchange") <= 2


def test_retention_week_offsets(spark):
    rows = [
        # user 1 first active Mon Jan 1 week; again 2 weeks later
        (1, "view", 2, 0),    # Tue Jan 2 -> cohort week of Jan 1
        (1, "view", 16, 0),   # Tue Jan 16 -> offset 2
        # user 2 joins week of Jan 8, active only then
        (2, "view", 10, 0),
    ]
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
        for r in B.retention(_ev(spark, rows)).collect()
    }
    assert out[("2024-01-01", 0)] == 1
    assert out[("2024-01-01", 2)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert len(out) == 3


def test_retention_counts_user_once_per_week(spark):
    rows = [(1, "view", 1, 0), (1, "view", 1, 5), (1, "click", 3, 0)]
    out = B.retention(_ev(spark, rows)).collect()
    assert len(out) == 1 and out[0]["n_users"] == 1


def test_stats_moments_match_builtins(spark):
    """The integer-moment stddev/corr/covar must agree with Spark's
    built-in estimators to float tolerance (the builtins are the
    semantic reference; the moment form exists for cross-engine bit
    stability)."""
    from ngafid_cpat_spark.plans.pipeline import stats_moments_events

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in stats_moments_events(spark, sf).collect()}

    from ngafid_cpat_spark.sources import load

    ev = load(spark, sf, "events").select(
        "event_type",
        (F.round(F.col("value") * 100, 0) / 100).alias("v"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    ref = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.stddev_samp("v").alias("sd"),
            F.covar_samp("v", "k").alias("cv"),
            F.corr("v", "k").alias("cr"),
        )
        .collect()
    }
    for et, r in got.items():
        assert abs(r["stddev_value"] - ref[et]["sd"]) < 2e-4
        assert abs(r["covar_value_k"] - ref[et]["cv"]) < 2e-4
        assert abs(r["corr_value_k"] - ref[et]["cr"]) < 2e-4


def test_outlier_events_mad_semantics(spark):
    """MAD outliers: a gross outlier is flagged while the inliers it
    would hide under a stddev z-score are not."""
    from ngafid_cpat_spark.plans.extensions import outlier_events  # noqa: F401
    from ngafid_cpat_spark.plans import QUERIES

    rows = [
        {"event_id": i, "event_type": "a", "value": float(v)}
        for i, v in enumerate([10, 11, 12, 10, 11, 12, 10, 11, 1000])
    ]
    df = spark.createDataFrame(rows)
    import pyspark.sql.functions as F

    med = df.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        df.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.first("med").alias("med"),
             F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    out = (
        df.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0)
                & (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")))
        .select("event_id")
        .collect()
    )
    assert [r["event_id"] for r in out] == [8]  # only the 1000
