"""Semantic equivalence (SURVEY §5.3): the windowed approach plan and
the sequential applyInPandas twin must produce identical episodes —
on the hand-built fixtures AND on SF-scale synthesized telemetry."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ngafid_cpat_spark.plans import approach as AP
from ngafid_cpat_spark.plans import approach_twin as TW
from ngafid_cpat_spark.sources import load


def normalize(rows):
    def cell(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    return sorted(tuple(cell(v) for v in r) for r in rows)


def assert_equal_results(plan_df, twin_df):
    plan = normalize([tuple(r) for r in plan_df.collect()])
    twin = normalize([tuple(r) for r in twin_df.collect()])
    assert len(plan) == len(twin)
    for p, t in zip(plan, twin):
        assert p == t, f"\nplan: {p}\ntwin: {t}"


def test_twin_matches_plan_on_fixtures(spark, telemetry, dims):
    airports, runways = dims
    assert_equal_results(
        AP.analyze(telemetry, airports, runways),
        TW.analyze_twin(telemetry, airports, runways),
    )


def test_twin_matches_plan_on_sf_telemetry(spark):
    """Same equivalence over ~6k ticks of telemetry synthesized from
    the sf0.001 events table (the approach_pipeline_demo input)."""
    ev = load(spark, "/root/testdata/sf0.001", "events")
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
    telemetry = ev.select(
        F.col("user_id").alias("flight"),
        rn.alias("time"),
        (F.lit(800.0) + F.col("value") * 10).alias("msl_altitude"),
        (F.col("value") / 2).alias("indicated_airspeed"),
        (-F.col("value")).alias("vertical_airspeed"),
        F.lit(90.0).alias("heading"),
        (F.lit(40.0) + F.col("value") / 5000).alias("latitude"),
        (F.lit(-85.0) + F.col("value") / 5000).alias("longitude"),
    )
    airports = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "latitude": 40.0, "longitude": -85.0,
             "elevation_ft": 800.0},
            {"airport_code": "KBBB", "latitude": 40.02, "longitude": -84.98,
             "elevation_ft": 820.0},
        ]
    )
    runways = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "runway_code": "09",
             "magnetic_rwy_hdg": 90.0, "true_rwy_hdg": 90.0,
             "center_lat": 40.0, "center_long": -85.0},
            {"airport_code": "KBBB", "runway_code": "08",
             "magnetic_rwy_hdg": 85.0, "true_rwy_hdg": 85.0,
             "center_lat": 40.02, "center_long": -84.98},
        ]
    )
    plan = AP.analyze(telemetry, airports, runways)
    twin = TW.analyze_twin(telemetry, airports, runways)
    assert_equal_results(plan, twin)
