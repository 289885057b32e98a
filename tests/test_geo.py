"""Geodesy golden tests — the reference's docstring examples
(FIXTURES.md §8) asserted against the column-expression library."""

import math

import pytest
from pyspark.sql import functions as F

from ngafid_cpat_spark.functions import geo


def one_row(spark, **cols):
    return spark.createDataFrame([cols])


def val(df, expr):
    return df.select(expr.alias("v")).first()["v"]


def test_distance_golden(spark):
    # LatLon.py:104-106: ~404.3 km
    df = one_row(spark, lat1=52.205, lon1=0.119, lat2=48.857, lon2=2.351)
    d = val(df, geo.distance("lat1", "lon1", "lat2", "lon2"))
    assert d == pytest.approx(404_279, rel=1e-4)


def test_distance_identity_and_symmetry(spark):
    df = one_row(spark, lat1=40.0, lon1=-75.0, lat2=52.0, lon2=13.0)
    assert val(df, geo.distance("lat1", "lon1", "lat1", "lon1")) == pytest.approx(0.0, abs=1e-6)
    d1 = val(df, geo.distance("lat1", "lon1", "lat2", "lon2"))
    d2 = val(df, geo.distance("lat2", "lon2", "lat1", "lon1"))
    assert d1 == pytest.approx(d2, rel=1e-12)


def test_bearing_golden(spark):
    # LatLon.py:128-129: ~156.2 deg
    df = one_row(spark, lat1=52.205, lon1=0.119, lat2=48.857, lon2=2.351)
    b = val(df, geo.bearing("lat1", "lon1", "lat2", "lon2"))
    assert b == pytest.approx(156.167, abs=0.01)


def test_midpoint_golden(spark):
    # LatLon.py:155: ~(50.5363, 1.2746)
    df = one_row(spark, lat1=52.205, lon1=0.119, lat2=48.857, lon2=2.351)
    lat, lon = geo.midpoint("lat1", "lon1", "lat2", "lon2")
    row = df.select(lat.alias("lat"), lon.alias("lon")).first()
    assert row["lat"] == pytest.approx(50.5363, abs=1e-3)
    assert row["lon"] == pytest.approx(1.2746, abs=1e-3)


def test_destination_point_golden(spark):
    # LatLon.py:176-177: (51.4778,-0.0015) + 7794 m @ 300.7 -> (51.5135,-0.0983)
    df = one_row(spark, lat=51.4778, lon=-0.0015, d=7794.0, brg=300.7)
    lat, lon = geo.destination_point("lat", "lon", "d", "brg")
    row = df.select(lat.alias("lat"), lon.alias("lon")).first()
    assert row["lat"] == pytest.approx(51.5135, abs=1e-3)
    assert row["lon"] == pytest.approx(-0.0983, abs=1e-3)


def test_crosstrack_golden_signed(spark):
    # LatLon.py:206-212: ~-305.7 m (left of track)
    df = one_row(spark, lat=53.2611, lon=-0.7972, slat=53.3206, slon=-1.7297, brg=96.0)
    x = val(df, geo.cross_track_distance("lat", "lon", "slat", "slon", "brg", radius=6_371_000.0))
    assert x == pytest.approx(-305.665, abs=0.1)
    # point south of the eastbound track sits on the other side: + sign
    x2 = val(
        df,
        geo.cross_track_distance(F.lit(53.0), "lon", "slat", "slon", "brg", radius=6_371_000.0),
    )
    assert x2 > 0


def test_great_circle_normal_golden(spark):
    # LatLon.py:81-82: ~[-0.794, 0.129, 0.594]
    df = one_row(spark, lat=53.3206, lon=-1.7297, brg=96.0)
    x, y, z = geo.great_circle_normal("lat", "lon", "brg")
    row = df.select(x.alias("x"), y.alias("y"), z.alias("z")).first()
    assert row["x"] == pytest.approx(-0.794, abs=1e-3)
    assert row["y"] == pytest.approx(0.129, abs=1e-3)
    assert row["z"] == pytest.approx(0.594, abs=1e-3)


def test_nvector_golden(spark):
    # LatLon.py:58-59: toVector(45,45) ~ [0.5, 0.5, 0.7071]
    df = one_row(spark, lat=45.0, lon=45.0)
    x, y, z = geo.to_nvector("lat", "lon")
    row = df.select(x.alias("x"), y.alias("y"), z.alias("z")).first()
    assert row["x"] == pytest.approx(0.5, abs=1e-6)
    assert row["y"] == pytest.approx(0.5, abs=1e-6)
    assert row["z"] == pytest.approx(math.sqrt(2) / 2, abs=1e-6)


def test_heading_difference_properties(spark):
    # FlightAnalysis.py:130-132 circular diff; wraparound at 0/360
    cases = [(350.0, 10.0, 20.0), (0.0, 180.0, 180.0), (90.0, 90.0, 0.0), (359.0, 1.0, 2.0)]
    df = spark.createDataFrame(
        [{"h1": a, "h2": b, "want": w} for a, b, w in cases]
    )
    rows = df.select(
        geo.heading_difference("h1", "h2").alias("got"),
        geo.heading_difference("h2", "h1").alias("sym"),
        "want",
    ).collect()
    for r in rows:
        assert r["got"] == pytest.approx(r["want"], abs=1e-9)
        assert r["sym"] == pytest.approx(r["want"], abs=1e-9)  # symmetric
        assert 0.0 <= r["got"] <= 180.0
