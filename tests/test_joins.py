"""Unit tests for join operators: nearest-neighbor (exact + gridded)
and as-of."""

from datetime import datetime

from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import joins as OJ


def test_nearest_gridded_matches_exact(spark):
    pts = spark.createDataFrame(
        [
            {"pid": 1, "latitude": 40.01, "longitude": -85.02},
            {"pid": 2, "latitude": 40.49, "longitude": -84.61},
            {"pid": 3, "latitude": 41.20, "longitude": -85.90},
        ]
    )
    dims = spark.createDataFrame(
        [
            {"code": "AAA", "latitude": 40.0, "longitude": -85.0},
            {"code": "BBB", "latitude": 40.5, "longitude": -84.6},
            {"code": "CCC", "latitude": 41.25, "longitude": -85.95},
        ]
    )
    out = OJ.nearest_gridded(
        pts, dims, "pid", dim_cols=["code"], cell_deg=0.5
    )
    got = {r["pid"]: r["nearest_code"] for r in out.collect()}
    assert got == {1: "AAA", 2: "BBB", 3: "CCC"}


def test_asof_join_strict(spark):
    t = lambda s: datetime.fromtimestamp(s)
    left = spark.createDataFrame(
        [
            {"k": 1, "ts": t(100), "which": "a"},
            {"k": 1, "ts": t(200), "which": "b"},
            {"k": 2, "ts": t(50), "which": "c"},
        ]
    )
    right = spark.createDataFrame(
        [
            {"k": 1, "ts": t(90), "rv": 1.0},
            {"k": 1, "ts": t(100), "rv": 2.0},   # same-ts: excluded when strict
            {"k": 1, "ts": t(150), "rv": 3.0},
            {"k": 2, "ts": t(60), "rv": 4.0},    # after left -> no match
        ]
    )
    strict = OJ.asof_join(left, right, on="k", ts_col="ts", right_cols=["rv"], strict=True)
    got = {r["which"]: r["asof_rv"] for r in strict.collect()}
    assert got == {"a": 1.0, "b": 3.0, "c": None}

    loose = OJ.asof_join(left, right, on="k", ts_col="ts", right_cols=["rv"], strict=False)
    got2 = {r["which"]: r["asof_rv"] for r in loose.collect()}
    assert got2 == {"a": 2.0, "b": 3.0, "c": None}


def test_nearest_argmin_deterministic_ties(spark):
    facts = spark.createDataFrame([{"fid": 1, "x": 5.0}])
    dims = spark.createDataFrame(
        [{"code": "B", "y": 4.0}, {"code": "A", "y": 6.0}]  # equidistant
    )
    out = OJ.nearest(
        facts, dims,
        distance=F.abs(F.col("x") - F.col("y")),
        fact_key="fid", dim_cols=["code"],
    )
    # lexicographic tie-break inside min(struct): 'A' < 'B'
    assert out.first()["nearest_code"] == "A"
