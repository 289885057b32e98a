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


def test_asof_join_forward_and_tolerance(spark):
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
            {"k": 1, "ts": t(90), "rv": 1.0},    # before left -> no match
            {"k": 1, "ts": t(100), "rv": 2.0},   # same-ts: excluded when strict
            {"k": 1, "ts": t(150), "rv": 3.0},
            {"k": 1, "ts": t(600), "rv": 5.0},   # next after b, far away
            {"k": 2, "ts": t(40), "rv": 4.0},
        ]
    )
    fwd = OJ.asof_join(left, right, on="k", ts_col="ts",
                       right_cols=["rv"], strict=True, direction="forward")
    got = {r["which"]: r["asof_rv"] for r in fwd.collect()}
    assert got == {"a": 3.0, "b": 5.0, "c": None}

    loose = OJ.asof_join(left, right, on="k", ts_col="ts",
                         right_cols=["rv"], strict=False, direction="forward")
    got2 = {r["which"]: r["asof_rv"] for r in loose.collect()}
    assert got2 == {"a": 2.0, "b": 5.0, "c": None}

    # tolerance: b's next click at +400 s exceeds 300 s -> NULL;
    # backward tolerance prunes matches older than the bound too
    tol = OJ.asof_join(left, right, on="k", ts_col="ts",
                       right_cols=["rv"], strict=True,
                       direction="forward", tolerance_seconds=300.0)
    got3 = {r["which"]: r["asof_rv"] for r in tol.collect()}
    assert got3 == {"a": 3.0, "b": None, "c": None}
    back = OJ.asof_join(left, right, on="k", ts_col="ts",
                        right_cols=["rv"], strict=True,
                        tolerance_seconds=5.0)
    got4 = {r["which"]: r["asof_rv"] for r in back.collect()}
    assert got4 == {"a": None, "b": None, "c": None}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        OJ.asof_join(left, right, on="k", ts_col="ts",
                     right_cols=["rv"], direction="sideways")


def test_asof_join_nearest(spark):
    t = lambda s: datetime.fromtimestamp(s)
    left = spark.createDataFrame(
        [
            {"k": 1, "ts": t(100), "which": "a"},   # back 90 (d=10) beats fwd 150 (d=50)
            {"k": 1, "ts": t(120), "which": "b"},   # fwd 150 (d=30) beats back 90 (d=30)? tie -> backward
            {"k": 1, "ts": t(149), "which": "c"},   # fwd 150 (d=1) beats back 90 (d=59)
            {"k": 2, "ts": t(50), "which": "d"},    # no right rows in tolerance
        ]
    )
    right = spark.createDataFrame(
        [
            {"k": 1, "ts": t(90), "rv": 1.0},
            {"k": 1, "ts": t(150), "rv": 3.0},
            {"k": 2, "ts": t(500), "rv": 4.0},
        ]
    )
    near = OJ.asof_join(left, right, on="k", ts_col="ts",
                        right_cols=["rv"], strict=True, direction="nearest")
    got = {r["which"]: r["asof_rv"] for r in near.collect()}
    # b: |Δ| tie at 30 s either side -> backward (rv=1.0) wins
    assert got == {"a": 1.0, "b": 1.0, "c": 3.0, "d": 4.0}

    tol = OJ.asof_join(left, right, on="k", ts_col="ts",
                       right_cols=["rv"], strict=True,
                       direction="nearest", tolerance_seconds=20.0)
    got2 = {r["which"]: r["asof_rv"] for r in tol.collect()}
    # b: both candidates 30 s away > 20 s tolerance -> NULL;
    # d: nearest is 450 s away -> NULL
    assert got2 == {"a": 1.0, "b": None, "c": 3.0, "d": None}

    # strict excludes the exact-timestamp match on either side,
    # falling back to the next-nearest in-tolerance candidate
    exact_left = spark.createDataFrame([{"k": 1, "ts": t(90), "which": "e"}])
    ne = OJ.asof_join(exact_left, right, on="k", ts_col="ts",
                      right_cols=["rv"], strict=True, direction="nearest")
    assert ne.first()["asof_rv"] == 3.0  # t(150), not the tying t(90)
    ne2 = OJ.asof_join(exact_left, right, on="k", ts_col="ts",
                       right_cols=["rv"], strict=False, direction="nearest")
    assert ne2.first()["asof_rv"] == 1.0


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


def test_nearest_null_distance_never_wins(spark):
    # a dim with NULL coordinates must not beat real candidates (the
    # old min(struct) ordering sorted NULL distance first), and a fact
    # with NO finite distance gets NULL nearest_* columns
    facts = spark.createDataFrame([{"fid": 1, "x": 5.0}, {"fid": 2, "x": None}])
    dims = spark.createDataFrame(
        [{"code": "REAL", "y": 4.0}, {"code": "NULLY", "y": None}]
    )
    out = OJ.nearest(
        facts, dims,
        distance=F.abs(F.col("x") - F.col("y")),
        fact_key="fid", dim_cols=["code"],
    )
    rows = {r["fid"]: r for r in out.collect()}
    assert rows[1]["nearest_code"] == "REAL"
    assert rows[2]["nearest_code"] is None and rows[2]["nearest_dist"] is None


def test_nearest_banded_1d_exact_with_sparse_tail(spark):
    """Banded NN == brute force, including facts whose nearest dim is
    beyond one band (the fallback pass) and distance ties (key
    tie-break)."""
    from ngafid_cpat_spark.operators.joins import nearest_banded_1d

    facts = spark.createDataFrame(
        [{"fk": i, "fv": v} for i, v in enumerate([0.0, 99.0, 250.0, 1000.0, -500.0])]
    )
    # dims: 99 is out of band 0's +/-1 window for fact at -500 etc.;
    # two dims equidistant from fv=150 would tie — include a pair
    # equidistant from 250 (at 200 and 300) to check key tie-break
    dims = spark.createDataFrame(
        [{"dk": k, "dv": v} for k, v in [(1, 0.0), (2, 200.0), (3, 300.0), (4, 205.0)]]
    )
    out = {
        r["fk"]: (r["nearest_key"], r["nearest_dist"])
        for r in nearest_banded_1d(
            facts, dims, "fk", "fv", "dk", "dv", band_width=100.0
        ).collect()
    }
    # brute force expectations (tie at fv=250: d=45 for dk=4 wins;
    # craft a true tie: fv=250 vs dk2@200 (d=50) and dk3@300 (d=50)
    # loses to dk4@205 (d=45))
    assert out[0] == (1, 0.0)
    assert out[1] == (1, 99.0)
    assert out[2] == (4, 45.0)
    assert out[3] == (3, 700.0)   # fallback: nearest far beyond one band
    assert out[4] == (1, 500.0)   # fallback on the other side


def test_nearest_banded_1d_tie_breaks_on_key(spark):
    from ngafid_cpat_spark.operators.joins import nearest_banded_1d

    facts = spark.createDataFrame([{"fk": 1, "fv": 250.0}])
    dims = spark.createDataFrame(
        [{"dk": 9, "dv": 200.0}, {"dk": 3, "dv": 300.0}]
    )
    r = nearest_banded_1d(
        facts, dims, "fk", "fv", "dk", "dv", band_width=100.0
    ).first()
    assert (r["nearest_key"], r["nearest_dist"]) == (3, 50.0)


def test_broadcast_dim_guard(spark):
    """The argmin broadcast path must fail fast when the 'dim' side is
    not dimension-sized (instead of OOMing mid-job at scale)."""
    import pytest

    from ngafid_cpat_spark.operators import joins as OJ

    big = spark.range(0, 50)
    with pytest.raises(ValueError, match="broadcast dim side"):
        OJ.assert_dim_bounded(big, max_rows=10)
    OJ.assert_dim_bounded(big, max_rows=100)  # within bound: no-op
    OJ.assert_dim_bounded(big, max_rows=None)  # disabled: no-op


def test_nearest_banded_1d_null_fact_value_kept(spark):
    # a fact whose value is NULL has no finite distance to any dim —
    # it must still appear in the output (NULL nearest columns), not
    # silently vanish from the per-fact result
    facts = spark.createDataFrame([{"fk": 1, "fv": 5.0}, {"fk": 2, "fv": None}])
    dims = spark.createDataFrame([{"dk": 1, "dv": 4.0}, {"dk": 2, "dv": 9.0}])
    out = {
        r["fk"]: (r["nearest_key"], r["nearest_dist"])
        for r in OJ.nearest_banded_1d(
            facts, dims, "fk", "fv", "dk", "dv", band_width=10.0
        ).collect()
    }
    assert out[1] == (1, 1.0)
    assert out[2] == (None, None)


def test_nearest_all_nan_distance_absent(spark):
    # Spark evaluates NaN = NaN as true; the argmin must still treat
    # an all-NaN group as "no match", not emit a NaN winner
    facts = spark.createDataFrame([{"fid": 1, "x": float("nan")}])
    dims = spark.createDataFrame([{"code": "A", "y": 1.0}])
    r = OJ.nearest(
        facts, dims,
        distance=F.abs(F.col("x") - F.col("y")),
        fact_key="fid", dim_cols=["code"],
    ).first()
    assert r["nearest_code"] is None and r["nearest_dist"] is None
