"""Approach/landing pipeline tests on synthetic flight profiles
(FIXTURES.md §1-§3, §7): a full-stop landing with one unstable tick,
a go-around, and a never-took-off flight, with hand-computed expected
episode boundaries, classification and means."""

import pytest

from ngafid_cpat_spark.plans import approach as AP

# telemetry / dims fixtures live in conftest.py (shared with the
# plan-vs-twin equivalence tests)


@pytest.fixture(scope="module")
def result(spark, telemetry, dims):
    airports, runways = dims
    return AP.analyze(telemetry, airports, runways).collect()


def by_flight(result):
    return {(r["flight_id"], r["approach_id"]): r for r in result}


def test_episode_inventory(result):
    keys = sorted((r["flight_id"], r["approach_id"]) for r in result)
    assert keys == [(1, 1), (2, 1)]  # flight 3 excluded (no takeoff)


def test_full_stop_episode(result):
    r = by_flight(result)[(1, 1)]
    assert r["airport_id"] == "KAAA"
    assert r["runway_id"] == "09"
    assert r["approach_start"] == 19      # first final tick (20) - 1
    assert r["approach_end"] == 24
    assert r["landing_start"] == 25
    assert r["landing_end"] == 28
    assert r["landing_type"] == "stop-and-go"
    assert r["unstable"] == 1
    assert r["all_heading"] == pytest.approx(0.0, abs=1e-9)
    assert r["f1_heading"] is None        # F1 never failed -> NULL mean (A1)
    assert abs(r["all_crosstrack"]) < 1.0  # on centerline
    assert r["f2_crosstrack"] is None
    assert r["all_ias"] == pytest.approx((65 * 4 + 80) / 5)
    assert r["a_ias"] == pytest.approx(80.0)
    assert r["all_vsi"] == pytest.approx(-500.0)
    assert r["s_vsi"] is None


def test_go_around_episode(result):
    r = by_flight(result)[(2, 1)]
    assert r["airport_id"] == "KBBB"
    assert r["runway_id"] == "18"
    assert r["approach_start"] == 10
    assert r["approach_end"] == 14
    assert r["landing_start"] == 15
    assert r["landing_end"] == 16
    assert r["landing_type"] == "go-around"
    assert r["unstable"] == 0
    assert r["all_heading"] == pytest.approx(5.0)  # 175 vs mag 180
    assert r["all_ias"] == pytest.approx(70.0)


def test_idempotent_rerun(spark, telemetry, dims, result):
    airports, runways = dims
    again = AP.analyze(telemetry, airports, runways).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, result))


@pytest.mark.parametrize("strategy", ["per_type", "joined"])
def test_analyze_fleet_per_type_thresholds(spark, telemetry, dims, strategy):
    """J7: flight 1's IAS-80 tick is unstable under the default A-band
    [55,75] but stable for an aircraft type configured with
    max_ias=85 (exceedance_thresholds semantics). Both strategies —
    per-type constant-folded union and the single column-
    parameterized plan — must agree."""
    airports, runways = dims
    aircraft = spark.createDataFrame(
        [
            {"id": 1, "aircraft_type": 7},
            {"id": 2, "aircraft_type": 9},
            {"id": 3, "aircraft_type": 9},
        ]
    )
    thresholds = spark.createDataFrame(
        [{"aircraft_id": 7, "max_ias": 85.0}]
    )
    out = {
        (r["flight_id"], r["approach_id"]): r
        for r in AP.analyze_fleet(
            telemetry, airports, runways, aircraft, thresholds,
            strategy=strategy,
        ).collect()
    }
    assert out[(1, 1)]["unstable"] == 0          # 80 <= 85: stable now
    assert out[(1, 1)]["a_ias"] is None
    assert out[(2, 1)]["unstable"] == 0          # unchanged default type
    # same fleet with no config = default thresholds -> unstable again
    out2 = {
        (r["flight_id"], r["approach_id"]): r
        for r in AP.analyze_fleet(
            telemetry, airports, runways, aircraft, strategy=strategy
        ).collect()
    }
    assert out2[(1, 1)]["unstable"] == 1


def test_analyze_fleet_strategies_equivalent(spark, telemetry, dims):
    """The joined (column-threshold) plan is row-identical to the
    per-type constant-folded union on a mixed-config fleet."""
    airports, runways = dims
    aircraft = spark.createDataFrame(
        [
            {"id": 1, "aircraft_type": 7},
            {"id": 2, "aircraft_type": 9},
            {"id": 3, "aircraft_type": 9},
        ]
    )
    thresholds = spark.createDataFrame(
        [
            {"aircraft_id": 7, "max_ias": 85.0},
            {"aircraft_id": 9, "max_heading_error": 4.0},
        ]
    )
    per_type = AP.analyze_fleet(
        telemetry, airports, runways, aircraft, thresholds,
        strategy="per_type",
    )
    joined = AP.analyze_fleet(
        telemetry, airports, runways, aircraft, thresholds,
        strategy="joined",
    )
    assert sorted(map(tuple, per_type.collect())) == sorted(
        map(tuple, joined.collect())
    )


def test_analyze_fleet_joined_plan_is_type_count_independent(
    spark, telemetry, dims
):
    """The joined strategy must produce ONE plan — no per-type union
    branches and one telemetry scan — regardless of type count."""
    airports, runways = dims
    aircraft = spark.createDataFrame(
        [{"id": i, "aircraft_type": i} for i in range(1, 4)]
    )
    thresholds = spark.createDataFrame(
        [{"aircraft_id": i, "max_ias": 75.0 + i} for i in range(1, 4)]
    )
    plan = AP.analyze_fleet(
        telemetry, airports, runways, aircraft, thresholds,
        strategy="joined",
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan


def test_pending_flights(spark):
    fa = spark.createDataFrame(
        [
            {"flight_id": 1, "approach_analysis": 0},
            {"flight_id": 2, "approach_analysis": 1},
            {"flight_id": 3, "approach_analysis": 0},
        ]
    )
    got = sorted(r["flight_id"] for r in AP.pending_flights(fa).collect())
    assert got == [1, 3]


def test_nearest_airport_fold_matches_two_phase(spark, telemetry, dims):
    """The small-dim least()-fold path and the two-phase shuffled
    argmin are row-identical, including NULL-coordinate dims and the
    deterministic tie-break."""
    airports, _ = dims
    # add a NULL-coordinate airport AND a NULL-code airport with valid
    # coordinates sitting on top of the telemetry: both paths must
    # exclude both (the NULL-code row would otherwise WIN the argmin in
    # the two-phase path while the fold skips it — the r04 ADVICE
    # divergence; the candidate contract now filters it in both)
    near = telemetry.select("latitude", "longitude").first()
    extra = spark.createDataFrame(
        [{"airport_code": "KNUL", "latitude": None, "longitude": None,
          "elevation_ft": None},
         {"airport_code": None, "latitude": near["latitude"],
          "longitude": near["longitude"], "elevation_ft": 123.0}],
        "airport_code string, latitude double, longitude double, elevation_ft double",
    )
    dim = airports.select(
        "airport_code", "latitude", "longitude", "elevation_ft"
    ).unionByName(extra)
    fold = AP.with_nearest_airport(telemetry, dim)
    join = AP.with_nearest_airport(telemetry, dim, fold_max_dims=0)
    cols = ["flight", "time", "airport_code", "airport_lat",
            "airport_lon", "airport_elev"]
    assert sorted(map(tuple, fold.select(cols).collect())) == sorted(
        map(tuple, join.select(cols).collect())
    )
    # the fold plan must be join- and shuffle-free
    plan = fold._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


@pytest.mark.parametrize("strategy", ["per_type", "joined"])
def test_analyze_fleet_null_type_carries_its_config(spark, telemetry, dims, strategy):
    """A NULL aircraft_type is a real group (eqNullSafe in both
    strategies): its flights analyze under the NULL-keyed config row,
    not silently under defaults — flight 1's IAS-80 tick flips stable
    only if the NULL-type config (max_ias=85) is actually applied."""
    airports, runways = dims
    aircraft = spark.createDataFrame(
        [{"id": 1, "aircraft_type": None},
         {"id": 2, "aircraft_type": 9},
         {"id": 3, "aircraft_type": 9}],
        "id long, aircraft_type int",
    )
    thresholds = spark.createDataFrame(
        [{"aircraft_id": None, "max_ias": 85.0}],
        "aircraft_id int, max_ias double",
    )
    out = {
        (r["flight_id"], r["approach_id"]): r
        for r in AP.analyze_fleet(
            telemetry, airports, runways, aircraft, thresholds,
            strategy=strategy,
        ).collect()
    }
    assert (1, 1) in out, "NULL-type flight must not vanish from the fleet"
    assert out[(1, 1)]["unstable"] == 0   # NULL-keyed config applied
    assert out[(2, 1)]["unstable"] == 0   # typed flight unaffected
