import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from ngafid_cpat_spark.session import get_spark

    s = get_spark("ngafid-cpat-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ---------------------------------------------------------------------------
# Shared flight fixtures (FIXTURES.md §1-§3): used by test_approach and
# the plan-vs-twin equivalence tests
# ---------------------------------------------------------------------------

def tick(flight, t, msl, ias, vsi, hdg, lat, lon):
    return {
        "flight": flight, "time": t, "msl_altitude": float(msl),
        "indicated_airspeed": float(ias), "vertical_airspeed": float(vsi),
        "heading": float(hdg), "latitude": float(lat), "longitude": float(lon),
        "pitch_attitude": 0.0, "eng_1_rpm": 2400.0,
    }


@pytest.fixture(scope="session")
def dims(spark):
    airports = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "airport_name": "Alpha", "city": "A",
             "state_code": "IN", "latitude": 40.0, "longitude": -85.0,
             "elevation_ft": 800.0},
            {"airport_code": "KBBB", "airport_name": "Bravo", "city": "B",
             "state_code": "IN", "latitude": 41.0, "longitude": -86.0,
             "elevation_ft": 900.0},
        ]
    )
    runways = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "elevation_ft": 800.0, "runway_code": "09",
             "magnetic_rwy_hdg": 90.0, "true_rwy_hdg": 90.0,
             "center_lat": 40.0, "center_long": -85.0},
            {"airport_code": "KAAA", "elevation_ft": 800.0, "runway_code": "27",
             "magnetic_rwy_hdg": 270.0, "true_rwy_hdg": 270.0,
             "center_lat": 40.0, "center_long": -85.0},
            {"airport_code": "KBBB", "elevation_ft": 900.0, "runway_code": "18",
             "magnetic_rwy_hdg": 180.0, "true_rwy_hdg": 180.0,
             "center_lat": 41.0, "center_long": -86.0},
        ]
    )
    return airports, runways


@pytest.fixture(scope="session")
def telemetry(spark):
    rows = []
    # --- flight 1: taxi, climb, cruise, approach to KAAA rwy 09,
    #     full-stop landing; one fast (IAS 80) tick in the final band
    for t in range(0, 5):                     # ground at KAAA
        rows.append(tick(1, t, 800, 0, 0, 90, 40.0, -85.0))
    for t, msl in [(5, 1000), (6, 1200), (7, 1400)]:  # climb; AGL>=500 at t=7
        rows.append(tick(1, t, msl, 70, 800, 90, 40.0, -85.0 + 0.001 * t))
    for t in range(8, 16):                    # cruise, away from airports
        rows.append(tick(1, t, 3000, 100, 0, 90, 40.5, -84.5))
    approach_agl = {16: 490, 17: 400, 18: 300, 19: 200, 20: 150,
                    21: 120, 22: 90, 23: 60, 24: 50, 25: 30, 26: 10}
    for t, agl in approach_agl.items():
        ias = 80 if t == 22 else 65           # t=22: cond_A fails -> unstable
        rows.append(tick(1, t, 800 + agl, ias, -500, 90, 40.0, -85.0 + 0.0002 * (t - 27)))
    rows.append(tick(1, 27, 800, 30, 0, 90, 40.0, -85.0))   # rollout, IAS<=35
    rows.append(tick(1, 28, 800, 10, 0, 90, 40.0, -85.0))

    # --- flight 2: go-around at KBBB rwy 18 (stable, climbs out)
    for t in range(0, 3):
        rows.append(tick(2, t, 900, 0, 0, 180, 41.0, -86.0))
    rows.append(tick(2, 3, 1200, 70, 800, 180, 41.0, -86.0))
    rows.append(tick(2, 4, 1500, 80, 800, 180, 41.0, -86.0))   # AGL 600: takeoff
    for t in range(5, 9):
        rows.append(tick(2, t, 3000, 100, 0, 180, 41.5, -86.5))
    ga_agl = {9: 450, 10: 300, 11: 140, 12: 100, 13: 60, 14: 80, 15: 200, 16: 400}
    for t, agl in ga_agl.items():
        rows.append(tick(2, t, 900 + agl, 70, -400, 175, 41.0 - 0.0002 * t, -86.0))
    rows.append(tick(2, 17, 1500, 90, 800, 175, 41.0, -86.0))  # AGL 600: climb-out

    # --- flight 3: never reaches AGL 500 -> excluded (W1)
    for t in range(0, 6):
        rows.append(tick(3, t, 1000, 40, 0, 90, 40.0, -85.0))
    return spark.createDataFrame(rows)
