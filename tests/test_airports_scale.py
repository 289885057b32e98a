"""The reference's REAL airport dimension (data/Airports.csv: 15,165
airports; data/AirportsDetailed.csv: 164 runways) through the engine:
loader parity with the reference's positional parse (main.py:163-182)
and physical-strategy equivalence of with_nearest_airport's broadcast
cross-fan vs gridded cell paths on the real dim."""

import os

import pytest
from pyspark.sql import functions as F

from ngafid_cpat_spark.plans import approach as AP
from ngafid_cpat_spark.sources.tables import (
    load_reference_airports,
    load_reference_runways,
)

AIRPORTS_CSV = "/root/reference/data/Airports.csv"
RUNWAYS_CSV = "/root/reference/data/AirportsDetailed.csv"

needs_reference_data = pytest.mark.skipif(
    not os.path.exists(AIRPORTS_CSV),
    reason="reference airport data not present",
)


@pytest.fixture(scope="module")
def real_airports(spark):
    return load_reference_airports(spark, AIRPORTS_CSV)


@needs_reference_data
def test_reference_airports_load_complete(spark, real_airports):
    """All 15,165 rows parse under the named schema: no dropped rows,
    no NULL codes/coordinates (the dims the nearest join depends on)."""
    assert real_airports.count() == 15165
    assert (
        real_airports.filter(
            F.col("airport_code").isNull()
            | F.col("latitude").isNull()
            | F.col("longitude").isNull()
        ).count()
        == 0
    )
    # spot check the first data row (reference main.py:172-174 parse)
    r = real_airports.filter(F.col("airport_code") == "00A").first()
    assert r["city"] == "STONE MOUNTAIN" and r["elevation_ft"] == 986.0


@needs_reference_data
def test_reference_runways_load_and_mapping(spark):
    """164 runway rows; named-schema mapping matches the reference's
    positional indices (airport row[2], runway row[10], headings
    row[11]/row[12], center row[25]/row[26]) — except elevation_ft,
    which is TDZE per the header, not the latitude the reference's
    row[6] bug passes as altitude."""
    rw = load_reference_runways(spark, RUNWAYS_CSV)
    assert rw.count() == 164
    gfk = rw.filter(
        (F.col("airport_code") == "GFK") & (F.col("runway_code") == "35L")
    ).first()
    assert gfk is not None
    assert gfk["magnetic_rwy_hdg"] == 354.0
    assert gfk["true_rwy_hdg"] == 360.0
    assert abs(gfk["center_lat"] - 47.9491695) < 1e-9
    assert abs(gfk["center_long"] - -97.18123025) < 1e-9
    assert gfk["elevation_ft"] == 845.0  # TDZE, not latitude
    assert rw.filter(F.col("airport_code").isNull()).count() == 0


@needs_reference_data
def test_nearest_airport_paths_identical_on_real_dim(
    spark, telemetry, real_airports
):
    """with_nearest_airport's broadcast cross-fan argmin and the
    gridded cell equi-join must return IDENTICAL rows on the real
    15,165-airport dim — same winners, same distances-by-construction
    (both Manhattan degrees), same (code, lat, lon, elev) tie-break."""
    def run(grid_min_dims):
        out = AP.with_nearest_airport(
            telemetry,
            real_airports,
            fold_max_dims=0,
            grid_min_dims=grid_min_dims,
        )
        return sorted(
            (
                r["flight"], r["time"], r["airport_code"],
                r["airport_lat"], r["airport_lon"], r["airport_elev"],
            )
            for r in out.select(
                "flight", "time", "airport_code",
                "airport_lat", "airport_lon", "airport_elev",
            ).collect()
        )

    broadcast_rows = run(grid_min_dims=0)           # cross-fan path
    gridded_rows = run(grid_min_dims=2048)          # gridded path
    assert broadcast_rows == gridded_rows
    assert len(broadcast_rows) == telemetry.count()
    # the real dim actually resolves our Indiana-area synthetic ticks
    codes = {r[2] for r in broadcast_rows}
    assert codes and None not in codes


@needs_reference_data
def test_analyze_runs_end_to_end_on_real_dims(spark, telemetry):
    """The full approach pipeline accepts the real reference dims
    (smoke: the runway theta-join and episode rollup run against the
    actual 164-runway detail table without schema friction)."""
    airports = load_reference_airports(spark, AIRPORTS_CSV)
    runways = load_reference_runways(spark, RUNWAYS_CSV)
    out = AP.analyze(telemetry, airports, runways, persist=False)
    rows = out.collect()
    # synthetic flights approach fake airports far from any real
    # runway's airport; the pipeline must still classify episodes
    # (possibly zero approaches tied to GFK) without errors
    assert out.columns == AP.analyze(
        telemetry, airports, runways, persist=False
    ).columns
    assert isinstance(rows, list)
