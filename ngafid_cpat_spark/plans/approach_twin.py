"""Sequential reference twin of the approach pipeline (applyInPandas).

A literal per-flight re-implementation of the canonical approach/
landing semantics as a grouped-map pandas UDF — the shape a naive
port of the reference's state machine (FlightAnalysis.py:134-330)
would take. It exists for two reasons:

  1. Semantic equivalence testing (SURVEY §5.3): the windowed
     DataFrame plan in approach.py must produce byte-identical
     episodes on well-behaved profiles; tests/test_approach_twin.py
     asserts plan == twin on the synthetic fixtures AND on SF-scale
     telemetry derived from the events table.
  2. The §2.10 grouped-map UDF surface: applyInPandas is the
     documented escape hatch when per-key sequential logic genuinely
     can't be windowed — this is the worked example.

It is NOT the production path: per-flight Python costs Arrow
round-trips and loses whole-stage codegen. It scales horizontally
(one task per flight group) but each group runs interpreted.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.similarity import round_half_away
from .approach import Thresholds

RESULT_SCHEMA = StructType([
    StructField("flight_id", LongType()),
    StructField("approach_id", IntegerType()),
    StructField("airport_id", StringType()),
    StructField("runway_id", StringType()),
    StructField("approach_start", LongType()),
    StructField("approach_end", LongType()),
    StructField("landing_start", LongType()),
    StructField("landing_end", LongType()),
    StructField("landing_type", StringType()),
    StructField("unstable", IntegerType()),
    StructField("all_heading", DoubleType()),
    StructField("f1_heading", DoubleType()),
    StructField("all_crosstrack", DoubleType()),
    StructField("f2_crosstrack", DoubleType()),
    StructField("all_ias", DoubleType()),
    StructField("a_ias", DoubleType()),
    StructField("all_vsi", DoubleType()),
    StructField("s_vsi", DoubleType()),
])

_R_MI = 3959.0
_R_FT = 20_902_000.0


def _nvec(lat: float, lon: float) -> tuple[float, float, float]:
    rlat, rlon = math.radians(lat), math.radians(lon)
    return (
        math.cos(rlat) * math.cos(rlon),
        math.cos(rlat) * math.sin(rlon),
        math.sin(rlat),
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _dot(a, b) -> float:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm(a) -> float:
    return math.sqrt(_dot(a, a))


def _distance(lat1, lon1, lat2, lon2, radius) -> float:
    a, b = _nvec(lat1, lon1), _nvec(lat2, lon2)
    return math.atan2(_norm(_cross(a, b)), _dot(a, b)) * radius


def _heading_diff(h1, h2) -> float:
    return 180.0 - abs(abs(h1 - h2) - 180.0)


def _gc_normal(lat, lon, brg):
    rlat, rlon, th = math.radians(lat), math.radians(lon), math.radians(brg)
    return (
        math.sin(rlon) * math.cos(th) - math.sin(rlat) * math.cos(rlon) * math.sin(th),
        -math.cos(rlon) * math.cos(th) - math.sin(rlat) * math.sin(rlon) * math.sin(th),
        math.cos(rlat) * math.sin(th),
    )


def _crosstrack(lat, lon, slat, slon, brg, radius=_R_FT) -> float:
    gc = _gc_normal(slat, slon, brg)
    p = _nvec(lat, lon)
    alpha = math.atan2(_norm(_cross(gc, p)), _dot(gc, p))
    return (alpha - math.pi / 2) * radius


def _mean(xs: list[float]) -> float | None:
    """Canonical deterministic mean (approach._avg_milli twin):
    per-value half-away-from-zero to integer millis, exact int sum,
    one float division — engine- and order-independent."""
    if not xs:
        return None
    millis = sum(round_half_away(v * 1000.0) for v in xs)
    return millis / len(xs) / 1000.0


def _analyze_one_flight(
    pdf: pd.DataFrame,
    airports: list[dict],
    runways_by_airport: dict[str, list[dict]],
    th: Thresholds,
) -> list[tuple]:
    rows = pdf.sort_values("time").to_dict("records")
    rows = [
        r
        for r in rows
        if all(
            r.get(c) is not None and not (isinstance(r[c], float) and math.isnan(r[c]))
            for c in (
                "time", "msl_altitude", "indicated_airspeed",
                "vertical_airspeed", "heading", "latitude", "longitude",
            )
        )
    ]
    if not rows:
        return []

    if not airports:
        # the windowed plan yields zero rows on an empty airports dim;
        # the twin must degrade identically, not crash in the UDF
        return []

    def nearest_airport(lat, lon):
        best = None
        for a in airports:
            d = abs(lat - a["latitude"]) + abs(lon - a["longitude"])
            k = (d, a["airport_code"])
            if best is None or k < best[0]:
                best = (k, a)
        return best[1]

    for r in rows:
        a = nearest_airport(r["latitude"], r["longitude"])
        r["airport"] = a
        r["agl"] = r["msl_altitude"] - a["elevation_ft"]
        r["dist_mi"] = _distance(
            r["latitude"], r["longitude"], a["latitude"], a["longitude"], _R_MI
        )

    # takeoff: first tick's airport elevation (W1)
    first_elev = rows[0]["airport"]["elevation_ft"]
    start = next(
        (i for i, r in enumerate(rows) if r["msl_altitude"] - first_elev >= th.approach_min_agl),
        None,
    )
    if start is None:
        return []
    rows = rows[start:]

    flight_id = int(pdf["flight"].iloc[0])
    out: list[tuple] = []
    in_ep = [
        (r["dist_mi"] < th.approach_min_distance_mi) and (r["agl"] < th.approach_min_agl)
        for r in rows
    ]
    low = [r["agl"] < th.approach_min_agl for r in rows]

    # episode boundaries (gaps-and-islands, W2)
    episodes = []
    i = 0
    while i < len(rows):
        if in_ep[i]:
            j = i
            while j + 1 < len(rows) and in_ep[j + 1]:
                j += 1
            episodes.append((i, j))
            i = j + 1
        else:
            i += 1

    for ep_id, (i0, i1) in enumerate(episodes, start=1):
        ep_rows = rows[i0 : i1 + 1]
        airport = ep_rows[0]["airport"]
        final = [
            r for r in ep_rows if th.final_min_agl <= r["agl"] <= th.final_max_agl
        ]
        runway = None
        if final:
            ff = min(final, key=lambda r: r["time"])
            cands = [
                rw
                for rw in runways_by_airport.get(airport["airport_code"], [])
                if _heading_diff(rw["magnetic_rwy_hdg"], ff["heading"])
                <= th.runway_heading_band
            ]
            if cands:
                runway = min(
                    cands,
                    key=lambda rw: (
                        abs(ff["latitude"] - rw["center_lat"])
                        + abs(ff["longitude"] - rw["center_long"]),
                        rw["runway_code"],
                    ),
                )

        all_h, f1_h, all_x, f2_x = [], [], [], []
        all_i, a_i, all_v, s_v = [], [], [], []
        unstable = 0
        for r in final:
            if runway is not None:
                he = _heading_diff(r["heading"], runway["magnetic_rwy_hdg"])
                xt = _crosstrack(
                    r["latitude"], r["longitude"],
                    runway["center_lat"], runway["center_long"],
                    runway["true_rwy_hdg"],
                )
                f1 = he <= th.max_heading_error
                f2 = abs(xt) <= th.max_crosstrack_ft
                all_h.append(he)
                all_x.append(xt)
                if not f1:
                    f1_h.append(he)
                if not f2:
                    f2_x.append(xt)
            else:
                f1 = f2 = True
            a = th.min_ias <= r["indicated_airspeed"] <= th.max_ias
            s = r["vertical_airspeed"] >= th.min_vsi
            all_i.append(r["indicated_airspeed"])
            all_v.append(r["vertical_airspeed"])
            if not a:
                a_i.append(r["indicated_airspeed"])
            if not s:
                s_v.append(r["vertical_airspeed"])
            if not (f1 and f2 and a and s):
                unstable = 1

        approach_start = int(min(r["time"] for r in final)) - 1 if final else None
        approach_end = int(max(r["time"] for r in final)) if final else None

        # landing window (W5): remaining low-island rows after the
        # approach end, clipped at the next episode
        landing_start = landing_end = None
        landing_type = "go-around"
        if approach_end is not None:
            next_start_time = None
            if ep_id < len(episodes):
                n0, n1 = episodes[ep_id]
                nf = [
                    r for r in rows[n0 : n1 + 1]
                    if th.final_min_agl <= r["agl"] <= th.final_max_agl
                ]
                if nf:
                    next_start_time = int(min(r["time"] for r in nf)) - 1
            k = next(
                (idx for idx, r in enumerate(rows) if r["time"] == approach_end), None
            )
            landing_rows = []
            if k is not None:
                j = k + 1
                while j < len(rows) and low[j]:
                    if next_start_time is not None and rows[j]["time"] >= next_start_time:
                        break
                    landing_rows.append((j, rows[j]))
                    j += 1
            if landing_rows:
                landing_start = int(landing_rows[0][1]["time"])
                landing_end = int(landing_rows[-1][1]["time"])
                min_ias = min(r["indicated_airspeed"] for _, r in landing_rows)
                roll5_vals = []
                for j, _ in landing_rows:
                    # trailing-5 AGL mean over the low island, warm-up
                    # guarded (FlightAnalysis.py:301-307): count only
                    # once 5 in-island rows are in the frame
                    frame = []
                    jj = j
                    while jj >= 0 and len(frame) < 5 and low[jj]:
                        frame.append(rows[jj]["agl"])
                        jj -= 1
                    if len(frame) == 5:
                        # 1e-6 quantized like approach.analyze's roll5
                        roll5_vals.append(round(sum(frame) / 5.0, 6))
                if min_ias <= th.full_stop_ias:
                    landing_type = "stop-and-go"
                elif roll5_vals and min(roll5_vals) <= th.touch_go_agl:
                    landing_type = "touch-and-go"

        out.append(
            (
                flight_id, ep_id, airport["airport_code"],
                runway["runway_code"] if runway else None,
                approach_start, approach_end, landing_start, landing_end,
                landing_type, unstable,
                _mean(all_h), _mean(f1_h), _mean(all_x), _mean(f2_x),
                _mean(all_i), _mean(a_i), _mean(all_v), _mean(s_v),
            )
        )
    return out


def analyze_twin(
    flight_df: DataFrame,
    airports: DataFrame,
    runways: DataFrame,
    th: Thresholds = Thresholds(),
) -> DataFrame:
    """Grouped-map twin: one pandas group per flight, sequential
    canonical semantics. Airports/runways are collected driver-side
    (true dimensions) and closed over — the moral equivalent of the
    reference's fork-inherited airports dict (main.py:43, 136)."""
    airports_l = [r.asDict() for r in airports.collect()]
    runways_by: dict[str, list[dict]] = {}
    for r in runways.collect():
        runways_by.setdefault(r["airport_code"], []).append(r.asDict())

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = _analyze_one_flight(pdf, airports_l, runways_by, th)
        return pd.DataFrame(rows, columns=[f.name for f in RESULT_SCHEMA.fields])

    return flight_df.groupBy("flight").applyInPandas(apply_fn, schema=RESULT_SCHEMA)
