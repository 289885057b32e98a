"""Geodesy as pure Spark column expressions — zero Python UDFs.

Re-expresses the reference's hand-rolled vector geodesy (reference
LatLon.py:13-263, Vector3d.py:11-184) as Catalyst column expressions
built from F.sin/cos/atan2/sqrt/etc. Every function stays inside
whole-stage codegen, so these run vectorized JVM-side at any scale —
the naive port (a Python LatLon object per row, reference main.py:95)
would serialize every row through the Python worker.

Semantics follow the n-vector formulation the reference uses:
  * lat/lon degrees -> unit n-vector            (LatLon.py:51-69)
  * great-circle distance = angle * R           (LatLon.py:95-117)
  * initial bearing via cross products          (LatLon.py:119-143)
  * midpoint = normalized vector sum            (LatLon.py:145-163)
  * destination point by dead reckoning         (LatLon.py:165-194)
  * signed cross-track distance                 (LatLon.py:196-231)
  * circular heading difference 0..180          (FlightAnalysis.py:130-132)

Golden values for all of these come from the reference's docstring
examples (FIXTURES.md §8) and are asserted in tests/test_geo.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mean Earth radius. The reference uses 6371 km by default
# (LatLon.py:99), 3959 mi for approach distance (FlightAnalysis.py:5)
# and 20,902,000 ft for crosstrack (FlightAnalysis.py:6).
EARTH_RADIUS_M = 6_371_000.0
EARTH_RADIUS_MI = 3_959.0
EARTH_RADIUS_FT = 20_902_000.0


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def heading_difference(h1, h2) -> Column:
    """Circular heading difference in [0, 180].

    Reference: ``180 - abs(abs(h1 - h2) - 180)``
    (FlightAnalysis.py:130-132; inlined again at :193 and :382).
    """
    h1, h2 = _col(h1), _col(h2)
    return F.lit(180.0) - F.abs(F.abs(h1 - h2) - F.lit(180.0))


def to_nvector(lat, lon) -> tuple[Column, Column, Column]:
    """Degrees lat/lon -> unit n-vector (x, y, z). LatLon.py:51-69."""
    rlat, rlon = F.radians(_col(lat)), F.radians(_col(lon))
    return (
        F.cos(rlat) * F.cos(rlon),
        F.cos(rlat) * F.sin(rlon),
        F.sin(rlat),
    )


def _cross(a, b) -> tuple[Column, Column, Column]:
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b) -> Column:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def distance(lat1, lon1, lat2, lon2, radius: float = EARTH_RADIUS_M) -> Column:
    """Great-circle distance via n-vector angle (LatLon.py:95-117):
    ``atan2(|a x b|, a . b) * R`` — numerically stable haversine
    equivalent. Docstring golden: (52.205,0.119)->(48.857,2.351)
    ~ 404,300 m (LatLon.py:104-106)."""
    a = to_nvector(lat1, lon1)
    b = to_nvector(lat2, lon2)
    return F.atan2(_norm(_cross(a, b)), _dot(a, b)) * F.lit(float(radius))


def bearing(lat1, lon1, lat2, lon2) -> Column:
    """Initial bearing 0..360 degrees (LatLon.py:119-143). Golden:
    (52.205,0.119)->(48.857,2.351) ~ 156.2 deg (LatLon.py:128-129)."""
    a = to_nvector(lat1, lon1)
    b = to_nvector(lat2, lon2)
    north = (F.lit(0.0), F.lit(0.0), F.lit(1.0))
    c1 = _cross(a, b)       # great circle through a and b
    c2 = _cross(a, north)   # great circle through a and north pole
    # signed angle between the two great-circle normals, sign from a
    sin_theta = _norm(_cross(c1, c2)) * F.signum(_dot(_cross(c1, c2), a))
    theta = F.atan2(sin_theta, _dot(c1, c2))
    return F.pmod(F.degrees(theta) + F.lit(360.0), F.lit(360.0))


def midpoint(lat1, lon1, lat2, lon2) -> tuple[Column, Column]:
    """Geographic midpoint = normalized n-vector sum (LatLon.py:145-163).
    Golden: ~ (50.5363, 1.2746) (LatLon.py:155)."""
    a = to_nvector(lat1, lon1)
    b = to_nvector(lat2, lon2)
    s = (a[0] + b[0], a[1] + b[1], a[2] + b[2])
    return nvector_to_latlon(s)


def nvector_to_latlon(v) -> tuple[Column, Column]:
    """n-vector -> (lat, lon) degrees (LatLon.py:246-263)."""
    x, y, z = v
    lat = F.degrees(F.atan2(z, F.sqrt(x * x + y * y)))
    lon = F.degrees(F.atan2(y, x))
    return lat, lon


def destination_point(lat, lon, dist, brg, radius: float = EARTH_RADIUS_M) -> tuple[Column, Column]:
    """Dead-reckoned destination from start, distance, bearing
    (LatLon.py:165-194). Golden: (51.4778,-0.0015) + 7794 m @ 300.7
    ~ (51.5135, -0.0983) (LatLon.py:176-177)."""
    a = to_nvector(lat, lon)
    north = (F.lit(0.0), F.lit(0.0), F.lit(1.0))
    theta = F.radians(_col(brg))
    delta = _col(dist) / F.lit(float(radius))
    # local east/north direction vectors at a
    de_ = _cross(north, a)
    de_n = _norm(de_)
    de = (de_[0] / de_n, de_[1] / de_n, de_[2] / de_n)
    dn = _cross(a, de)
    # direction of travel d = n*cos(brg) + e*sin(brg)
    d = tuple(dn[i] * F.cos(theta) + de[i] * F.sin(theta) for i in range(3))
    b = tuple(a[i] * F.cos(delta) + d[i] * F.sin(delta) for i in range(3))
    return nvector_to_latlon(b)


def cross_track_distance(
    lat, lon, start_lat, start_lon, brg, radius: float = EARTH_RADIUS_FT
) -> Column:
    """Signed distance from point to the great circle defined by a
    start point and an initial bearing (LatLon.py:196-231; used with
    R in feet at FlightAnalysis.py:332-345). Negative = left of the
    path, positive = right. Golden: (53.2611,-0.7972) vs
    (53.3206,-1.7297)@96.0 ~ -305.7 m (LatLon.py:206-212)."""
    gc = great_circle_normal(start_lat, start_lon, brg)
    p = to_nvector(lat, lon)
    # angle between point and the great-circle *normal*
    alpha = F.atan2(_norm(_cross(gc, p)), _dot(gc, p))
    # distance angle from the plane itself = alpha - pi/2 (signed;
    # negative = left of track, matching LatLon.py:206-212's -305.7 m)
    return (alpha - F.lit(1.5707963267948966)) * F.lit(float(radius))


def great_circle_normal(lat, lon, brg) -> tuple[Column, Column, Column]:
    """Normal vector of the great circle leaving (lat, lon) at bearing
    brg (LatLon.py:71-93). Golden: (53.3206,-1.7297)@96.0 ~
    [-0.794, 0.129, 0.594] (LatLon.py:81-82)."""
    rlat, rlon = F.radians(_col(lat)), F.radians(_col(lon))
    theta = F.radians(_col(brg))
    return (
        F.sin(rlon) * F.cos(theta) - F.sin(rlat) * F.cos(rlon) * F.sin(theta),
        -F.cos(rlon) * F.cos(theta) - F.sin(rlat) * F.sin(rlon) * F.sin(theta),
        F.cos(rlat) * F.sin(theta),
    )


def manhattan_deg(lat1, lon1, lat2, lon2) -> Column:
    """|dlat| + |dlon| — the reference's cheap nearest-airport metric
    (FlightAnalysis.py:356-366)."""
    return F.abs(_col(lat1) - _col(lat2)) + F.abs(_col(lon1) - _col(lon2))


def agl(msl_altitude, field_elevation) -> Column:
    """Height above ground level (FlightAnalysis.py:143: msl - airport
    elevation)."""
    return _col(msl_altitude) - _col(field_elevation)
