"""Geosearch: radius / polygon filters + distance-ranked geo-only
queries (SURVEY §2.6 geo; the one operator family absent in round 1).

Reference semantics reproduced:
  * radius filter     components/index.ts:664-686, trees/bkd.ts:182-220
                      (inclusive: dist <= r; inside=False: dist > r)
  * polygon filter    components/index.ts:687-697, trees/bkd.ts:222-260
                      (ray casting, trees/bkd.ts:312-330)
  * haversine         trees/bkd.ts:335-349 (R = 6371e3 m)
  * vincenty          trees/bkd.ts:351-430 (highPrecision=True)
  * unit conversion   utils.ts:297-315
  * geo-only query    components/index.ts:945-1051: score =
                      maxDist - dist + 1 over the matched set; polygon
                      queries rank by distance to the signed-area
                      centroid (trees/bkd.ts:289-310)

Spark mapping (scale-first): a geopoint is a struct<lat:double,
lon:double> column. The reference walks a BKD tree per query; here the
filter is ONE whole-stage-codegen Column expression over the docs scan —
haversine is ~10 flops/row, the ray cast unrolls the (literal) polygon
into a boolean expression chain. No tree, no shuffle; at 10^12 docs the
scan is partition-pruned by any accompanying predicate and the geo
expression vectorizes. The geo-only score needs max(dist) over matches:
a 1-row aggregate broadcast-cross-joined into the plan (no driver
action). Vincenty is iterative -> vectorized numpy pandas_udf
(highPrecision is the documented slow path, as in the reference).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType

EARTH_RADIUS = 6371e3  # trees/bkd.ts:22

# utils.ts:297-304
_UNIT_TO_METERS = {"cm": 0.01, "m": 1.0, "km": 1000.0, "ft": 0.3048, "yd": 0.9144, "mi": 1609.344}


def convert_distance_to_meters(value: float, unit: str = "m") -> float:
    ratio = _UNIT_TO_METERS.get(unit)
    if ratio is None:
        raise ValueError(f"INVALID_DISTANCE_SUFFIX: {unit}")
    return value * ratio


def haversine_m(lat_col: Column, lon_col: Column, center: dict) -> Column:
    """Great-circle distance in meters (trees/bkd.ts:335-349) as a pure
    codegen expression: identical formula, IEEE-754 doubles."""
    p = math.pi / 180.0
    lat1 = F.lit(float(center["lat"]) * p)
    lat2 = lat_col * F.lit(p)
    dlat = (lat_col - F.lit(float(center["lat"]))) * F.lit(p)
    dlon = (lon_col - F.lit(float(center["lon"]))) * F.lit(p)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(lat1) * F.cos(lat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def vincenty_py(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Vincenty inverse (trees/bkd.ts:351-430), scalar — used by the
    oracle and by the vectorized UDF below."""
    a = 6378137.0
    f = 1 / 298.257223563
    b = (1 - f) * a
    p = math.pi / 180.0
    u1 = math.atan((1 - f) * math.tan(lat1 * p))
    u2 = math.atan((1 - f) * math.tan(lat2 * p))
    dlon = (lon2 - lon1) * p
    sin_u1, cos_u1 = math.sin(u1), math.cos(u1)
    sin_u2, cos_u2 = math.sin(u2), math.cos(u2)
    lam = dlon
    for _ in range(1000):
        sin_l, cos_l = math.sin(lam), math.cos(lam)
        sin_sigma = math.sqrt(
            (cos_u2 * sin_l) ** 2 + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_l) ** 2
        )
        if sin_sigma == 0:
            return 0.0
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_l
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cos_u1 * cos_u2 * sin_l / sin_sigma
        cos2_alpha = 1 - sin_alpha * sin_alpha
        cos2_sigma_m = (
            cos_sigma - 2 * sin_u1 * sin_u2 / cos2_alpha if cos2_alpha else 0.0
        )
        if math.isnan(cos2_sigma_m):
            cos2_sigma_m = 0.0
        c = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
        prev = lam
        lam = dlon + (1 - c) * f * sin_alpha * (
            sigma + c * sin_sigma * (cos2_sigma_m + c * cos_sigma * (-1 + 2 * cos2_sigma_m**2))
        )
        if abs(lam - prev) <= 1e-12:
            break
    else:
        return float("nan")
    u_sq = cos2_alpha * (a * a - b * b) / (b * b)
    big_a = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    big_b = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    delta_sigma = (
        big_b
        * sin_sigma
        * (
            cos2_sigma_m
            + big_b
            / 4
            * (
                cos_sigma * (-1 + 2 * cos2_sigma_m**2)
                - big_b / 6 * cos2_sigma_m * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos2_sigma_m**2)
            )
        )
    )
    return b * big_a * (sigma - delta_sigma)


def vincenty_m(lat_col: Column, lon_col: Column, center: dict) -> Column:
    """highPrecision distance as an Arrow-batched UDF (the iteration
    count is data-dependent; per-row python inside a vectorized batch)."""
    clat, clon = float(center["lat"]), float(center["lon"])

    @F.pandas_udf(DoubleType())
    def _v(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            [vincenty_py(la, lo, clat, clon) for la, lo in zip(lat, lon)],
            dtype="float64",
        )

    return _v(lat_col, lon_col)


def point_in_polygon(lat_col: Column, lon_col: Column, polygon: Sequence[dict]) -> Column:
    """Ray casting (trees/bkd.ts:312-330) with the LITERAL polygon
    unrolled into a boolean expression chain — pure codegen, no UDF."""
    inside = F.lit(False)
    x, y = lon_col, lat_col
    n = len(polygon)
    j = n - 1
    for i in range(n):
        xi, yi = float(polygon[i]["lon"]), float(polygon[i]["lat"])
        xj, yj = float(polygon[j]["lon"]), float(polygon[j]["lat"])
        intersect = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
            x < F.lit(xj - xi) * (y - F.lit(yi)) / F.lit(yj - yi) + F.lit(xi)
        )
        inside = F.when(intersect, ~inside).otherwise(inside)
        j = i
    return inside


def polygon_centroid(polygon: Sequence[dict]) -> dict:
    """Signed-area centroid (trees/bkd.ts:289-310)."""
    total_area = cx = cy = 0.0
    n = len(polygon)
    j = n - 1
    for i in range(n):
        xi, yi = polygon[i]["lon"], polygon[i]["lat"]
        xj, yj = polygon[j]["lon"], polygon[j]["lat"]
        seg = xi * yj - xj * yi
        total_area += seg
        cx += (xi + xj) * seg
        cy += (yi + yj) * seg
        j = i
    total_area /= 2
    denom = 6 * total_area
    return {"lon": cx / denom, "lat": cy / denom}


def _latlon(prop: str) -> tuple[Column, Column]:
    return F.col(prop + ".lat"), F.col(prop + ".lon")


def geo_predicate(prop: str, operation: dict) -> Column:
    """Filter predicate for a geopoint leaf (components/index.ts:664-697).
    operation: {"radius": {...}} or {"polygon": {...}}."""
    lat, lon = _latlon(prop)
    if "radius" in operation:
        op = operation["radius"]
        r = convert_distance_to_meters(op["value"], op.get("unit", "m"))
        dist_fn = vincenty_m if op.get("highPrecision") else haversine_m
        d = dist_fn(lat, lon, op["coordinates"])
        pred = d <= F.lit(r) if op.get("inside", True) else d > F.lit(r)
    elif "polygon" in operation:
        op = operation["polygon"]
        inside = point_in_polygon(lat, lon, op["coordinates"])
        pred = inside if op.get("inside", True) else ~inside
    else:
        raise ValueError(f"Invalid operation {operation}")
    return lat.isNotNull() & pred


def geo_scored(
    docs: DataFrame, docid_col: str, prop: str, operation: dict
) -> DataFrame:
    """Distance-ranked geosearch-only query (index.ts:1004-1051 +
    createGeoTokenScores:945-976): filter, then score = maxDist - dist
    + 1 (closer = higher). The max is a broadcast 1-row aggregate — the
    whole query is one lazy plan."""
    lat, lon = _latlon(prop)
    if "radius" in operation:
        center = operation["radius"]["coordinates"]
        high = operation["radius"].get("highPrecision", False)
    else:
        center = polygon_centroid(operation["polygon"]["coordinates"])
        high = operation["polygon"].get("highPrecision", False)
    dist_fn = vincenty_m if high else haversine_m
    matched = docs.where(geo_predicate(prop, operation)).select(
        F.col(docid_col).alias("docid"), dist_fn(lat, lon, center).alias("__dist")
    )
    dmax = matched.agg(F.max("__dist").alias("__dmax"))
    return matched.crossJoin(F.broadcast(dmax)).select(
        "docid", (F.col("__dmax") - F.col("__dist") + 1).alias("score")
    )
