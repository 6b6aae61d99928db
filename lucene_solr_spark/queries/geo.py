"""LatLon point geo operators: nearest-k, polygon, box — Spark-first.

Reference surface (the sandbox LatLonPoint family):
  lucene/sandbox/src/java/org/apache/lucene/document/NearestNeighbor.java
    (LatLonPoint.nearest: BKD cell-priority traversal with a k-sized
     NearestHit queue keyed by haversinSortKey, ties by docID)
  lucene/sandbox/src/java/org/apache/lucene/document/LatLonPointSortField.java
    + LatLonPointDistanceComparator.java (sort-by-distance comparator —
    compares haversinSortKey, converts to meters only for display)
  lucene/sandbox/src/java/org/apache/lucene/document/LatLonPointInPolygonQuery.java
    (two-phase: BKD bounding-box cell relate() prune, then the exact
     odd-even crossings test of core geo/Polygon2D.java:328-346)
  lucene/core/src/java/org/apache/lucene/util/SloppyMath.java:87-95
    (haversinSortKey: h = (1-cos(dx)) + cos(x1)cos(x2)(1-cos(dlon)),
     monotone in distance) and :59-60 (haversinMeters =
     2·TO_METERS·asin(min(1, sqrt(h·0.5))))

Spark restatement
-----------------
* nearest-k: the BKD best-cell traversal is Lucene pruning one node's
  point tree; the distributed analog is (a) an optional sargable
  bounding-box prefilter (parquet row-group min/max pruning == BKD cell
  relate()) and (b) a per-partition k-heap merged on the driver — which
  is exactly Catalyst's TakeOrderedAndProject.  We sort on the raw
  haversin sort key (NO asin/sqrt per row, mirroring
  LatLonPointDistanceComparator) and convert only the k winners to km.
* polygon: the exact test is pure +,·,/ and comparisons per edge —
  expressible as ONE whole-stage-codegen column expression (unrolled
  odd-even crossing sum), identical arithmetic to Polygon2D's edge tree
  visit, preceded by the sargable bbox prefilter.  Holes subtract via
  the same test (Polygon2D.componentContains:109-122).
* box: a plain range conjunction (LatLonPoint.newBoxQuery /
  LatLonDocValuesBoxQuery.java) — fully sargable, pushed to the scan.

At 100 TB the prefilters are the scale story: lat/lon range predicates
reach the parquet scan as PushedFilters, so a city-block polygon query
reads only row groups whose min/max stats overlap the polygon's bbox —
the same work-skipping BKD gives the reference on one node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# SloppyMath.java:203 — equatorial radius in meters (TO_METERS)
TO_METERS = 6_371_008.7714


def haversin_sort_key(
    lat_col: Column, lon_col: Column, lat: float, lon: float
) -> Column:
    """SloppyMath.haversinSortKey(SloppyMath.java:87-95) as a column:
    h1 + cos(x1)·cos(x2)·h2 with h = 1-cos(·) halves.  Monotone in
    great-circle distance, so top-k ordering never pays asin/sqrt.
    (The reference's 3-LSB precision clobber is an intra-JVM tie
    stabilizer; ordering here also tie-breaks by doc id, so it is not
    needed for determinism.)"""
    x1 = F.radians(lat_col)
    x2 = F.radians(F.lit(float(lat)))
    h1 = F.lit(1.0) - F.cos(x1 - x2)
    h2 = F.lit(1.0) - F.cos(F.radians(lon_col - F.lit(float(lon))))
    return h1 + F.cos(x1) * F.cos(x2) * h2


def sort_key_to_km(key: Column) -> Column:
    """SloppyMath.haversinMeters(sortKey) (SloppyMath.java:59-60) → km."""
    return (
        F.lit(2.0 * TO_METERS / 1000.0)
        * F.asin(F.least(F.lit(1.0), F.sqrt(key * F.lit(0.5))))
    )


def distance_box(
    lat: float, lon: float, d_km: float
) -> tuple[float, float, list[tuple[float, float]]]:
    """DistanceUtils.calcBoxByDistFromPtDEG: the superset bounding box
    of the d_km circle — dlat = d/R, dlon = asin(sin(d/R)/cos φ); a
    pole-crossing circle clamps latitude and admits all longitudes;
    dateline crossing yields two longitude ranges.  Returns
    (lat_lo, lat_hi, [(lon_lo, lon_hi), ...])."""
    import math

    r = d_km / (TO_METERS / 1000.0)
    dlat = math.degrees(r)
    lat_lo, lat_hi = lat - dlat, lat + dlat
    if lat_lo <= -90.0 or lat_hi >= 90.0:
        return max(lat_lo, -90.0), min(lat_hi, 90.0), [(-180.0, 180.0)]
    dlon = math.degrees(
        math.asin(min(1.0, math.sin(r) / math.cos(math.radians(lat))))
    )
    lon_lo, lon_hi = lon - dlon, lon + dlon
    if lon_lo < -180.0:
        return lat_lo, lat_hi, [(lon_lo + 360.0, 180.0), (-180.0, lon_hi)]
    if lon_hi > 180.0:
        return lat_lo, lat_hi, [(lon_lo, 180.0), (-180.0, lon_hi - 360.0)]
    return lat_lo, lat_hi, [(lon_lo, lon_hi)]


def nearest(
    df: DataFrame,
    lat: float,
    lon: float,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "doc_id",
    max_km: float | None = None,
) -> DataFrame:
    """LatLonPoint.nearest (NearestNeighbor.java:186-260): k closest
    points, ordered by (distance ASC, id ASC).  Returns id, dist_km.

    ``max_km`` adds the sargable bbox prefilter of
    LatLonPointDistanceQuery (scan-side pruning); without it the scan
    is full but the plan is still a shuffle-free TakeOrderedAndProject
    (per-partition k-heap + driver merge — NearestNeighbor's hitQueue
    shape distributed)."""
    out = df
    if max_km is not None:
        lat_lo, lat_hi, ranges = distance_box(lat, lon, max_km)
        lon_pred = None
        for lo, hi in ranges:
            p = (F.col(lon_col) >= lo) & (F.col(lon_col) <= hi)
            lon_pred = p if lon_pred is None else (lon_pred | p)
        out = out.filter(
            (F.col(lat_col) >= lat_lo) & (F.col(lat_col) <= lat_hi) & lon_pred
        )
    key = haversin_sort_key(F.col(lat_col), F.col(lon_col), lat, lon)
    out = (
        out.select(F.col(id_col), key.alias("_sort_key"))
        .orderBy(F.col("_sort_key").asc(), F.col(id_col).asc())
        .limit(k)
    )
    out = out.select(
        id_col, sort_key_to_km(F.col("_sort_key")).alias("dist_km")
    )
    if max_km is not None:
        # the bbox is a superset; enforce the exact radius on winners
        out = out.filter(F.col("dist_km") <= float(max_km))
    return out


def polygon_contains(
    lat_col: Column,
    lon_col: Column,
    lats: list[float],
    lons: list[float],
) -> Column:
    """Odd-even crossings containment (Polygon2D.java:328-346, the
    pnpoly form): XOR over edges of
      (lat1 > y) != (lat2 > y)  AND
      x < (lon1-lon2)·(y-lat2)/(lat1-lat2) + lon2
    as an unrolled crossing-count parity — one codegen'd expression,
    bit-identical double arithmetic to the reference edge test.

    ``lats``/``lons`` is one ring, first vertex NOT repeated at the end
    (edges close the ring implicitly, Polygon2D.createTree pairing)."""
    n = len(lats)
    if n != len(lons) or n < 3:
        raise ValueError("polygon ring needs >= 3 (lat, lon) vertices")
    crossings: Column | None = None
    for i in range(n):
        lat1, lon1 = float(lats[i]), float(lons[i])
        lat2, lon2 = float(lats[(i + 1) % n]), float(lons[(i + 1) % n])
        if lat1 == lat2:
            continue  # horizontal edge can't cross a horizontal ray
        edge = (
            ((F.lit(lat1) > lat_col) != (F.lit(lat2) > lat_col))
            & (
                lon_col
                < F.lit(lon1 - lon2)
                * (lat_col - F.lit(lat2))
                / F.lit(lat1 - lat2)
                + F.lit(lon2)
            )
        ).cast("int")
        crossings = edge if crossings is None else crossings + edge
    assert crossings is not None
    return (crossings % 2) == 1


def polygon_bbox(lats: list[float], lons: list[float]) -> tuple:
    return min(lats), max(lats), min(lons), max(lons)


def polygon_query(
    df: DataFrame,
    shell: tuple[list[float], list[float]],
    holes: list[tuple[list[float], list[float]]] | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPointInPolygonQuery: two-phase — sargable bbox prefilter
    (the scan-side analog of Polygon2D.relate() cell pruning) then the
    exact crossings test; holes un-contain
    (Polygon2D.componentContains:109-122)."""
    s_lats, s_lons = shell
    min_lat, max_lat, min_lon, max_lon = polygon_bbox(s_lats, s_lons)
    la, lo = F.col(lat_col), F.col(lon_col)
    out = df.filter(
        (la >= min_lat) & (la <= max_lat) & (lo >= min_lon) & (lo <= max_lon)
    )
    inside = polygon_contains(la, lo, s_lats, s_lons)
    for h_lats, h_lons in holes or []:
        inside = inside & ~polygon_contains(la, lo, h_lats, h_lons)
    return out.filter(inside)


def box_query(
    df: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPoint.newBoxQuery / LatLonDocValuesBoxQuery.java — a plain
    sargable range conjunction; crosses the dateline when
    min_lon > max_lon (two ranges OR'd, both still pushed down)."""
    la, lo = F.col(lat_col), F.col(lon_col)
    lat_pred = (la >= min_lat) & (la <= max_lat)
    if min_lon <= max_lon:
        lon_pred = (lo >= min_lon) & (lo <= max_lon)
    else:  # dateline crossing (LatLonPoint.newBoxQuery splits the same way)
        lon_pred = (lo >= min_lon) | (lo <= max_lon)
    return df.filter(lat_pred & lon_pred)
