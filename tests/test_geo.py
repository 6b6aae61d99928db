"""LatLonPoint geo operators vs a local brute-force replica.

Reference semantics under test:
  NearestNeighbor.java (LatLonPoint.nearest) — k nearest by haversin
    sort key, ties by id; SloppyMath.java:59-95 for the key/meters math
  LatLonPointInPolygonQuery + Polygon2D.java:328-346 — odd-even
    crossings containment, holes subtract
  LatLonPoint.newBoxQuery — sargable box incl. dateline split
  DistanceUtils.calcBoxByDistFromPtDEG — circle-superset bbox with
    pole clamp and dateline wrap (the ADVICE.md {!bbox} fix is the
    same formula)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.queries import geo

TO_KM = geo.TO_METERS / 1000.0


def _latlon(i: int) -> tuple[float, float]:
    return (i % 180) - 90 + 0.5, ((i * 7) % 360) - 180 + 0.5


def _hav_km(lat1, lon1, lat2, lon2) -> float:
    x1, x2 = math.radians(lat1), math.radians(lat2)
    h = (1 - math.cos(x1 - x2)) + math.cos(x1) * math.cos(x2) * (
        1 - math.cos(math.radians(lon1 - lon2))
    )
    return 2 * TO_KM * math.asin(min(1.0, math.sqrt(h * 0.5)))


@pytest.fixture(scope="module")
def pts(spark):
    rows = [(i, *_latlon(i)) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, lat double, lon double")


def test_nearest_matches_brute_force(pts):
    got = geo.nearest(pts, -55.0, -20.0, k=7).collect()
    want = sorted(
        range(60), key=lambda i: (_hav_km(*_latlon(i), -55.0, -20.0), i)
    )[:7]
    assert [r.doc_id for r in got] == want
    for r in got:
        assert r.dist_km == pytest.approx(
            _hav_km(*_latlon(r.doc_id), -55.0, -20.0), abs=1e-9
        )


def test_nearest_bbox_prefilter_is_lossless(pts):
    # the calcBoxByDistFromPtDEG box is a circle superset: prefiltered
    # top-k equals unfiltered top-k restricted to the radius
    full = [
        r.doc_id
        for r in geo.nearest(pts, -55.0, -20.0, k=20).collect()
        if r.dist_km <= 3000.0
    ]
    pruned = [
        r.doc_id
        for r in geo.nearest(pts, -55.0, -20.0, k=20, max_km=3000.0).collect()
    ]
    assert pruned == full


def test_distance_box_pole_and_dateline():
    # circle over the south pole: lat clamped, all longitudes admitted
    lat_lo, lat_hi, lon_ranges = geo.distance_box(-85.0, 10.0, 2000.0)
    assert lat_lo == -90.0 and lon_ranges == [(-180.0, 180.0)]
    # dateline wrap: two longitude ranges, jointly covering the circle
    _, _, ranges = geo.distance_box(0.0, 179.5, 500.0)
    assert len(ranges) == 2
    assert ranges[0][1] == 180.0 and ranges[1][0] == -180.0
    # superset property at the east/west extremes (the ADVICE.md bug:
    # the linear d/(R cos phi) approximation UNDERestimates; asin form
    # must contain the true circle edge)
    lat_lo, lat_hi, ranges = geo.distance_box(40.7, -74.0, 1500.0)
    r = 1500.0 / TO_KM
    # walk the circle boundary; every boundary point must fall in box
    for t in range(0, 360, 5):
        b = math.radians(t)
        lat = math.degrees(
            math.asin(
                math.sin(math.radians(40.7)) * math.cos(r)
                + math.cos(math.radians(40.7))
                * math.sin(r)
                * math.cos(b)
            )
        )
        lon = -74.0 + math.degrees(
            math.atan2(
                math.sin(b) * math.sin(r) * math.cos(math.radians(40.7)),
                math.cos(r)
                - math.sin(math.radians(40.7)) * math.sin(math.radians(lat)),
            )
        )
        assert lat_lo - 1e-9 <= lat <= lat_hi + 1e-9
        assert any(lo - 1e-9 <= lon <= hi + 1e-9 for lo, hi in ranges)


def test_polygon_with_hole_matches_replica(pts):
    shell = ([-85.0, -35.0, -35.0, -60.0, -85.0],
             [-130.0, -110.0, -20.0, 10.0, -10.0])
    hole = ([-70.0, -50.0, -50.0, -70.0], [-90.0, -90.0, -50.0, -50.0])

    def contains(lat, lon, lats, lons):
        c = 0
        for i in range(len(lats)):
            la1, lo1 = lats[i], lons[i]
            la2 = lats[(i + 1) % len(lats)]
            lo2 = lons[(i + 1) % len(lats)]
            if la1 == la2:
                continue
            if (la1 > lat) != (la2 > lat) and lon < (lo1 - lo2) * (
                lat - la2
            ) / (la1 - la2) + lo2:
                c += 1
        return c % 2 == 1

    got = sorted(
        r.doc_id
        for r in geo.polygon_query(pts, shell, holes=[hole]).collect()
    )
    want = [
        i
        for i in range(60)
        if contains(*_latlon(i), *shell) and not contains(*_latlon(i), *hole)
    ]
    assert got == want and len(want) > 0


def test_box_query_dateline_split(pts):
    got = sorted(
        r.doc_id
        for r in geo.box_query(pts, -80.0, -35.0, 140.0, -140.0).collect()
    )
    want = [
        i
        for i in range(60)
        if -80.0 <= _latlon(i)[0] <= -35.0
        and (_latlon(i)[1] >= 140.0 or _latlon(i)[1] <= -140.0)
    ]
    assert got == want and len(want) > 0


def test_nearest_plan_is_take_ordered(pts):
    # NearestNeighbor's k-heap distributed: per-partition top-k merged
    # on the driver, no shuffle stage
    out = geo.nearest(pts, -55.0, -20.0, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_polygon_filter_is_codegen(pts):
    shell = ([-85.0, -35.0, -35.0, -60.0, -85.0],
             [-130.0, -110.0, -20.0, 10.0, -10.0])
    out = geo.polygon_query(pts, shell)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the `*(n)` prefix marks a WholeStageCodegen stage; the crossing
    # test must live inside one (no interpreted/UDF evaluation)
    assert plan.lstrip().startswith("*(") and "Filter" in plan
