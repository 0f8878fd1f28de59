"""Batch-4: touches/crosses/overlaps + utility functions."""

import numpy as np
import pytest

from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


SQ = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
SQ_RIGHT = "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"       # shares edge x=2
SQ_CROSSING = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"    # overlaps SQ
SQ_FAR = "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))"


PRED_CASES = [
    # touches: shared boundary, disjoint interiors
    (f"ST_Touches(ST_GeomFromText('{SQ}'), ST_GeomFromText('{SQ_RIGHT}'))", True),
    (f"ST_Touches(ST_GeomFromText('{SQ}'), ST_GeomFromText('{SQ_CROSSING}'))", False),
    (f"ST_Touches(ST_GeomFromText('{SQ}'), ST_GeomFromText('{SQ_FAR}'))", False),
    (f"ST_Touches(ST_Point(2.0, 1.0), ST_GeomFromText('{SQ}'))", True),   # on edge
    (f"ST_Touches(ST_Point(1.0, 1.0), ST_GeomFromText('{SQ}'))", False),  # interior
    ("ST_Touches(ST_GeomFromText('LINESTRING (0 0, 1 0)'),"
     " ST_GeomFromText('LINESTRING (1 0, 2 0)'))", True),                # endpoint
    ("ST_Touches(ST_GeomFromText('LINESTRING (0 0, 2 0)'),"
     " ST_GeomFromText('LINESTRING (1 0, 3 0)'))", False),               # overlap
    # crosses
    ("ST_Crosses(ST_GeomFromText('LINESTRING (0 0, 2 2)'),"
     " ST_GeomFromText('LINESTRING (0 2, 2 0)'))", True),
    ("ST_Crosses(ST_GeomFromText('LINESTRING (0 0, 1 1)'),"
     " ST_GeomFromText('LINESTRING (2 2, 3 3)'))", False),
    (f"ST_Crosses(ST_GeomFromText('LINESTRING (-1 1, 3 1)'), ST_GeomFromText('{SQ}'))", True),
    (f"ST_Crosses(ST_GeomFromText('LINESTRING (0.5 0.5, 1.5 1.5)'), ST_GeomFromText('{SQ}'))", False),
    # overlaps
    (f"ST_Overlaps(ST_GeomFromText('{SQ}'), ST_GeomFromText('{SQ_CROSSING}'))", True),
    (f"ST_Overlaps(ST_GeomFromText('{SQ}'), ST_GeomFromText('{SQ_RIGHT}'))", False),
    (f"ST_Overlaps(ST_GeomFromText('{SQ}'), ST_GeomFromText('{SQ}'))", False),  # equal
    ("ST_Overlaps(ST_GeomFromText('LINESTRING (0 0, 2 0)'),"
     " ST_GeomFromText('LINESTRING (1 0, 3 0)'))", True),
    ("ST_Overlaps(ST_GeomFromText('LINESTRING (0 0, 2 2)'),"
     " ST_GeomFromText('LINESTRING (0 2, 2 0)'))", False),  # point crossing
    ("ST_Overlaps(ST_GeomFromText('MULTIPOINT ((0 0), (1 1))'),"
     " ST_GeomFromText('MULTIPOINT ((1 1), (2 2))'))", True),
    # collections
    ("ST_IsCollection(ST_GeomFromText('MULTIPOINT ((0 0))'))", True),
    ("ST_IsCollection(ST_Point(0.0, 0.0))", False),
]


@pytest.mark.parametrize("expr,expected", PRED_CASES)
def test_predicates4(spark, expr, expected):
    assert one(spark, expr) == expected


def test_snap(spark):
    v = one(spark, "ST_AsText(ST_Snap(ST_GeomFromText('LINESTRING (0.05 0, 1 1)'),"
                   " ST_GeomFromText('POINT (0 0)'), 0.1))")
    assert v == "LINESTRING (0 0, 1 1)"


def test_rotatex(spark):
    v = one(spark, "ST_AsText(ST_RotateX(ST_PointZ(0.0, 1.0, 0.0), 1.5707963267948966))")
    g = W.from_wkt(v)
    np.testing.assert_allclose(g[1], [0, 0, 1], atol=1e-15)


def test_concavehull(spark):
    # ratio=1 == convex hull
    a = one(spark, "ST_Area(ST_ConcaveHull(ST_GeomFromText("
                   "'MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 2))'), 1.0))")
    assert a == 16.0
    # smaller ratio digs inward: area must not exceed convex hull's
    a2 = one(spark, "ST_Area(ST_ConcaveHull(ST_GeomFromText("
                    "'MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 1))'), 0.3))")
    assert a2 <= 16.0


def test_minimum_clearance(spark):
    v = one(spark, "ST_MinimumClearance(ST_GeomFromText("
                   "'POLYGON ((0 0, 10 0, 10 10, 5 1, 0 10, 0 0))'))")
    assert v == pytest.approx(1.0)


def test_union_partial(spark):
    v = one(spark, "ST_AsText(ST_Union(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),"
                   " ST_GeomFromText('POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))')))")
    assert v.startswith("MULTIPOLYGON")
    # contained → containing polygon
    v = one(spark, "ST_AsText(ST_Union(ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),"
                   " ST_GeomFromText('POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))')))")
    assert v == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    # overlapping → region-exact slab overlay
    a = one(spark, f"ST_Area(ST_Union(ST_GeomFromText('{SQ}'),"
                   f" ST_GeomFromText('{SQ_CROSSING}')))")
    assert a == pytest.approx(7.0)


def test_srid_crs_round_trip(spark):
    v = one(spark, "ST_CRS(ST_SetSRID(ST_Point(1.0, 2.0), 3857))")
    assert v == "EPSG:3857"
    v = one(spark, "ST_SRID(ST_SetSRID(ST_Point(1.0, 2.0), 3857))")
    assert v == 3857
    v = one(spark, "ST_CRS(ST_Point(1.0, 2.0))")
    assert v == "OGC:CRS84"
    # geometry survives the SRID tag
    v = one(spark, "ST_AsText(ST_SetSRID(ST_Point(1.0, 2.0), 3857))")
    assert v == "POINT (1 2)"


def test_sd_helpers(spark):
    v = one(spark, "SD_Format(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2, 3 3)'), 15)")
    assert len(v) <= 15 and v.endswith("…")
    a = one(spark, "SD_Order(ST_Point(-100.0, 40.0))")
    b = one(spark, "SD_Order(ST_Point(-100.0001, 40.0001))")
    c = one(spark, "SD_Order(ST_Point(100.0, -40.0))")
    assert abs(a - b) < abs(a - c)  # nearby points get nearby keys


def test_ewkt_geog_aliases(spark):
    assert one(spark, "ST_AsText(ST_GeomFromEWKT('SRID=4326;POINT (1 2)'))") == "POINT (1 2)"
    assert one(spark, "ST_AsText(ST_GeogPoint(1.0, 2.0))") == "POINT (1 2)"
