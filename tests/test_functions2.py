"""Batch-2 ST_ function tests (SQL golden cases + algorithm checks)."""

import json
import math

import numpy as np
import pytest

from sedona_db_spark.geometry import algos as A
from sedona_db_spark.geometry import wkb as W


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


CASES = [
    ("ST_AsText(ST_MakeLine(ST_Point(0.0, 0.0), ST_Point(1.0, 1.0)))",
     "LINESTRING (0 0, 1 1)"),
    ("ST_AsText(ST_PointZ(1.0, 2.0, 3.0))", "POINT Z (1 2 3)"),
    ("ST_AsGeoJSON(ST_Point(1.0, 2.0))", '{"type":"Point","coordinates":[1.0,2.0]}'),
    ("ST_SRID(ST_Point(1.0, 2.0))", 0),
    ("ST_SRID(ST_AsEWKB(ST_Point(1.0, 2.0), 4326))", 4326),
    ("ST_AsText(ST_Boundary(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 0))')))",
     "LINESTRING (0 0, 1 0, 1 1, 0 0)"),
    ("ST_AsText(ST_Boundary(ST_GeomFromText('LINESTRING (0 0, 5 5)')))",
     "MULTIPOINT ((0 0), (5 5))"),
    ("ST_NumInteriorRings(ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))", 1),
    ("ST_AsText(ST_ExteriorRing(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 0))')))",
     "LINESTRING (0 0, 1 0, 1 1, 0 0)"),
    ("ST_HasZ(ST_PointZ(1.0, 2.0, 3.0))", True),
    ("ST_HasZ(ST_Point(1.0, 2.0))", False),
    ("ST_Z(ST_PointZ(1.0, 2.0, 3.0))", 3.0),
    ("ST_IsValid(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))", True),
    ("ST_IsValid(ST_GeomFromText('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))", False),
    ("ST_IsValidReason(ST_GeomFromText('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))",
     "Self-intersection"),
    ("ST_IsSimple(ST_GeomFromText('LINESTRING (0 0, 2 2, 2 0, 0 2)'))", False),
    ("ST_IsSimple(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 0)'))", True),
    ("ST_IsRing(ST_GeomFromText('LINESTRING (0 0, 1 0, 1 1, 0 0)'))", True),
    ("ST_IsRing(ST_GeomFromText('LINESTRING (0 0, 1 0, 1 1)'))", False),
    ("ST_AsText(ST_Simplify(ST_GeomFromText('LINESTRING (0 0, 1 0.01, 2 0)'), 0.1))",
     "LINESTRING (0 0, 2 0)"),
    ("ST_AsText(ST_SnapToGrid(ST_Point(1.26, 2.44), 0.5))", "POINT (1.5 2.5)"),
    ("ST_AsText(ST_LineInterpolatePoint(ST_GeomFromText('LINESTRING (0 0, 10 0)'), 0.3))",
     "POINT (3 0)"),
    ("ST_LineLocatePoint(ST_GeomFromText('LINESTRING (0 0, 10 0)'), ST_Point(3.0, 5.0))",
     0.3),
    ("ST_AsText(ST_ClosestPoint(ST_GeomFromText('LINESTRING (0 0, 10 0)'), ST_Point(3.0, 5.0)))",
     "POINT (3 0)"),
    ("ST_AsText(ST_ShortestLine(ST_GeomFromText('LINESTRING (0 0, 10 0)'), ST_Point(3.0, 5.0)))",
     "LINESTRING (3 0, 3 5)"),
    ("ST_Azimuth(ST_Point(0.0, 0.0), ST_Point(0.0, 5.0))", 0.0),
    ("ST_MaxDistance(ST_GeomFromText('LINESTRING (0 0, 1 0)'), ST_GeomFromText('LINESTRING (0 3, 4 3)'))",
     5.0),
    ("ST_NumGeometries(ST_Collect(array(ST_Point(0.0, 0.0), ST_Point(1.0, 1.0))))", 2),
    ("ST_AsText(ST_Rotate(ST_Point(1.0, 0.0), radians(90.0)))", None),  # checked below
]


@pytest.mark.parametrize("expr,expected", [c for c in CASES if c[1] is not None])
def test_sql_golden2(spark, expr, expected):
    got = one(spark, expr)
    if isinstance(expected, float):
        assert got == pytest.approx(expected, abs=1e-12)
    else:
        assert got == expected


def test_azimuth_east(spark):
    assert one(spark, "ST_Azimuth(ST_Point(0.0,0.0), ST_Point(5.0,0.0))") == \
        pytest.approx(math.pi / 2)


def test_rotate(spark):
    v = one(spark, "ST_AsText(ST_Rotate(ST_Point(1.0, 0.0), 1.5707963267948966))")
    g = W.from_wkt(v)
    np.testing.assert_allclose(g[1], [0, 1], atol=1e-15)


def test_affine(spark):
    v = one(spark, "ST_AsText(ST_Affine(ST_Point(1.0, 2.0), 2.0, 0.0, 0.0, 3.0, 10.0, 20.0))")
    assert v == "POINT (12 26)"


def test_dump_explode(spark):
    rows = spark.sql("""
      SELECT ST_AsText(part) AS t FROM (
        SELECT explode(ST_Dump(ST_GeomFromText(
          'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))'))) AS part)
    """).collect()
    assert [r["t"] for r in rows] == [
        "POLYGON ((0 0, 1 0, 1 1, 0 0))", "POLYGON ((5 5, 6 5, 6 6, 5 5))"]


def test_intersection_cases(spark):
    # point ∩ polygon
    v = one(spark, "ST_AsText(ST_Intersection(ST_Point(1.0, 1.0),"
                   " ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')))")
    assert v == "POINT (1 1)"
    # line ∩ polygon (clip)
    v = one(spark, "ST_AsText(ST_Intersection("
                   "ST_GeomFromText('LINESTRING (-1 1, 3 1)'),"
                   "ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')))")
    assert v == "LINESTRING (0 1, 2 1)"
    # convex polygon clip: unit squares overlapping in [1,2]x[1,2]
    v = one(spark, "ST_Area(ST_Intersection("
                   "ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),"
                   "ST_GeomFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')))")
    assert v == pytest.approx(1.0)
    # disjoint → empty collection
    v = one(spark, "ST_IsEmpty(ST_Intersection(ST_Point(9.0, 9.0),"
                   " ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))")
    assert v is True


def test_transform_webmercator(spark):
    v = one(spark, "ST_AsText(ST_Transform(ST_Point(0.0, 0.0), 'EPSG:4326', 'EPSG:3857'))")
    assert v == "POINT (0 0)"
    v = one(spark, "ST_X(ST_Transform(ST_Point(180.0, 0.0), 'EPSG:4326', 'EPSG:3857'))")
    assert v == pytest.approx(20037508.342789244)
    # round trip
    v = one(spark, "ST_AsText(ST_Transform(ST_Transform(ST_Point(10.0, 45.0),"
                   " 'EPSG:4326', 'EPSG:3857'), 'EPSG:3857', 'EPSG:4326'))")
    g = W.from_wkt(v)
    np.testing.assert_allclose(g[1], [10.0, 45.0], atol=1e-9)


def test_distance_sphere(spark):
    # quarter meridian ≈ 10,007.5 km on the mean sphere
    v = one(spark, "ST_DistanceSphere(ST_Point(0.0, 0.0), ST_Point(0.0, 90.0))")
    assert v == pytest.approx(math.pi / 2 * 6371008.8, rel=1e-9)


def test_collect_agg_pattern(spark):
    rows = spark.sql("""
      SELECT ST_AsText(ST_Collect(collect_list(g))) AS t FROM (
        SELECT ST_Point(CAST(id AS DOUBLE), 0.0) AS g, id % 2 AS grp FROM range(4))
      GROUP BY grp ORDER BY grp
    """).collect()
    assert rows[0]["t"] == "MULTIPOINT ((0 0), (2 0))"
    assert rows[1]["t"] == "MULTIPOINT ((1 0), (3 0))"


def test_simplify_collapses_degenerate_rings():
    # GEOS ST_Simplify DROPS rings that degenerate below a valid ring
    # (reference test_st_simplify "Collapsed" rows): a 1x1 square at
    # tolerance 10 collapses to POLYGON EMPTY, and a collapsed hole is
    # removed while the shell survives.
    sq = W.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    out = A.simplify(sq, 10.0)
    assert out == ("Polygon", [])
    holed = W.from_wkt(
        "POLYGON((0 0, 0 100, 100 100, 100 0, 0 0),"
        " (40 40, 40.1 40, 40.1 40.1, 40 40.1, 40 40))")
    out = A.simplify(holed, 1.0)
    assert len(out[1]) == 1 and len(out[1][0]) == 5


def test_spherical_measures(spark):
    import numpy as np
    R = 6371008.8
    # sphere octant: exactly 1/8 of the sphere's surface
    a = one(spark, "ST_AreaSphere(ST_GeomFromText("
                   "'POLYGON ((0 0, 90 0, 90 90, 0 90, 0 0))'))")
    assert a == pytest.approx(4 * np.pi * R * R / 8, rel=1e-12)
    # 1°×1° equatorial cell ≈ 12,364 km²
    a = one(spark, "ST_AreaSphere(ST_GeomFromText("
                   "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))")
    assert a / 1e6 == pytest.approx(12364, rel=0.01)
    # quarter of the equator
    l = one(spark, "ST_LengthSphere(ST_GeomFromText('LINESTRING (0 0, 90 0)'))")
    assert l == pytest.approx(np.pi * R / 2, abs=1.0)
    # holes subtract
    a = one(spark, "ST_AreaSphere(ST_GeomFromText("
                   "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))'))")
    full = one(spark, "ST_AreaSphere(ST_GeomFromText("
                      "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))")
    assert 0 < a < full


def test_force3dm_encodes_m_flag(spark):
    """Regression (round-1 ADVICE low): ST_Force3DM must add an M dimension
    (ISO WKB type +2000), not a Z (+1000)."""
    import struct
    row = spark.sql(
        "SELECT ST_Force3DM(ST_Point(1.0, 2.0)) AS m3,"
        " ST_Force3D(ST_Point(1.0, 2.0)) AS z3,"
        " ST_ZMFlag(ST_Force3DM(ST_Point(1.0, 2.0))) AS mf,"
        " ST_ZMFlag(ST_Force3D(ST_Point(1.0, 2.0))) AS zf,"
        " ST_ZMFlag(ST_Point(1.0, 2.0)) AS df").collect()[0]
    assert struct.unpack_from("<I", bytes(row["m3"]), 1)[0] == 2001
    assert struct.unpack_from("<I", bytes(row["z3"]), 1)[0] == 1001
    assert (row["mf"], row["zf"], row["df"]) == (1, 2, 0)


def test_pointm_zm_accessors(spark):
    """M/Z accessors honor the WKB header flags: an M-only point has an M
    at index 2 and NO Z; ZM points carry both."""
    r = spark.sql(
        "SELECT ST_M(ST_PointM(1.0,2.0,5.0)) AS m1,"
        " ST_M(ST_PointZM(1.0,2.0,3.0,5.0)) AS m2,"
        " ST_Z(ST_PointM(1.0,2.0,5.0)) AS zm,"
        " ST_Z(ST_PointZ(1.0,2.0,3.0)) AS zz,"
        " ST_HasM(ST_PointM(1.0,2.0,5.0)) AS hm,"
        " ST_HasZ(ST_PointM(1.0,2.0,5.0)) AS hz").collect()[0]
    assert (r["m1"], r["m2"]) == (5.0, 5.0)
    assert r["zz"] == 3.0 and (r["zm"] is None or r["zm"] != r["zm"])  # NaN
    assert r["hm"] is True and r["hz"] is False
