"""Replay of the reference engine's OWN test cases through this engine.

Every (expression, expected) pair below is copied verbatim from
/root/reference/python/sedonadb/tests/functions/test_functions.py (line
ranges cited per block) — the north rule's "matches the reference's
results on its own test queries" evidence, executed via spark.sql.

Geometry-valued expectations compare semantically (ST_Equals against the
expected WKT) unless vertex ORDER is the point of the test (ST_Reverse),
where exact WKT text is required.
"""

import math

import pytest


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


# --- ST_Area (test_functions.py:28-52) --------------------------------------
AREA_CASES = [
    ("POINT EMPTY", 0.0),
    ("LINESTRING EMPTY", 0.0),
    ("POLYGON EMPTY", 0.0),
    ("MULTIPOLYGON EMPTY", 0.0),
    ("GEOMETRYCOLLECTION EMPTY", 0.0),
    ("POINT (5 2)", 0.0),
    ("MULTIPOINT ((0 0), (1 1))", 0.0),
    ("LINESTRING (0 0, 1 1)", 0.0),
    ("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))", 0.0),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 1.0),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))", 2.0),
    ("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), "
     "LINESTRING (0 0, 1 1), GEOMETRYCOLLECTION (POLYGON ((0 0, -1 0, -1 -1, "
     "0 -1, 0 0))))", 2.0),
]


@pytest.mark.parametrize("wkt,expected", AREA_CASES)
def test_ref_st_area(spark, wkt, expected):
    assert _one(spark, f"ST_Area(ST_GeomFromText('{wkt}'))") == expected


# --- ST_Azimuth (test_functions.py:172-186) ----------------------------------
def test_ref_st_azimuth(spark):
    assert abs(_one(spark, "ST_Azimuth(ST_Point(0.0,0.0), ST_Point(1.0,1.0))")
               - 0.7853981633974483) < 1e-15
    assert abs(_one(spark, "ST_Azimuth(ST_Point(0.0,0.0), ST_Point(-1.0,-1.0))")
               - 3.9269908169872414) < 1e-15


# --- ST_Length (test_functions.py:2280-2302) ---------------------------------
LENGTH_CASES = [
    ("LINESTRING (0 0, 0 1)", 1.0),
    ("MULTIPOINT ((0 0), (1 1))", 0.0),
    ("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))", 2.8284271247461903),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 0.0),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))", 0.0),
    ("GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1), POLYGON ((0 0, 1 0, 1 1, 0 1,"
     " 0 0)), LINESTRING (0 0, 1 1))", 2.8284271247461903),
]


@pytest.mark.parametrize("wkt,expected", LENGTH_CASES)
def test_ref_st_length(spark, wkt, expected):
    assert abs(_one(spark, f"ST_Length(ST_GeomFromText('{wkt}'))")
               - expected) < 1e-12


# --- ST_NumGeometries (test_functions.py:2307-2333) --------------------------
NUMGEOM_CASES = [
    ("POINT EMPTY", 0), ("LINESTRING EMPTY", 0), ("POLYGON EMPTY", 0),
    ("GEOMETRYCOLLECTION EMPTY", 0),
    ("GEOMETRYCOLLECTION (LINESTRING EMPTY, MULTIPOINT ((0 0), (1 1), (2 2)))", 2),
    ("POINT(0 0)", 1),
    ("LINESTRING(0 0, 1 1)", 1),
    ("POLYGON((0 0, 1 0, 0 1, 0 0))", 1),
    ("MULTIPOINT ((0 0), (1 1), (2 2))", 3),
    ("MULTILINESTRING((0 0, 0 1, 1 1, 0 0), (0 0, 1 1))", 2),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))", 2),
    ("GEOMETRYCOLLECTION (MULTIPOINT ((0 0), (1 1), (2 2)))", 1),
    ("GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (0 0), POINT (1 1)), "
     "MULTIPOINT((2 2), (3 3)))", 2),
]


@pytest.mark.parametrize("wkt,expected", NUMGEOM_CASES)
def test_ref_st_numgeometries(spark, wkt, expected):
    assert _one(spark, f"ST_NumGeometries(ST_GeomFromText('{wkt}'))") == expected


# --- ST_Dimension (test_functions.py:1246-1283) ------------------------------
DIMENSION_CASES = [
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))", 1),
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), "
     "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))", 2),
    ("GEOMETRYCOLLECTION (POINT (0 0), GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1)))", 1),
    ("POINT Z (0 0 0)", 0),
    ("POINT ZM (0 0 0 0)", 0),
]


@pytest.mark.parametrize("wkt,expected", DIMENSION_CASES)
def test_ref_st_dimension(spark, wkt, expected):
    assert _one(spark, f"ST_Dimension(ST_GeomFromText('{wkt}'))") == expected


# --- ST_IsClosed (test_functions.py:2104-2129) --------------------------------
ISCLOSED_CASES = [
    ("LINESTRING(0 0, 1 1)", False),
    ("LINESTRING(0 0, 0 1, 1 1, 0 0)", True),
    ("MULTILINESTRING((0 0, 0 1, 1 1, 0 0),(0 0, 1 1))", False),
    ("POINT(0 0)", True),
    ("MULTIPOINT((0 0), (1 1))", True),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", True),
    ("GEOMETRYCOLLECTION (LINESTRING(0 0, 0 1, 1 1, 0 0))", True),
    ("GEOMETRYCOLLECTION (LINESTRING(0 0, 0 1, 1 1, 0 0), LINESTRING(0 0, 1 1))",
     False),
    ("POINT EMPTY", False),
    ("LINESTRING EMPTY", False),
    ("GEOMETRYCOLLECTION EMPTY", False),
]


@pytest.mark.parametrize("wkt,expected", ISCLOSED_CASES)
def test_ref_st_isclosed(spark, wkt, expected):
    assert _one(spark, f"ST_IsClosed(ST_GeomFromText('{wkt}'))") is expected


# --- ST_Envelope (test_functions.py:1430-1449): semantic compare -------------
ENVELOPE_CASES = [
    ("POINT (0 0)", "POINT (0 0)"),
    ("LINESTRING (0 0, 1 1)", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
    ("LINESTRING (0 0, 0 1)", "LINESTRING (0 0, 0 1)"),
    ("MULTIPOINT ((0 0), (1 1))", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
    ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), "
     "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))",
     "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
]


@pytest.mark.parametrize("wkt,expected", ENVELOPE_CASES)
def test_ref_st_envelope(spark, wkt, expected):
    got_type = _one(spark, f"ST_GeometryType(ST_Envelope(ST_GeomFromText('{wkt}')))")
    exp_type = _one(spark, f"ST_GeometryType(ST_GeomFromText('{expected}'))")
    assert got_type == exp_type
    if "Point" in exp_type:
        assert _one(spark, f"ST_AsText(ST_Envelope(ST_GeomFromText('{wkt}')))") \
            == expected
    else:
        assert _one(spark,
                    f"ST_Equals(ST_Envelope(ST_GeomFromText('{wkt}')), "
                    f"ST_GeomFromText('{expected}'))") is True


# --- ST_FlipCoordinates (test_functions.py:1455-1475) ------------------------
FLIP_CASES = [
    ("POINT (0 1)", "POINT (1 0)"),
    ("LINESTRING (0 1, 2 3)", "LINESTRING (1 0, 3 2)"),
]


@pytest.mark.parametrize("wkt,expected", FLIP_CASES)
def test_ref_st_flipcoordinates(spark, wkt, expected):
    assert _one(spark,
                f"ST_AsText(ST_FlipCoordinates(ST_GeomFromText('{wkt}')))") \
        == expected


# --- ST_Reverse (test_functions.py:2370-2390): exact vertex order ------------
REVERSE_CASES = [
    ("LINESTRING(0 0, 1 1, 2 2)", "LINESTRING (2 2, 1 1, 0 0)"),
    ("POINT (1 2)", "POINT (1 2)"),
    ("POLYGON ((0 0, 1 0, 2 2, 1 2, 0 0))", "POLYGON ((0 0, 1 2, 2 2, 1 0, 0 0))"),
]


@pytest.mark.parametrize("wkt,expected", REVERSE_CASES)
def test_ref_st_reverse(spark, wkt, expected):
    assert _one(spark, f"ST_AsText(ST_Reverse(ST_GeomFromText('{wkt}')))") \
        == expected


# --- ST_AsText dimension tokens (test_functions.py:92-114) -------------------
ASTEXT_CASES = [
    "POINT (1 1)",
    "LINESTRING (0 0, 1 1)",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "POINT Z (0 0 0)",
    "POINT ZM (0 0 0 0)",
    "LINESTRING M (0 0 0, 1 1 1)",
]


@pytest.mark.parametrize("wkt", ASTEXT_CASES)
def test_ref_st_astext_roundtrip(spark, wkt):
    assert _one(spark, f"ST_AsText(ST_GeomFromText('{wkt}'))") == wkt


# --- ST_X / ST_Point (test_functions.py:2407-2446) ---------------------------
def test_ref_st_point_accessors(spark):
    assert _one(spark, "ST_AsText(ST_Point(1.0, 2.0))") == "POINT (1 2)"
    assert _one(spark, "ST_X(ST_Point(1.5, 2.5))") == 1.5
    assert _one(spark, "ST_Y(ST_Point(1.5, 2.5))") == 2.5
    assert _one(spark, "ST_AsText(ST_PointZ(1.0, 2.0, 3.0))") == "POINT Z (1 2 3)"


# --- ST_IsValid (test_functions.py:907-957) ----------------------------------
ISVALID_CASES = [
    ("POINT (0 0)", True),
    ("POINT EMPTY", True),
    ("LINESTRING (0 0, 1 1)", True),
    ("LINESTRING (0 0, 1 1, 1 0, 0 1)", True),
    ("LINESTRING EMPTY", True),
    ("LINESTRING (0 0, 0 0)", False),
    ("LINESTRING (0 0, 0 0, 0 0)", False),
    ("MULTILINESTRING ((0 0, 0 0), (1 1, 2 2))", False),
    ("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))", True),
    ("POLYGON EMPTY", True),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))", True),
    ("POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))", False),           # bowtie
    ("Polygon((0 0, 2 0, 1 1, 2 2, 0 2, 1 1, 0 0))", False),  # figure-8
    ("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((1 1, 3 1, 3 3, 1 3, 1 1)))",
     False),  # overlapping parts
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
     True),
    ("GEOMETRYCOLLECTION (POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0)))", False),
    ("GEOMETRYCOLLECTION (POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))", True),
]


@pytest.mark.parametrize("wkt,expected", ISVALID_CASES)
def test_ref_st_isvalid(spark, wkt, expected):
    assert _one(spark, f"ST_IsValid(ST_GeomFromText('{wkt}'))") is expected


# --- ST_IsSimple (test_functions.py:820-900, selected) ------------------------
ISSIMPLE_CASES = [
    ("POINT (1 1)", True),
    ("MULTIPOLYGON EMPTY", True),
    ("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))", True),
    ("GEOMETRYCOLLECTION EMPTY", True),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.2 0.8, 0.8 0.8, 0.8 0.2,"
     " 0.2 0.2))", True),
    ("LINESTRING (0 0, 1 0, 1 1, 0 1, 0.5 1, 0.5 0)", False),  # self-touch
]


@pytest.mark.parametrize("wkt,expected", ISSIMPLE_CASES)
def test_ref_st_issimple(spark, wkt, expected):
    assert _one(spark, f"ST_IsSimple(ST_GeomFromText('{wkt}'))") is expected


# --- ST_Centroid (test_functions.py:745-783) ----------------------------------
CENTROID_CASES = [
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POINT (0.5 0.5)"),
    ("MULTIPOINT ((0 0), (1 1))", "POINT (0.5 0.5)"),
    ("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))", "POINT (1 1)"),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))",
     "POINT (0.5 0.5)"),
]


@pytest.mark.parametrize("wkt,expected", CENTROID_CASES)
def test_ref_st_centroid(spark, wkt, expected):
    assert _one(spark, f"ST_AsText(ST_Centroid(ST_GeomFromText('{wkt}')))") \
        == expected


# --- ST_ConvexHull (test_functions.py:1117-1127): semantic compare -----------
CONVEXHULL_CASES = [
    ("POINT (0 0)", "POINT (0 0)"),
    ("MULTIPOINT (0 0, 1 1)", "LINESTRING (0 0, 1 1)"),
    ("MULTIPOINT (0 0, 1 1, 1 0)", "POLYGON ((0 0, 1 1, 1 0, 0 0))"),
    ("MULTIPOINT (0 0, 1 1, 1 0, 0.5 0.25)", "POLYGON ((0 0, 1 1, 1 0, 0 0))"),
]


@pytest.mark.parametrize("wkt,expected", CONVEXHULL_CASES)
def test_ref_st_convexhull(spark, wkt, expected):
    if expected.startswith("POLYGON"):
        assert _one(spark,
                    f"ST_Equals(ST_ConvexHull(ST_GeomFromText('{wkt}')), "
                    f"ST_GeomFromText('{expected}'))") is True
    else:
        got = _one(spark, f"ST_AsText(ST_ConvexHull(ST_GeomFromText('{wkt}')))")
        # a 2-point hull may render in either direction
        assert got == expected or got == "LINESTRING (1 1, 0 0)"


# --- ST_IsRing (test_functions.py:2168-2188) ----------------------------------
ISRING_CASES = [
    ("LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)", True),
    ("LINESTRING(0 0, 1 0, 1 1, 0 0)", True),
    ("LINESTRING(0 0, 2 2, 1 2, 0 0)", True),
    ("LINESTRING(0 0, 0 1, 1 0, 1 1, 0 0)", False),  # closed bowtie
    ("LINESTRING(0 0, 1 1)", False),
    ("LINESTRING(2 0, 2 2, 3 3)", False),
    ("LINESTRING EMPTY", False),
]


@pytest.mark.parametrize("wkt,expected", ISRING_CASES)
def test_ref_st_isring(spark, wkt, expected):
    assert _one(spark, f"ST_IsRing(ST_GeomFromText('{wkt}'))") is expected


# --- ST_LineMerge (test_functions.py:2218-2251) -------------------------------
LINEMERGE_CASES = [
    ("MULTILINESTRING ((0 0, 1 0), (1 0, 1 1))", "LINESTRING (0 0, 1 0, 1 1)"),
    ("MULTILINESTRING ((0 0, 1 0), (1 1, 1 0))", "LINESTRING (0 0, 1 0, 1 1)"),
    ("MULTILINESTRING ((0 0, 1 0), (8 8, 9 9))",
     "MULTILINESTRING ((0 0, 1 0), (8 8, 9 9))"),
    ("LINESTRING (0 0, 1 0)", "LINESTRING (0 0, 1 0)"),
]


@pytest.mark.parametrize("wkt,expected", LINEMERGE_CASES)
def test_ref_st_linemerge(spark, wkt, expected):
    assert _one(spark, f"ST_AsText(ST_LineMerge(ST_GeomFromText('{wkt}')))") \
        == expected


# --- ST_UnaryUnion (test_functions.py:1140-1157): semantic compare -----------
UNARYUNION_CASES = [
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((1 0, 2 0, 2 1, 1 1, 1 0)))",
     "POLYGON ((0 0, 0 1, 1 1, 2 1, 2 0, 1 0, 0 0))"),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
     "MULTIPOLYGON (((0 1, 1 1, 1 0, 0 0, 0 1)), ((2 3, 3 3, 3 2, 2 2, 2 3)))"),
    ("GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), "
     "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0)))",
     "POLYGON ((0 0, 0 1, 1 1, 2 1, 2 0, 1 0, 0 0))"),
]


@pytest.mark.parametrize("wkt,expected", UNARYUNION_CASES)
def test_ref_st_unaryunion(spark, wkt, expected):
    assert _one(spark,
                f"ST_Equals(ST_UnaryUnion(ST_GeomFromText('{wkt}')), "
                f"ST_GeomFromText('{expected}'))") is True


# --- ST_MakeValid (test_functions.py:3055-3116): semantic compare ------------
MAKEVALID_CASES = [
    ("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))",
     "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
    ("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))",  # bowtie
     "MULTIPOLYGON (((0 2, 1 1, 0 0, 0 2)), ((2 0, 1 1, 2 2, 2 0)))"),
    ("POLYGON ((0 0, 0 3, 3 3, 3 0, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",
     "POLYGON ((0 0, 0 3, 3 3, 3 0, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"),
    ("LINESTRING (0 0, 1 1, 2 2)", "LINESTRING (0 0, 1 1, 2 2)"),
    ("MULTIPOLYGON (((0 0, 1 1, 1 0, 0 1, 0 0)), ((2 2, 3 3, 3 2, 2 3, 2 2)))",
     "MULTIPOLYGON (((0.5 0.5, 0 0, 0 1, 0.5 0.5)), ((0.5 0.5, 1 1, 1 0, "
     "0.5 0.5)), ((2.5 2.5, 2 2, 2 3, 2.5 2.5)), ((2.5 2.5, 3 3, 3 2, "
     "2.5 2.5)))"),
    ("POINT (1 1)", "POINT (1 1)"),
]


@pytest.mark.parametrize("wkt,expected", MAKEVALID_CASES)
def test_ref_st_makevalid(spark, wkt, expected):
    if expected.startswith("POINT"):
        assert _one(spark,
                    f"ST_AsText(ST_MakeValid(ST_GeomFromText('{wkt}')))") \
            == expected
    else:
        assert _one(spark,
                    f"ST_Equals(ST_MakeValid(ST_GeomFromText('{wkt}')), "
                    f"ST_GeomFromText('{expected}'))") is True


# --- ST_ZMFlag (test_functions.py:3612-3638, non-EMPTY subset) ----------------
ZMFLAG_CASES = [
    ("POINT Z (0 0 0)", 2),
    ("POINT M (0 0 0)", 1),
    ("POINT ZM (0 0 0 0)", 3),
    ("LINESTRING Z (0 0 0, 1 1 1)", 2),
    ("MULTIPOINT Z ((0 0 0))", 2),
    ("GEOMETRYCOLLECTION (POINT Z (0 0 0))", 2),
]


@pytest.mark.parametrize("wkt,expected", ZMFLAG_CASES)
def test_ref_st_zmflag(spark, wkt, expected):
    assert _one(spark, f"ST_ZMFlag(ST_GeomFromText('{wkt}'))") == expected


# --- ST_PointN (test_functions.py:2536-2571) ----------------------------------
POINTN_CASES = [
    ("LINESTRING (1 2, 3 4, 5 6)", 1, "POINT (1 2)"),
    ("LINESTRING (1 2, 3 4, 5 6)", 2, "POINT (3 4)"),
    ("LINESTRING (1 2, 3 4, 5 6)", -1, "POINT (5 6)"),
    ("LINESTRING Z (1 2 3, 3 4 5, 5 6 7)", 2, "POINT Z (3 4 5)"),
    ("LINESTRING (1 2, 3 4, 5 6)", 0, None),
    ("LINESTRING (1 2, 3 4, 5 6)", 4, None),
    ("LINESTRING (1 2, 3 4, 5 6)", -4, None),
    ("POINT (1 2)", 1, None),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 1, None),
    ("LINESTRING EMPTY", 1, None),
]


@pytest.mark.parametrize("wkt,n,expected", POINTN_CASES)
def test_ref_st_pointn(spark, wkt, n, expected):
    got = _one(spark, f"ST_AsText(ST_PointN(ST_GeomFromText('{wkt}'), {n}))")
    assert got == expected


# --- ST_StartPoint / ST_EndPoint (test_functions.py:2583-2636) ----------------
STARTEND_CASES = [
    ("LINESTRING (1 2, 3 4, 5 6)", "POINT (1 2)", "POINT (5 6)"),
    ("LINESTRING Z (1 2 3, 3 4 5, 5 6 7)", "POINT Z (1 2 3)", "POINT Z (5 6 7)"),
    ("LINESTRING M (1 2 3, 3 4 5, 5 6 7)", "POINT M (1 2 3)", "POINT M (5 6 7)"),
    ("LINESTRING ZM (1 2 3 4, 3 4 5 6, 5 6 7 8)",
     "POINT ZM (1 2 3 4)", "POINT ZM (5 6 7 8)"),
    ("POINT (1 2)", "POINT (1 2)", None),
    ("LINESTRING EMPTY", None, None),
]


@pytest.mark.parametrize("wkt,exp_start,exp_end", STARTEND_CASES)
def test_ref_st_start_end_point(spark, wkt, exp_start, exp_end):
    assert _one(spark,
                f"ST_AsText(ST_StartPoint(ST_GeomFromText('{wkt}')))") == exp_start
    assert _one(spark,
                f"ST_AsText(ST_EndPoint(ST_GeomFromText('{wkt}')))") == exp_end


# --- ST_PointZM (test_functions.py:2644-2658) ----------------------------------
def test_ref_st_pointzm(spark):
    assert _one(spark, "ST_AsText(ST_PointZM(1.0, 1.0, 1.0, 1.0))") \
        == "POINT ZM (1 1 1 1)"
    assert _one(spark, "ST_AsText(ST_PointZM(10.0, -1.5, 1.0, 1.0))") \
        == "POINT ZM (10 -1.5 1 1)"


# --- ST_NumPoints (test_functions.py:3688-3711) --------------------------------
NUMPOINTS_CASES = [
    ("LINESTRING EMPTY", 0),
    ("POINT (1 2)", None),
    ("LINESTRING (0 0, 1 1, 2 2)", 3),
    ("LINESTRING (0 0, 1 1, 0 0)", 3),
    ("LINESTRING Z (0 0 0, 1 1 1, 2 2 2, 3 3 3)", 4),
    ("LINESTRING ZM (0 0 0 2, 1 1 1 4)", 2),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", None),
    ("MULTILINESTRING ((0 0, 0 1, 1 1, 0 0),(0 0, 1 1))", None),
    ("GEOMETRYCOLLECTION (LINESTRING (0 0, 0 1, 1 1, 0 0))", None),
]


@pytest.mark.parametrize("wkt,expected", NUMPOINTS_CASES)
def test_ref_st_numpoints(spark, wkt, expected):
    assert _one(spark, f"ST_NumPoints(ST_GeomFromText('{wkt}'))") == expected


# --- ST_NRings (test_functions.py:3720-3757) -----------------------------------
NRINGS_CASES = [
    ("POINT (1 2)", 0),
    ("LINESTRING (0 0, 1 1, 2 2)", 0),
    ("GEOMETRYCOLLECTION EMPTY", 0),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 1),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))", 2),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1), "
     "(5 5, 5 6, 6 6, 6 5, 5 5))", 3),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 10, 20 10, 20 20, "
     "10 20, 10 10), (12 12, 12 14, 14 14, 14 12, 12 12)))", 3),
    ("GEOMETRYCOLLECTION(POINT(1 1), POLYGON((0 0, 1 0, 1 1, 0 0)))", 1),
    ("GEOMETRYCOLLECTION(POINT(2 3), LINESTRING(0 0, 1 1, 2 2), "
     "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)), "
     "MULTIPOLYGON(((5 5, 6 5, 6 6, 5 6, 5 5)), ((10 10, 12 10, 12 12, "
     "10 12, 10 10), (10.5 10.5, 11 10.5, 11 11, 10.5 11, 10.5 10.5))), "
     "GEOMETRYCOLLECTION(POLYGON((20 20, 22 20, 22 22, 20 22, 20 20)), "
     "POINT(30 30)))", 6),
]


@pytest.mark.parametrize("wkt,expected", NRINGS_CASES)
def test_ref_st_nrings(spark, wkt, expected):
    assert _one(spark, f"ST_NRings(ST_GeomFromText('{wkt}'))") == expected


# --- ST_Simplify (test_functions.py:3300-3396, selected) -----------------------
SIMPLIFY_CASES = [
    ("LINESTRING(0 0, 1 0, 2 0, 3 0, 4 0, 5 0)", 0.0, "LINESTRING (0 0, 5 0)"),
    ("LINESTRING(0 0, 1 0.01, 2 0.02, 3 0.01, 4 0)", 0.1, "LINESTRING (0 0, 4 0)"),
    ("LINESTRING(0 0, 10 0, 10 10, 5 15, 0 10, 0 0)", 5.0,
     "LINESTRING (0 0, 10 0, 5 15, 0 0)"),
    ("MULTILINESTRING((0 0, 1 0.1, 2 0.2, 3 0), (10 10, 11 10, 12 10), "
     "(20 20, 21 25, 22 20))", 1.0,
     "MULTILINESTRING ((0 0, 3 0), (10 10, 12 10), (20 20, 21 25, 22 20))"),
]


@pytest.mark.parametrize("wkt,tol,expected", SIMPLIFY_CASES)
def test_ref_st_simplify(spark, wkt, tol, expected):
    assert _one(spark,
                f"ST_AsText(ST_Simplify(ST_GeomFromText('{wkt}'), {tol}))") \
        == expected


# --- ST_X/Y/Z/M NULL semantics (test_functions.py:2715-2818) ------------------
def test_ref_coordinate_accessors_null_semantics(spark):
    assert _one(spark, "ST_X(ST_GeomFromText('POINT EMPTY'))") is None
    assert _one(spark, "ST_X(ST_GeomFromText('POINT (1.1 2)'))") == 1.1
    assert _one(spark, "ST_Y(ST_GeomFromText('POINT ZM (1 2.2 3 -4)'))") == 2.2
    assert _one(spark, "ST_Z(ST_GeomFromText('POINT (1 2)'))") is None
    assert _one(spark, "ST_Z(ST_GeomFromText('POINT M (1 2 3)'))") is None
    assert _one(spark, "ST_Z(ST_GeomFromText('POINT Z (1 2 3)'))") == 3.0
    assert _one(spark, "ST_M(ST_GeomFromText('POINT Z (1 2 3)'))") is None
    assert _one(spark, "ST_M(ST_GeomFromText('POINT M (1 2 3.2)'))") == 3.2
    assert _one(spark, "ST_M(ST_GeomFromText('POINT ZM (1 2 3 -4)'))") == -4.0


# --- ST_ZMin/ZMax (test_functions.py:2943-3018, selected) ---------------------
def test_ref_zmin_zmax(spark):
    assert _one(spark, "ST_ZMin(ST_GeomFromText('POINT (1 2)'))") is None
    assert _one(spark, "ST_ZMin(ST_GeomFromText('POINT Z (1 2 3)'))") == 3.0
    assert _one(spark, "ST_ZMin(ST_GeomFromText('POINT M (1 2 3)'))") is None
    assert _one(spark, "ST_ZMin(ST_GeomFromText('POINT ZM (1 2 3 4)'))") == 3.0
    gc = ("GEOMETRYCOLLECTION ZM (POINT ZM (1 2 3 4), LINESTRING ZM "
          "(3 4 5 6, 7 8 9 10), POLYGON ZM ((0 0 0 0, 1 0 0 0, 0 1 0 0, "
          "0 0 0 0)))")
    assert _one(spark, f"ST_ZMin(ST_GeomFromText('{gc}'))") == 0.0
    assert _one(spark, f"ST_ZMax(ST_GeomFromText('{gc}'))") == 9.0
    assert _one(spark, "ST_MMax(ST_GeomFromText('POINT ZM (1 2 3 4)'))") == 4.0
    assert _one(spark, "ST_MMin(ST_GeomFromText('POINT Z (1 2 3)'))") is None


# --- ST_GeometryN (test_functions.py:1810-1890) --------------------------------
GEOMETRYN_CASES = [
    ("MULTILINESTRING((1 1, 2 2), (3 3, 4 4))", 2, "LINESTRING (3 3, 4 4)"),
    ("MULTILINESTRING((1 1, 2 2), (3 3, 4 4))", 3, None),
    ("MULTIPOLYGON(((0 0, 1 1, 0 1, 0 0)), ((5 5, 6 6, 5 6, 5 5)))", 2,
     "POLYGON ((5 5, 6 6, 5 6, 5 5))"),
    ("MULTIPOLYGON(((0 0, 1 1, 0 1, 0 0)))", 2, None),
    ("GEOMETRYCOLLECTION(POINT(10 10), LINESTRING(20 20, 30 30), "
     "POLYGON((1 1, 2 2, 1 2, 1 1)))", 1, "POINT (10 10)"),
    ("GEOMETRYCOLLECTION(POINT(10 10), LINESTRING(20 20, 30 30), "
     "POLYGON((1 1, 2 2, 1 2, 1 1)))", 2, "LINESTRING (20 20, 30 30)"),
    ("GEOMETRYCOLLECTION(POINT(10 10))", 2, None),
    ("GEOMETRYCOLLECTION(POINT(1 1), GEOMETRYCOLLECTION(LINESTRING(2 2, 3 3)))",
     2, "GEOMETRYCOLLECTION (LINESTRING (2 2, 3 3))"),
    ("GEOMETRYCOLLECTION(POINT(1 1))", 0, None),
]


@pytest.mark.parametrize("wkt,n,expected", GEOMETRYN_CASES)
def test_ref_st_geometryn(spark, wkt, n, expected):
    got = _one(spark, f"ST_AsText(ST_GeometryN(ST_GeomFromText('{wkt}'), {n}))")
    assert got == expected


# --- ST_HasZ with Z-only-in-nested-geometry (test_functions.py:1900-1924) -----
def test_ref_st_hasz_nested(spark):
    assert _one(spark, "ST_HasZ(ST_GeomFromText("
                "'GEOMETRYCOLLECTION (POINT Z (0 0 0))'))") is True
    assert _one(spark, "ST_HasZ(ST_GeomFromText('POINT M (0 0 0)'))") is False
    assert _one(spark, "ST_HasZ(ST_GeomFromText('MULTIPOINT Z ((0 0 0))'))") is True


# --- ST_Scale 2D (test_functions.py:330-365, selected) -------------------------
SCALE_CASES = [
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))", 2.0, 3.0,
     "MULTIPOLYGON (((0 0, 2 0, 2 3, 0 3, 0 0)))"),
    ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))", 2.0, 3.0,
     "GEOMETRYCOLLECTION (POINT (2 6), LINESTRING (0 0, 2 3))"),
    ("POINT Z (1 2 3)", 2.0, 3.0, "POINT Z (2 6 3)"),
    ("POINT M (1 2 3)", 2.0, 3.0, "POINT M (2 6 3)"),
    ("POINT ZM (1 2 3 4)", 2.0, 3.0, "POINT ZM (2 6 3 4)"),
]


@pytest.mark.parametrize("wkt,sx,sy,expected", SCALE_CASES)
def test_ref_st_scale(spark, wkt, sx, sy, expected):
    assert _one(spark,
                f"ST_AsText(ST_Scale(ST_GeomFromText('{wkt}'), {sx}, {sy}))") \
        == expected


# --- ST_MinimumClearance (test_functions.py:3120-3187, selected) --------------
MINCLEAR_CASES = [
    ("LINESTRING(0 0,0 0,1 1,1 1,2 2)", 1.4142135623730951),
    ("POLYGON((0 0,0 3,3 3,3 0,0 0),(1 1,1 2,2 2,2 1,1 1))", 1.0),
    ("MULTIPOINT (10 40, 40 30)", 31.622776601683793),
    ("MULTIPOINT ((10 10), (20 20), (30 30))", 14.142135623730951),
    ("MULTILINESTRING ((10 10, 20 20), (30 30, 40 40))", 14.142135623730951),
    ("MULTILINESTRING ((5 5, 10 5, 10 15), (20 20, 25 10))", 5.0),
]


@pytest.mark.parametrize("wkt,expected", MINCLEAR_CASES)
def test_ref_st_minimum_clearance(spark, wkt, expected):
    got = _one(spark, f"ST_MinimumClearance(ST_GeomFromText('{wkt}'))")
    assert abs(got - expected) < 1e-9


# --- ST_Polygonize (test_functions.py:2664-2708, selected) --------------------
POLYGONIZE_CASES = [
    ("MULTILINESTRING((0 0, 0 1, 1 1, 1 0, 0 0), "
     "(10 10, 10 11, 11 11, 11 10, 10 10))",
     "GEOMETRYCOLLECTION (POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)), "
     "POLYGON ((10 10, 10 11, 11 11, 11 10, 10 10)))"),
    ("MULTILINESTRING((0 0, 10 0), (10 0, 10 10), (10 10, 0 0))",
     "GEOMETRYCOLLECTION (POLYGON ((10 0, 0 0, 10 10, 10 0)))"),
    ("LINESTRING(0 0, 10 10)", "GEOMETRYCOLLECTION EMPTY"),
    ("POINT(0 0)", "GEOMETRYCOLLECTION EMPTY"),
    ("LINESTRING EMPTY", "GEOMETRYCOLLECTION EMPTY"),
]


@pytest.mark.parametrize("wkt,expected", POLYGONIZE_CASES)
def test_ref_st_polygonize(spark, wkt, expected):
    if expected.endswith("EMPTY"):
        got = _one(spark, f"ST_AsText(ST_Polygonize(ST_GeomFromText('{wkt}')))")
        assert got == expected
    else:
        # polygon ring order may legally differ: compare part-count + per-
        # part semantic equality through the collected union
        n = _one(spark,
                 f"ST_NumGeometries(ST_Polygonize(ST_GeomFromText('{wkt}')))")
        n_exp = _one(spark, f"ST_NumGeometries(ST_GeomFromText('{expected}'))")
        assert n == n_exp
        assert _one(spark,
                    f"ST_Equals(ST_UnaryUnion(ST_Polygonize(ST_GeomFromText("
                    f"'{wkt}'))), ST_UnaryUnion(ST_GeomFromText('{expected}')))"
                    ) is True


# --- ST_Distance (test_distance.py:21-47) ------------------------------------
def test_ref_st_distance(spark):
    assert _one(spark, "ST_Distance(ST_Point(0.0,0.0), ST_Point(0.0,0.0))") == 0.0
    got = _one(spark, "ST_Distance(ST_GeomFromText('POINT(-72.1235 42.3521)'),"
               " ST_GeomFromText('LINESTRING(-72.1260 42.45, -72.123 42.1546)'))")
    assert abs(got - 0.0015056772638228177) < 1e-8
    got = _one(spark, "ST_Distance(ST_GeomFromText("
               "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), ST_GeomFromText("
               "'POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))'))")
    assert abs(got - 5.656854249492381) < 1e-8


# --- SQL aggregates (test_aggregate.py:39-105) --------------------------------
def test_ref_envelope_agg(spark):
    def agg(values_sql):
        return _one(spark, None) if False else spark.sql(
            f"SELECT ST_AsText(ST_Envelope_Agg(ST_GeomFromText(geom))) AS v"
            f" FROM VALUES {values_sql} AS t(geom)").collect()[0]["v"]
    got = spark.sql(
        "SELECT ST_Equals(ST_Envelope_Agg(ST_GeomFromText(geom)),"
        " ST_GeomFromText('POLYGON ((1 2, 1 4, 3 4, 3 2, 1 2))')) AS v"
        " FROM VALUES ('POINT (1 2)'), ('POINT (3 4)'), (NULL) AS t(geom)"
    ).collect()[0]["v"]
    assert got is True
    assert agg("('POINT (5 5)')") == "POINT (5 5)"
    assert agg("('POINT (0 0)'), ('POINT (0 1)'), ('POINT (0 2)')") \
        == "LINESTRING (0 0, 0 2)"
    assert agg("(NULL), (NULL), (NULL)") is None


def test_ref_union_agg_sql(spark):
    got = spark.sql(
        "SELECT ST_Equals(ST_Union_Agg(ST_GeomFromText(g)),"
        " ST_GeomFromText('POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))')) AS v"
        " FROM VALUES ('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),"
        " ('POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))') AS t(g)").collect()[0]["v"]
    assert got is True


def test_ref_collect_agg_sql(spark):
    got = spark.sql(
        "SELECT ST_AsText(ST_Collect_Agg(ST_GeomFromText(g))) AS v"
        " FROM VALUES ('POINT (0 0)'), ('POINT (1 1)') AS t(g)"
    ).collect()[0]["v"]
    assert got == "MULTIPOINT ((0 0), (1 1))"
