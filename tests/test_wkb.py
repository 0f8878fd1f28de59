"""WKB/WKT codec unit tests (mirrors the reference's per-kernel test layer,
SURVEY.md §5.1; WKT-parameterized like rust/sedona-testing create.rs)."""

import numpy as np
import pytest

from sedona_db_spark.geometry import wkb as W

ROUND_TRIPS = [
    "POINT (1 2)",
    "POINT (-1.5 2.25)",
    "POINT EMPTY",
    "LINESTRING (0 0, 1 1, 2 0)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "POLYGON EMPTY",
    "MULTIPOINT ((0 0), (1 1))",
    "MULTIPOINT EMPTY",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "MULTIPOLYGON EMPTY",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("wkt", ROUND_TRIPS)
def test_wkt_wkb_round_trip(wkt):
    b = W.wkt_to_wkb(wkt)
    assert W.wkb_to_wkt(b) == wkt
    # decode(encode(g)) is stable
    assert W.encode(W.decode(b)) == b


def test_point_golden_wkb():
    # little-endian ISO WKB for POINT (1 1) — golden bytes, mirrors
    # reference test_functions.py ST_AsBinary exact-byte expectations
    b = W.wkt_to_wkb("POINT (1 1)")
    assert b == bytes.fromhex("0101000000000000000000f03f000000000000f03f")


def test_vectorized_points():
    x = np.array([1.0, -2.5, 1e-9])
    y = np.array([3.0, 4.5, -1e9])
    ws = W.points_to_wkb(x, y)
    xx, yy = W.wkb_to_points(ws)
    np.testing.assert_array_equal(x, xx)
    np.testing.assert_array_equal(y, yy)


def test_mixed_batch_fallback():
    vals = [W.wkt_to_wkb("POINT (1 2)"), None, W.wkt_to_wkb("LINESTRING (0 0, 1 1)")]
    x, y = W.wkb_to_points(vals)
    assert x[0] == 1 and y[0] == 2
    assert np.isnan(x[1]) and np.isnan(x[2])


def test_big_endian_decode():
    import struct
    # big-endian POINT (1 2)
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    g = W.decode(be)
    assert g[0] == "Point" and g[1][0] == 1.0 and g[1][1] == 2.0


def test_ewkb_srid_flag():
    import struct
    # little-endian EWKB point with SRID flag
    ewkb = (b"\x01" + struct.pack("<I", 0x20000001) + struct.pack("<I", 4326)
            + struct.pack("<dd", 5.0, 6.0))
    g = W.decode(ewkb)
    assert g[0] == "Point" and list(g[1]) == [5.0, 6.0]


def test_z_variants():
    g = W.from_wkt("POINT Z (1 2 3)")
    assert len(g[1]) == 3
    b = W.encode(g)
    g2 = W.decode(b)
    assert list(g2[1]) == [1.0, 2.0, 3.0]


def test_ewkt_srid_prefix():
    g = W.from_wkt("SRID=4326;POINT (1 2)")
    assert g[0] == "Point" and list(g[1]) == [1.0, 2.0]


def test_mixed_zm_collection_round_trip():
    """round-2 ADVICE: per-part Z/M tokens must survive a WKT→WKB→WKT
    round trip for collections mixing M / Z / 2-D parts."""
    from sedona_db_spark.geometry import wkb as W
    t = "GEOMETRYCOLLECTION (POINT M (1 2 3), POINT Z (4 5 6), POINT (7 8))"
    got = W.wkb_to_wkt(W.wkt_to_wkb(t))
    assert "POINT M (1 2 3)" in got
    assert "POINT Z (4 5 6)" in got
    assert "POINT (7 8)" in got
    # homogeneous Z collection stamps nested tokens too (GEOS prints both)
    assert (W.wkb_to_wkt(W.wkt_to_wkb("GEOMETRYCOLLECTION Z (POINT Z (0 0 1))"))
            == "GEOMETRYCOLLECTION Z (POINT Z (0 0 1))")
    # nested collection
    t2 = "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT M (1 2 3)), POINT (9 9))"
    got2 = W.wkb_to_wkt(W.wkt_to_wkb(t2))
    assert "POINT M (1 2 3)" in got2 and "POINT (9 9)" in got2
