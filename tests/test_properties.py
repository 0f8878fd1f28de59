"""Property-based tests (hypothesis) for the geometry core.

Mirrors the reference's per-kernel robustness layer with generated inputs:
codec round trips, predicate symmetry/consistency, metric properties,
overlay identities, grid invariants.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sedona_db_spark import grid
from sedona_db_spark.geometry import algos as A
from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W

# quantized to 1e-6 (lon/lat-like precision): hypothesis otherwise explores
# denormal-range magnitudes (1e-311) where orientation tests underflow to 0
# and collinearity becomes direction-dependent — outside the engine's
# documented tolerance envelope
coord = st.floats(min_value=-1000, max_value=1000,
                  allow_nan=False, allow_infinity=False).map(
                      lambda v: round(v, 6))


@st.composite
def points(draw):
    return ("Point", np.array([draw(coord), draw(coord)]))


@st.composite
def linestrings(draw):
    n = draw(st.integers(2, 8))
    pts = np.array([[draw(coord), draw(coord)] for _ in range(n)])
    return ("LineString", pts)


@st.composite
def star_polygons(draw):
    """Always-valid star polygon (bounded-gap sectors)."""
    v = draw(st.integers(3, 10))
    cx, cy = draw(coord), draw(coord)
    base = draw(st.floats(0.1, 50, allow_nan=False))
    jit = [draw(st.floats(0.3, 0.7)) for _ in range(v)]
    radii = [base * draw(st.floats(0.5, 1.0)) for _ in range(v)]
    ang = [2 * np.pi * (i + jit[i]) / v for i in range(v)]
    ring = np.array([[cx + radii[i] * np.cos(ang[i]),
                      cy + radii[i] * np.sin(ang[i])] for i in range(v)])
    ring = np.vstack([ring, ring[:1]])
    return ("Polygon", [ring])


any_geom = st.one_of(points(), linestrings(), star_polygons())


@settings(max_examples=150, deadline=None)
@given(any_geom)
def test_wkb_round_trip(g):
    b = W.encode(g)
    g2 = W.decode(b)
    assert g2[0] == g[0]
    c1, c2 = K._all_coords(g), K._all_coords(g2)
    np.testing.assert_array_equal(c1, c2)
    assert W.encode(g2) == b  # stable re-encode


@settings(max_examples=100, deadline=None)
@given(any_geom)
def test_wkt_round_trip(g):
    t = W.to_wkt(g)
    g2 = W.from_wkt(t)
    c1, c2 = K._all_coords(g), K._all_coords(g2)
    # WKT printing uses repr() — exact doubles round-trip
    np.testing.assert_array_equal(c1[:, :2], c2[:, :2])


@settings(max_examples=100, deadline=None)
@given(any_geom, any_geom)
def test_predicate_symmetry(a, b):
    assert K.geom_intersects(a, b) == K.geom_intersects(b, a)
    assert K.geom_disjoint(a, b) == (not K.geom_intersects(a, b))
    assert K.geom_touches(a, b) == K.geom_touches(b, a)
    assert K.geom_within(a, b) == K.geom_contains(b, a)


@settings(max_examples=100, deadline=None)
@given(any_geom, any_geom)
def test_distance_properties(a, b):
    d = K.geom_distance(a, b)
    assert d >= 0
    assert abs(K.geom_distance(b, a) - d) < 1e-9  # symmetry
    # intersects carries a 1e-12-scale on-edge tolerance (robust boundary
    # tests); distances below it may be positive while intersects is true
    scale = max(1.0, *(abs(v) for v in K.geom_bbox(a) + K.geom_bbox(b)
                       if not np.isnan(v)))
    if K.geom_intersects(a, b):
        assert d <= 1e-9 * scale
    elif d > 1e-9 * scale:
        assert not K.geom_intersects(a, b)
    # dwithin consistency
    assert K.geom_dwithin(a, b, d + 1e-6)


@settings(max_examples=60, deadline=None)
@given(star_polygons(), star_polygons())
def test_overlay_identities_property(a, b):
    from sedona_db_spark.geometry.overlay import boolean_op
    area = K.geom_area
    aU = boolean_op(a, b, "union")
    aI = boolean_op(a, b, "intersection")
    scale = max(area(a), area(b), 1.0)
    assert abs(area(aU) - (area(a) + area(b) - area(aI))) < 1e-6 * scale
    assert area(aI) <= min(area(a), area(b)) + 1e-6 * scale
    assert area(aU) + 1e-6 * scale >= max(area(a), area(b))


@settings(max_examples=100, deadline=None)
@given(st.floats(-179.999, 179.999), st.floats(-89.999, 89.999),
       st.integers(0, 15))
def test_grid_invariants(lon, lat, res):
    c = grid.cell_id(lon, lat, res)
    r, ix, iy = grid.unpack(c)
    assert r == res
    x0, y0, x1, y1 = grid.cell_bbox(c)
    # fp rounding at a cell boundary may land a denormal-close point in the
    # adjacent cell; containment holds to 1e-9
    assert x0 - 1e-9 <= lon <= x1 + 1e-9 and y0 - 1e-9 <= lat <= y1 + 1e-9
    # SQL expression parity
    import duckdb
    # literals must be forced to DOUBLE: duckdb parses long decimal strings
    # as DECIMAL and the + 180.0 would overflow its scale
    got = duckdb.sql(
        f"SELECT {grid.cell_expr_sql(f'CAST({lon!r} AS DOUBLE)', f'CAST({lat!r} AS DOUBLE)', res)}"
    ).fetchone()[0]
    assert got == c


@settings(max_examples=60, deadline=None)
@given(star_polygons())
def test_polygon_invariants(g):
    assert A.is_valid(g)
    assert K.geom_area(g) >= 0
    c = K.geom_centroid(g)
    # centroid inside bbox
    x0, y0, x1, y1 = K.geom_bbox(g)
    assert x0 - 1e-9 <= c[1][0] <= x1 + 1e-9
    assert y0 - 1e-9 <= c[1][1] <= y1 + 1e-9
    # hull contains the polygon's vertices
    hull = K.convex_hull(g)
    pts = K._all_coords(g)
    assert K.points_in_geom(pts[:, 0], pts[:, 1], hull).all()
    assert K.geom_area(hull) >= K.geom_area(g) - 1e-9
