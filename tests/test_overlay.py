"""General polygon overlay: identity + sampled-membership property tests,
plus the SQL surface (ST_Difference/SymDifference/Union/aggregates)."""

import numpy as np
import pytest

from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.geometry.algos import boundary
from sedona_db_spark.geometry.overlay import boolean_op, union_all
from sedona_db_spark.sources.fixtures import random_polygons


@pytest.fixture(scope="module")
def geoms():
    polys = random_polygons(24, seed=21, num_vertices=(3, 9), hole_rate=0.3)
    return [W.decode(bytes(b)) for b in polys.geometry]


def test_overlay_identities_and_membership(geoms):
    rng = np.random.default_rng(5)
    area = K.geom_area
    for t in range(25):
        a = geoms[rng.integers(len(geoms))]
        b = geoms[rng.integers(len(geoms))]
        aU = boolean_op(a, b, "union")
        aI = boolean_op(a, b, "intersection")
        aD = boolean_op(a, b, "difference")
        aS = boolean_op(a, b, "symdifference")
        assert abs(area(aU) - (area(a) + area(b) - area(aI))) < 1e-9
        assert abs(area(aD) - (area(a) - area(aI))) < 1e-9
        assert abs(area(aS) - (area(aU) - area(aI))) < 1e-9
        bb, bb2 = K.geom_bbox(a), K.geom_bbox(b)
        px = rng.uniform(min(bb[0], bb2[0]) - 0.5, max(bb[2], bb2[2]) + 0.5, 150)
        py = rng.uniform(min(bb[1], bb2[1]) - 0.5, max(bb[3], bb2[3]) + 0.5, 150)
        inA = K.points_in_geom(px, py, a, boundary_counts=False)
        inB = K.points_in_geom(px, py, b, boundary_counts=False)
        ba, bbd = boundary(a), boundary(b)
        for res, fn in ((aU, lambda x, y: x | y), (aI, lambda x, y: x & y),
                        (aD, lambda x, y: x & ~y), (aS, lambda x, y: x ^ y)):
            got = K.points_in_geom(px, py, res)
            mism = got != fn(inA, inB)
            if mism.any():
                da = K.points_to_geom_distance(px[mism], py[mism], ba)
                db = K.points_to_geom_distance(px[mism], py[mism], bbd)
                assert (np.minimum(da, db) <= 1e-9).all()


def test_union_all_membership(geoms):
    U = union_all(geoms[:6])
    rng = np.random.default_rng(9)
    px = rng.uniform(-10, 10, 3000)
    py = rng.uniform(-10, 10, 3000)
    inU = K.points_in_geom(px, py, U)
    inAny = np.zeros(len(px), dtype=bool)
    for g in geoms[:6]:
        inAny |= K.points_in_geom(px, py, g)
    assert (inU == inAny).mean() > 0.999


def test_sql_overlay_surface(spark):
    def one(expr):
        return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]
    sq = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    sq2 = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    a = one(f"ST_Area(ST_Union(ST_GeomFromText('{sq}'), ST_GeomFromText('{sq2}')))")
    assert a == pytest.approx(7.0)
    a = one(f"ST_Area(ST_Difference(ST_GeomFromText('{sq}'), ST_GeomFromText('{sq2}')))")
    assert a == pytest.approx(3.0)
    a = one(f"ST_Area(ST_SymDifference(ST_GeomFromText('{sq}'), ST_GeomFromText('{sq2}')))")
    assert a == pytest.approx(6.0)
    a = one(f"ST_Area(ST_Intersection(ST_GeomFromText('{sq}'), ST_GeomFromText('{sq2}')))")
    assert a == pytest.approx(1.0)
    # concave x concave via the general path
    star1 = "POLYGON ((0 0, 4 1, 8 0, 6 4, 8 8, 4 6, 0 8, 2 4, 0 0))"
    star2 = "POLYGON ((3 3, 11 3, 11 6, 3 6, 3 3))"
    ai = one(f"ST_Area(ST_Intersection(ST_GeomFromText('{star1}'), ST_GeomFromText('{star2}')))")
    au = one(f"ST_Area(ST_Union(ST_GeomFromText('{star1}'), ST_GeomFromText('{star2}')))")
    a1 = one(f"ST_Area(ST_GeomFromText('{star1}'))")
    a2 = one(f"ST_Area(ST_GeomFromText('{star2}'))")
    assert au == pytest.approx(a1 + a2 - ai, abs=1e-9)


def test_union_intersection_agg(spark, geoms):
    from sedona_db_spark.functions.aggregates import union_agg, intersection_agg
    import pandas as pd
    rows = pd.DataFrame({
        "grp": [0, 0, 0, 1, 1],
        "geom": [W.encode(g) for g in geoms[:5]],
    })
    df = spark.createDataFrame(rows)
    u = {r["grp"]: W.decode(bytes(r["unioned"]))
         for r in union_agg(df, group_by=["grp"]).collect()}
    # group-0 union area == exact n-way union of the first three
    exp = K.geom_area(union_all(geoms[:3]))
    assert K.geom_area(u[0]) == pytest.approx(exp, abs=1e-9)
    i = {r["grp"]: W.decode(bytes(r["intersected"]))
         for r in intersection_agg(df, group_by=["grp"]).collect()}
    assert K.geom_area(i[0]) >= 0.0


def g(wkt):
    return W.from_wkt(wkt)


def test_dissolve_minimal_vertex_form():
    """Round-2 upgrade: overlay output is boundary rings with collinear
    vertices removed, not a trapezoid tiling."""
    a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    u = boolean_op(a, b, "union")
    assert u[0] == "Polygon" and len(u[1]) == 1
    assert len(u[1][0]) == 9  # 8-vertex L-union + closing point
    i = boolean_op(a, b, "intersection")
    assert i[0] == "Polygon" and len(i[1][0]) == 5  # square
    d = boolean_op(a, b, "difference")
    assert len(d[1][0]) == 7  # 6-vertex L


def test_dissolve_hole_reconstruction():
    big = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    small = g("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")
    dn = boolean_op(big, small, "difference")
    assert dn[0] == "Polygon" and len(dn[1]) == 2  # outer + hole
    assert len(dn[1][0]) == 5 and len(dn[1][1]) == 5
    assert abs(K.geom_area(dn) - 84.0) < 1e-12
    # hole of a hole: island inside
    isl = g("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    back = boolean_op(dn, isl, "union")
    assert abs(K.geom_area(back) - 88.0) < 1e-12
    mps = back[1] if back[0] == "MultiPolygon" else [back[1]]
    assert sum(len(rings) - 1 for rings in mps) >= 1  # hole(s) kept


def test_dissolve_membership_parity_random():
    """Region exactness after dissolve: sampled membership of op(A,B)
    equals the pointwise boolean of memberships."""
    rng = np.random.default_rng(5)
    from sedona_db_spark.sources import fixtures as FX
    from sedona_db_spark.geometry import wkb as W
    pls = FX.random_polygons(12, seed=31, num_vertices=(3, 8))
    G = [W.decode(bytes(v)) for v in pls.geometry]
    xs = rng.uniform(-12, 12, 4000)
    ys = rng.uniform(-12, 12, 4000)
    import itertools
    for a, b in itertools.islice(itertools.combinations(G, 2), 12):
        for op, fn in (("union", np.logical_or),
                       ("intersection", np.logical_and),
                       ("difference", lambda u, v: u & ~v)):
            got = boolean_op(a, b, op)
            ma = K.points_in_geom(xs, ys, a)
            mb = K.points_in_geom(xs, ys, b)
            mg = K.points_in_geom(xs, ys, got)
            mismatch = int((fn(ma, mb) != mg).sum())
            assert mismatch <= 2, (op, mismatch)  # boundary-sample slack


def test_makevalid_bowtie_even_odd():
    """ST_MakeValid rebuilds self-intersecting polygons via even-odd
    decomposition (GEOS linework semantics): a bowtie -> two triangles."""
    from sedona_db_spark.functions.scalar3 import make_valid
    from sedona_db_spark.geometry import algos as A
    bow = g("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert not A.is_valid(bow)
    v = make_valid(bow)
    assert v[0] == "MultiPolygon" and len(v[1]) == 2
    assert A.is_valid(v)
    assert abs(K.geom_area(v) - 2.0) < 1e-12
    # valid input passes through untouched
    sq = g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert make_valid(sq) is sq


def test_union_all_preserves_lower_dim_parts():
    """round-2 ADVICE: union_all folded with areal-only boolean_op and
    silently dropped point/line members; must now return a collection
    preserving them (GEOS semantics)."""
    import numpy as np
    from sedona_db_spark.geometry import overlay as O
    from sedona_db_spark.geometry import wkb as W
    sq = ("Polygon", [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)])
    pt = ("Point", np.array([5.0, 5.0]))
    ln = ("LineString", np.array([[10, 10], [11, 11]], float))
    u = O.union_all([pt, sq])
    assert u[0] == "GeometryCollection"
    assert sorted(p[0] for p in u[1]) == ["Point", "Polygon"]
    u3 = O.union_all([pt, sq, ln])
    assert sorted(p[0] for p in u3[1]) == ["LineString", "Point", "Polygon"]
    # a point INSIDE the square is absorbed, not duplicated
    u_in = O.union_all([("Point", np.array([0.5, 0.5])), sq])
    assert u_in[0] == "Polygon"
    # intersection: point inside square -> the point survives
    i = O.intersection_all([("Point", np.array([0.5, 0.5])), sq])
    assert W.to_wkt(i) == "POINT (0.5 0.5)"
    i2 = O.intersection_all([pt, sq])
    assert i2 == ("GeometryCollection", [])


def test_union_agg_sql_preserves_points(spark):
    """ST_Union_Agg over a mixed point+polygon group keeps the point."""
    df = spark.createDataFrame(
        [("POINT (5 5)",), ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)], ["g"])
    df.createOrReplaceTempView("mixed_union_src")
    row = spark.sql(
        "SELECT ST_AsText(ST_Union_Agg(ST_GeomFromText(g))) AS w "
        "FROM mixed_union_src").collect()[0]
    assert "POINT (5 5)" in row["w"] and "POLYGON" in row["w"]


def test_union_polygons_matches_pairwise_fold_fuzz():
    """Round-4 perf rewrite safety: the one-pass winding union must be
    region-identical to the old pairwise mixed_boolean_op fold on random
    overlapping soups (area + membership sampling)."""
    import numpy as np
    from sedona_db_spark.geometry.kernels import geom_area, points_in_geom
    from sedona_db_spark.geometry.overlay import (mixed_boolean_op,
                                                  union_polygons)
    rng = np.random.default_rng(23)

    def rand_part():
        kind = rng.integers(0, 3)
        cx, cy = rng.uniform(0, 30, 2)
        if kind == 0:  # rect
            w, h = rng.uniform(1, 6, 2)
            ring = np.array([[cx, cy], [cx + w, cy], [cx + w, cy + h],
                             [cx, cy + h], [cx, cy]])
        elif kind == 1:  # triangle
            p = cx + rng.uniform(-4, 4, (3, 2)) + [0, cy - cx]
            ring = np.vstack([p, p[:1]])
            if np.cross(p[1] - p[0], p[2] - p[0]) == 0:
                return rand_part()
        else:  # random convex-ish pentagon
            th = np.sort(rng.uniform(0, 2 * np.pi, 5))
            r = rng.uniform(1, 4)
            ring = np.column_stack([cx + r * np.cos(th),
                                    cy + r * np.sin(th)])
            ring = np.vstack([ring, ring[:1]])
        return ("Polygon", [ring])

    for trial in range(8):
        parts = [rand_part() for _ in range(int(rng.integers(3, 9)))]
        fast = union_polygons(parts)
        acc = None
        for g2 in parts:
            acc = g2 if acc is None else mixed_boolean_op(acc, g2, "union")
        assert geom_area(fast) == pytest.approx(geom_area(acc), rel=1e-9), \
            f"trial {trial}"
        qx = rng.uniform(-2, 38, 300)
        qy = rng.uniform(-2, 38, 300)
        mf = points_in_geom(qx, qy, fast)
        ms = points_in_geom(qx, qy, acc)
        dis = np.flatnonzero(mf != ms)
        # allow exact-boundary flips only
        for i in dis:
            on_any = any(
                points_in_geom(np.array([qx[i]]), np.array([qy[i]]), p)[0]
                for p in parts)
            inside_any = on_any
            assert mf[i] == inside_any or ms[i] == inside_any
