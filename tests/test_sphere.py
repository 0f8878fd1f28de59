"""Spherical (geography) kernel tests: unit-vector predicates vs
independent haversine/sampling oracles, polar + antimeridian cases."""

import numpy as np
import pytest

from sedona_db_spark.geometry import sphere as S
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.geometry.algos import EARTH_RADIUS_M, haversine_m
from sedona_db_spark.operators import spatial_join


def g(wkt):
    return W.from_wkt(wkt)


def uv(lon, lat):
    return S.unit_vecs(np.array([lon], dtype=float),
                       np.array([lat], dtype=float))[0]


def test_point_arc_distance_matches_haversine_sampling():
    """Distance to an arc == min over a dense sampling of the arc (within
    the sampling resolution)."""
    rng = np.random.default_rng(8)
    for _ in range(40):
        lon1, lon2 = rng.uniform(-179, 179, 2)
        lat1, lat2 = rng.uniform(-80, 80, 2)
        plon, plat = rng.uniform(-179, 179), rng.uniform(-85, 85)
        a, b = uv(lon1, lat1), uv(lon2, lat2)
        p = uv(plon, plat)
        got = S.point_arc_dist_m(p[None, :], a, b)[0]
        # sample the arc by slerp
        t = np.linspace(0, 1, 2001)[:, None]
        ang = S.arc_angle(a[None, :], b[None, :])[0]
        if ang < 1e-9:
            continue
        pts = (np.sin((1 - t) * ang) * a + np.sin(t * ang) * b) / np.sin(ang)
        pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        d_samp = EARTH_RADIUS_M * S.arc_angle(
            np.broadcast_to(p, pts.shape), pts).min()
        assert got <= d_samp + 1.0
        assert d_samp - got < EARTH_RADIUS_M * ang / 2000 + 1.0


def test_antimeridian_polygon_containment():
    poly = g("POLYGON ((170 -10, -170 -10, -170 10, 170 10, 170 -10))")
    assert S.point_in_geog(uv(179.5, 0), poly)
    assert S.point_in_geog(uv(-179.5, 5), poly)
    assert not S.point_in_geog(uv(160.0, 0), poly)
    assert not S.point_in_geog(uv(0.0, 0.0), poly)


def test_polar_cap_containment():
    cap = g("POLYGON ((0 80, 90 80, 180 80, -90 80, 0 80))")
    assert S.point_in_geog(uv(45.0, 89.0), cap)
    assert S.point_in_geog(uv(123.0, 89.9), cap)   # near the pole itself
    assert not S.point_in_geog(uv(45.0, 60.0), cap)


def test_polar_arcs_cross_where_planar_says_disjoint():
    a = g("LINESTRING (0 80, 180 80)")    # passes through the pole
    b = g("LINESTRING (90 85, -90 85)")   # also through the pole, higher lat
    assert S.geog_intersects(a, b)
    from sedona_db_spark.geometry import kernels as K
    assert not K.geom_intersects(a, b)   # planar chart disagrees — by design


def test_small_scale_parity_with_planar():
    """At small extents spherical and planar predicates agree."""
    from sedona_db_spark.geometry import kernels as K
    from sedona_db_spark.sources import fixtures as FX
    pls = FX.random_polygons(25, seed=3, num_vertices=(3, 7))
    pts = FX.random_points(40, seed=4)
    G = [W.decode(bytes(v)) for v in pls.geometry]
    P = [W.decode(bytes(v)) for v in pts.geometry]
    mism = 0
    for p in P:
        pv = uv(float(p[1][0]), float(p[1][1]))
        for poly in G:
            if S.point_in_geog(pv, poly) != K.points_in_geom(
                    np.array([p[1][0]]), np.array([p[1][1]]), poly)[0]:
                mism += 1
    assert mism <= 2  # boundary-adjacent tolerance differences only


def test_geog_distance_zero_iff_intersects():
    a = g("LINESTRING (0 0, 10 10)")
    b = g("LINESTRING (0 10, 10 0)")
    assert S.geog_intersects(a, b)
    assert S.geog_distance_m(a, b) == 0.0
    c = g("LINESTRING (20 20, 30 30)")
    d = S.geog_distance_m(a, c)
    ref = float(haversine_m(np.array([10.0]), np.array([10.0]),
                            np.array([20.0]), np.array([20.0]))[0])
    assert 0 < d <= ref + 1.0


def test_sphere_sql_surface(spark):
    r = spark.sql(
        "SELECT ST_IntersectsSphere(ST_GeomFromText('LINESTRING (0 80, 180 80)'),"
        " ST_GeomFromText('LINESTRING (90 80, -90 80)')) AS x,"
        " ST_ContainsSphere(ST_GeomFromText("
        "'POLYGON ((170 -10, -170 -10, -170 10, 170 10, 170 -10))'),"
        " ST_Point(179.5, 0.0)) AS c,"
        " ST_DWithinSphere(ST_Point(90.0, 85.0),"
        " ST_GeomFromText('LINESTRING (0 80, 180 80)'), 600000.0) AS w"
    ).collect()[0]
    assert r["x"] is True and r["c"] is True and r["w"] is True


# ---------------------------------------------------------------------------
# round-3: spherical joins beyond point×point (VERDICT #4)
# ---------------------------------------------------------------------------

def _brute_pairs_sphere(qrows, trows, pred, d=None):
    import numpy as np
    from sedona_db_spark.geometry import sphere as SPH
    from sedona_db_spark.geometry import wkb as W
    out = set()
    for qi, qb in qrows:
        g1 = W.decode(bytes(qb))
        for ti, tb in trows:
            g2 = W.decode(bytes(tb))
            if pred == "dwithin_sphere":
                if SPH.geog_distance_m(g1, g2) <= d:
                    out.add((qi, ti))
            else:
                if SPH.geog_intersects(g1, g2):
                    out.add((qi, ti))
    return out


def _mk_df(spark, rows):
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)
    schema = StructType([StructField("id", LongType()),
                         StructField("geom", BinaryType())])
    return spark.createDataFrame([(i, bytes(b)) for i, b in rows], schema)


def _sphere_fixture():
    """Points + lines + polygons spread over mid/high latitudes (bulge
    matters there)."""
    import numpy as np
    from sedona_db_spark.geometry import wkb as W
    rng = np.random.default_rng(5)
    pts = []
    for i in range(60):
        lon = float(rng.uniform(-170, 170))
        lat = float(rng.uniform(-75, 75))
        pts.append((i, W.encode(("Point", np.array([lon, lat])))))
    polys = []
    for i in range(8):
        cx = float(rng.uniform(-150, 150))
        cy = float(rng.uniform(-60, 60))
        w = float(rng.uniform(5, 25))
        h = float(rng.uniform(5, 15))
        ring = np.array([[cx, cy], [cx + w, cy], [cx + w, cy + h],
                         [cx, cy + h], [cx, cy]])
        polys.append((i, W.encode(("Polygon", [ring]))))
    lines = []
    for i in range(6):
        x0 = float(rng.uniform(-150, 100))
        y0 = float(rng.uniform(-60, 60))
        x1 = x0 + float(rng.uniform(10, 50))
        y1 = float(rng.uniform(-60, 60))
        lines.append((i, W.encode(("LineString",
                                   np.array([[x0, y0], [x1, y1]])))))
    return pts, lines, polys


@pytest.mark.parametrize("targets_kind", ["lines", "polys"])
def test_dwithin_sphere_points_x_nonpoint_broadcast(spark, targets_kind):
    """Point probes × line/polygon build side, broadcast path, vs brute
    force over geog_distance_m."""
    pts, lines, polys = _sphere_fixture()
    targets = lines if targets_kind == "lines" else polys
    D = 500_000.0  # 500 km
    got = {(r["id"], r["id_r"]) for r in spatial_join(
        _mk_df(spark, pts), _mk_df(spark, targets),
        predicate="dwithin_sphere", distance=D).collect()}
    assert got == _brute_pairs_sphere(pts, targets, "dwithin_sphere", D)


def test_dwithin_sphere_polygon_probe_generic_path(spark):
    """Non-point PROBE side (polygons × lines) routes through the generic
    cell join; pairs match brute force and are emitted exactly once."""
    _, lines, polys = _sphere_fixture()
    D = 300_000.0
    rows = spatial_join(
        _mk_df(spark, polys), _mk_df(spark, lines),
        predicate="dwithin_sphere", distance=D,
        broadcast_threshold=0).collect()   # force the generic path
    got = [(r["id"], r["id_r"]) for r in rows]
    assert len(got) == len(set(got))
    assert set(got) == _brute_pairs_sphere(polys, lines, "dwithin_sphere", D)


def test_intersects_sphere_join(spark):
    """intersects_sphere: point probes × polygons (broadcast) and
    line probes × polygons (generic) vs brute geog_intersects."""
    pts, lines, polys = _sphere_fixture()
    got = {(r["id"], r["id_r"]) for r in spatial_join(
        _mk_df(spark, pts), _mk_df(spark, polys),
        predicate="intersects_sphere").collect()}
    assert got == _brute_pairs_sphere(pts, polys, "intersects_sphere")

    rows = spatial_join(
        _mk_df(spark, lines), _mk_df(spark, polys),
        predicate="intersects_sphere", broadcast_threshold=0).collect()
    got2 = [(r["id"], r["id_r"]) for r in rows]
    assert len(got2) == len(set(got2))
    assert set(got2) == _brute_pairs_sphere(lines, polys, "intersects_sphere")


def test_points_to_geog_distance_matches_scalar():
    """Vectorized refine kernel == the scalar geog_distance_m."""
    import numpy as np
    from sedona_db_spark.geometry import sphere as SPH
    from sedona_db_spark.geometry import wkb as W
    pts, lines, polys = _sphere_fixture()
    px = np.array([W.decode(bytes(b))[1][0] for _, b in pts])
    py = np.array([W.decode(bytes(b))[1][1] for _, b in pts])
    for _, gb in lines + polys:
        g = W.decode(bytes(gb))
        vec = SPH.points_to_geog_distance_m(px, py, g)
        for i in range(0, len(px), 7):
            exact = SPH.geog_distance_m(
                ("Point", np.array([px[i], py[i]])), g)
            assert vec[i] == pytest.approx(exact, abs=1e-6, rel=1e-9)


def test_sphere_join_exploded_left_geodesic_bulge(spark):
    """Round-4 ADVICE (high): a non-point PROBE side whose geodesic edge
    bulges poleward past its planar vertex bbox must still find its pairs.
    LINESTRING(-100 80, 60 80)'s great-circle arc reaches ~lat 88.25; the
    polygon sits at that geodesic vertex, so a planar cover of the line
    misses the cells entirely."""
    import numpy as np
    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.geometry import sphere as SPH

    line = ("LineString", np.array([[-100.0, 80.0], [60.0, 80.0]]))
    ring = np.array([[-25.0, 87.5], [-15.0, 87.5], [-15.0, 89.0],
                     [-25.0, 89.0], [-25.0, 87.5]])
    poly = ("Polygon", [ring])
    assert SPH.geog_intersects(line, poly)  # pairwise truth

    lines = [(0, W.encode(line))]
    polys = [(0, W.encode(poly))]
    for bt in (0, 200_000):  # generic and broadcast planner paths
        got = {(r["id"], r["id_r"]) for r in spatial_join(
            _mk_df(spark, lines), _mk_df(spark, polys),
            predicate="intersects_sphere", broadcast_threshold=bt).collect()}
        assert got == {(0, 0)}, f"missed bulge pair (threshold={bt})"


def test_points_in_geog_matches_scalar_kernel():
    """Vectorized points_in_geog == scalar point_in_geog row-for-row
    (the broadcast intersects_sphere refine now uses it)."""
    import numpy as np
    from sedona_db_spark.geometry import sphere as SPH
    from sedona_db_spark.geometry import wkb as W
    pts, lines, polys = _sphere_fixture()
    px = np.array([W.decode(bytes(b))[1][0] for _, b in pts])
    py = np.array([W.decode(bytes(b))[1][1] for _, b in pts])
    for _, gb in lines + polys:
        g = W.decode(bytes(gb))
        vec = SPH.points_in_geog(px, py, g)
        for i in range(len(px)):
            p = SPH.unit_vecs(px[i:i + 1], py[i:i + 1])[0]
            assert bool(vec[i]) == SPH.point_in_geog(p, g), (i, g[0])
    # boundary + hole-boundary cases
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
                     [0.0, 0.0]])
    hole = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0],
                     [4.0, 4.0]])
    g = ("Polygon", [ring, hole])
    qx = np.array([5.0, 5.0, 0.0, 2.0, 20.0, 4.0])
    qy = np.array([5.0, 4.0, 0.0, 2.0, 20.0, 5.0])
    vec = SPH.points_in_geog(qx, qy, g)
    for i in range(len(qx)):
        p = SPH.unit_vecs(qx[i:i + 1], qy[i:i + 1])[0]
        assert bool(vec[i]) == SPH.point_in_geog(p, g), (qx[i], qy[i])


# ---------------------------------------------------------------------------
# round-4 VERDICT #8: antipodal / pole / dateline hardening vs brute force
# ---------------------------------------------------------------------------

def _slerp_samples(a, b, n=4001):
    import numpy as np
    t = np.linspace(0, 1, n)[:, None]
    ang = S.arc_angle(a[None, :], b[None, :])[0]
    if ang < 1e-12:
        return a[None, :]
    pts = (np.sin((1 - t) * ang) * a + np.sin(t * ang) * b) / np.sin(ang)
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def test_point_arc_distance_near_poles_and_dateline():
    """Arcs crossing the dateline and passing near the poles: kernel
    distance == min over dense slerp sampling."""
    import numpy as np
    cases = [
        ((170.0, 60.0), (-170.0, 62.0), (179.5, 70.0)),   # dateline cross
        ((-100.0, 80.0), (60.0, 80.0), (0.0, 89.5)),       # near-pole bulge
        ((10.0, 85.0), (-170.0, 85.0), (100.0, 89.9)),     # over the pole
        ((0.0, -80.0), (180.0, -80.0), (90.0, -89.9)),     # south pole
    ]
    for (lon1, lat1), (lon2, lat2), (plon, plat) in cases:
        a, b = uv(lon1, lat1), uv(lon2, lat2)
        p = uv(plon, plat)
        got = S.point_arc_dist_m(p[None, :], a, b)[0]
        samp = EARTH_RADIUS_M * S.arc_angle(
            _slerp_samples(a, b), p[None, :]).min()
        assert got <= samp + 1e-6
        assert abs(got - samp) < 50.0  # sampling resolution bound


def test_point_arc_distance_antipodal_point():
    """Distance from (near-)antipodal points stays in [0, pi*R] and agrees
    with sampling (the arc normal degenerates there)."""
    import numpy as np
    a, b = uv(10.0, 20.0), uv(40.0, 25.0)
    for plon, plat in [(10.0 - 180.0, -20.0), (-155.0, -22.0)]:
        p = uv(plon, plat)
        got = S.point_arc_dist_m(p[None, :], a, b)[0]
        assert 0.0 <= got <= np.pi * EARTH_RADIUS_M + 1e-6
        samp = EARTH_RADIUS_M * S.arc_angle(_slerp_samples(a, b),
                                            p[None, :]).min()
        assert abs(got - samp) < 100.0


def test_polar_cap_ring_containment():
    """Ring circling the north pole at lat 80: inside (pole, high lats)
    vs outside (mid lats, south) — exercises the antipode reference
    point (the ring centroid antipode is the SOUTH pole here)."""
    import numpy as np
    lons = np.linspace(-180, 180, 73)
    ring = np.column_stack([lons, np.full(len(lons), 80.0)])
    g = ("Polygon", [ring])
    inside = [(0.0, 90.0), (45.0, 85.0), (-120.0, 81.0)]
    outside = [(0.0, 70.0), (90.0, 0.0), (0.0, -90.0), (180.0, 60.0)]
    for lon, lat in inside:
        assert S.point_in_geog(uv(lon, lat), g), (lon, lat)
    for lon, lat in outside:
        assert not S.point_in_geog(uv(lon, lat), g), (lon, lat)
    # vectorized kernel agrees
    qx = np.array([p[0] for p in inside + outside], dtype=float)
    qy = np.array([p[1] for p in inside + outside], dtype=float)
    got = S.points_in_geog(qx, qy, g)
    assert got.tolist() == [True] * len(inside) + [False] * len(outside)


def test_dateline_spanning_polygon_containment():
    """Quad from lon 170 to -170 (crossing the antimeridian as great
    circles): membership on both sides of the seam, exclusion far away."""
    import numpy as np
    ring = np.array([[170.0, -10.0], [-170.0, -10.0],
                     [-170.0, 10.0], [170.0, 10.0], [170.0, -10.0]])
    g = ("Polygon", [ring])
    for lon, lat in [(175.0, 0.0), (-175.0, 5.0), (180.0, -5.0)]:
        assert S.point_in_geog(uv(lon, lat), g), (lon, lat)
    for lon, lat in [(160.0, 0.0), (-160.0, 0.0), (175.0, 40.0),
                     (0.0, 0.0)]:
        assert not S.point_in_geog(uv(lon, lat), g), (lon, lat)


def test_geog_intersects_dateline_arcs():
    """Arcs crossing the dateline intersect when their great circles
    cross within both spans; parallel offset arcs don't."""
    import numpy as np
    l1 = ("LineString", np.array([[170.0, 0.0], [-170.0, 0.0]]))
    l2 = ("LineString", np.array([[178.0, -5.0], [-178.0, 5.0]]))
    l3 = ("LineString", np.array([[178.0, 20.0], [-178.0, 25.0]]))
    assert S.geog_intersects(l1, l2)
    assert not S.geog_intersects(l1, l3)


def test_containment_matches_winding_bruteforce_random_rings():
    """Random mid/high-lat convex-ish rings: kernel parity vs an
    independent tangent-angle winding accumulation at sample points."""
    import numpy as np
    rng = np.random.default_rng(17)

    def winding_contains(p, ring_v):
        # accumulate signed angles of ring vertices seen from p on the
        # sphere (gnomonic projection about p) — independent of the
        # kernel's crossing-parity construction
        n = p
        # local tangent basis
        t1 = np.cross(n, [0.0, 0.0, 1.0])
        if np.linalg.norm(t1) < 1e-9:
            t1 = np.cross(n, [1.0, 0.0, 0.0])
        t1 = t1 / np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        # gnomonic coordinates (rays through sphere center)
        denom = ring_v @ n
        if np.any(denom <= 1e-9):
            return None  # vertex beyond the horizon: projection invalid
        q = np.column_stack([(ring_v @ t1) / denom, (ring_v @ t2) / denom])
        ang = np.arctan2(q[:, 1], q[:, 0])
        d = np.diff(np.r_[ang, ang[0]])
        d = (d + np.pi) % (2 * np.pi) - np.pi
        return abs(d.sum()) > np.pi

    for _ in range(25):
        clon = float(rng.uniform(-170, 170))
        clat = float(rng.uniform(-75, 75))
        r = float(rng.uniform(3, 12))
        th = np.linspace(0, 2 * np.pi, 13)[:-1]
        ring = np.column_stack([clon + r * np.cos(th) / max(
            np.cos(np.radians(clat)), 0.2), clat + r * np.sin(th)])
        ring = np.vstack([ring, ring[:1]])
        rv = S._ring_vecs(ring[:-1])
        g = ("Polygon", [ring])
        for _ in range(8):
            plon = clon + float(rng.uniform(-2.5 * r, 2.5 * r))
            plat = float(np.clip(clat + rng.uniform(-2.5 * r, 2.5 * r),
                                 -89, 89))
            p = uv(plon, plat)
            expected = winding_contains(p, rv)
            if expected is None:
                continue
            # skip razor-edge points (both methods honest within 1 mm)
            from sedona_db_spark.geometry import wkb as W2
            if S.points_to_geog_distance_m(
                    np.array([plon]), np.array([plat]), g)[0] < 1.0 \
                    and S.point_in_geog(p, g) != expected:
                continue
            assert S.point_in_geog(p, g) == expected, (plon, plat, clon,
                                                       clat, r)


class TestVincentySpheroid:
    """WGS84 geodesic inverse (algos.vincenty_inverse_m) — exact closed
    pins plus sphere-consistency envelope."""

    def test_quarter_meridian_exact(self):
        import numpy as np
        from sedona_db_spark.geometry.algos import vincenty_inverse_m
        d = vincenty_inverse_m(np.array([0.0]), np.array([0.0]),
                               np.array([0.0]), np.array([90.0]))[0]
        assert d == pytest.approx(10001965.7293, abs=1e-3)

    def test_equator_arc_exact(self):
        import numpy as np
        from sedona_db_spark.geometry.algos import vincenty_inverse_m
        d = vincenty_inverse_m(np.array([0.0]), np.array([0.0]),
                               np.array([1.0]), np.array([0.0]))[0]
        assert d == pytest.approx(6378137.0 * np.pi / 180.0, abs=1e-3)

    def test_envelope_vs_sphere_and_symmetry(self):
        import numpy as np
        from sedona_db_spark.geometry.algos import (haversine_m,
                                                    vincenty_inverse_m)
        rng = np.random.default_rng(11)
        lon1, lat1 = rng.uniform(-180, 180, 500), rng.uniform(-80, 80, 500)
        lon2, lat2 = rng.uniform(-180, 180, 500), rng.uniform(-80, 80, 500)
        v = vincenty_inverse_m(lon1, lat1, lon2, lat2)
        h = haversine_m(lon1, lat1, lon2, lat2)
        assert np.all(np.abs(v - h) / np.maximum(h, 1.0) < 0.006)
        v2 = vincenty_inverse_m(lon2, lat2, lon1, lat1)
        assert np.allclose(v, v2, rtol=0, atol=1e-6)
        z = vincenty_inverse_m(np.array([10.0]), np.array([20.0]),
                               np.array([10.0]), np.array([20.0]))[0]
        assert z == 0.0

    def test_sql_surface(self, spark):
        row = spark.sql("""SELECT
            ST_DistanceSpheroid(ST_Point(0.0d, 0.0d),
                                ST_Point(0.0d, 90.0d)) AS qm,
            ST_DistanceSpheroid(ST_Point(2.3522d, 48.8566d),
                                ST_Point(-0.1276d, 51.5072d)) AS par_lon
        """).collect()[0]
        assert row.qm == pytest.approx(10001965.73, abs=0.01)
        assert row.par_lon == pytest.approx(343900, rel=0.01)  # ~344 km

    def test_non_point_rows_yield_null_not_job_failure(self, spark):
        # review regression: one bad row must not poison the job
        row = spark.sql("""SELECT
            ST_DistanceSpheroid(ST_GeomFromText('LINESTRING (0 0, 1 1)'),
                                ST_Point(0.0d, 0.0d)) AS bad,
            ST_DistanceSpheroid(ST_Point(0.0d, 0.0d),
                                ST_Point(1.0d, 0.0d)) AS good
        """).collect()[0]
        assert row.bad is None or row.bad != row.bad   # NULL/NaN
        assert row.good == pytest.approx(111319.49, abs=0.1)
