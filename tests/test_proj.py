"""Projection tests: round-trips + analytic invariants (no pyproj in the
sandbox, so correctness rests on mathematical identities of each
projection rather than cross-library goldens)."""

import numpy as np
import pytest

from sedona_db_spark.geometry import proj as P
from sedona_db_spark.geometry.algos import transform_coords


RNG = np.random.default_rng(11)


def _roundtrip(fwd, inv, lon, lat, tol=1e-8):
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    assert np.abs(lon2 - lon).max() < tol
    assert np.abs(lat2 - lat).max() < tol


def test_utm_roundtrip_all_zones():
    for zone in (1, 18, 33, 60):
        for code in (f"326{zone:02d}", f"327{zone:02d}"):
            fwd, inv = P.projection_for(code)
            lon0 = zone * 6 - 183
            lon = lon0 + RNG.uniform(-3, 3, 200)
            lat = RNG.uniform(-80, 84, 200) * (1 if code[2] == "6" else -1)
            lat = -np.abs(lat) if code.startswith("327") else np.abs(lat)
            _roundtrip(fwd, inv, lon, lat)


def test_utm_analytic_anchors():
    fwd, _ = P.projection_for("32633")  # zone 33N, lon0=15
    # central meridian → easting exactly 500000
    x, y = fwd(np.array([15.0, 15.0]), np.array([0.0, 45.0]))
    assert abs(x[0] - 500_000.0) < 1e-6
    assert abs(x[1] - 500_000.0) < 1e-6
    assert abs(y[0]) < 1e-6  # equator → northing 0
    # scale on the central meridian = k0: dy/dM = 0.9996
    _, y1 = fwd(np.array([15.0]), np.array([45.0]))
    _, y2 = fwd(np.array([15.0]), np.array([45.001]))
    dM = (P._merid_arc(P.WGS84, np.radians(np.array([45.001])))
          - P._merid_arc(P.WGS84, np.radians(np.array([45.0]))))[0]
    assert abs((y2[0] - y1[0]) / dM - 0.9996) < 1e-9
    # southern-hemisphere false northing
    fwd_s, _ = P.projection_for("32733")
    _, ys = fwd_s(np.array([15.0]), np.array([-0.0001]))
    assert 0 < 10_000_000.0 - ys[0] < 20


def test_utm_vs_spherical_tm_sanity():
    """The ellipsoidal series must stay within a few km of the spherical
    transverse-Mercator closed form (gross-error detector)."""
    fwd, _ = P.projection_for("32618")  # zone 18N, lon0=-75
    lon = np.array([-74.0, -76.5, -75.0])
    lat = np.array([40.7, 10.0, 60.0])
    x, y = fwd(lon, lat)
    R, k0, lon0 = 6371000.0, 0.9996, -75.0
    B = np.cos(np.radians(lat)) * np.sin(np.radians(lon - lon0))
    xs = k0 * R / 2 * np.log((1 + B) / (1 - B)) + 500_000
    ys = k0 * R * (np.arctan2(np.tan(np.radians(lat)),
                              np.cos(np.radians(lon - lon0))))
    assert np.abs(x - xs).max() < 5_000
    assert np.abs(y - ys).max() < 50_000  # meridian arc vs sphere ~0.5%


def test_lcc_roundtrip_and_standard_parallel_scale():
    fwd, inv = P.projection_for("2154")  # Lambert-93
    lon = RNG.uniform(-4, 8, 200)
    lat = RNG.uniform(42, 51, 200)
    _roundtrip(fwd, inv, lon, lat)
    # scale along a standard parallel (49°N) is exactly 1: projected
    # distance equals the ellipsoidal parallel-arc length
    ell = P.GRS80
    phi = np.radians(49.0)
    N = ell.a / np.sqrt(1 - ell.e2 * np.sin(phi) ** 2)
    dlam = 0.001
    arc = N * np.cos(phi) * np.radians(dlam)
    x1, y1 = fwd(np.array([3.0]), np.array([49.0]))
    x2, y2 = fwd(np.array([3.0 + dlam]), np.array([49.0]))
    got = float(np.hypot(x2 - x1, y2 - y1)[0])
    assert abs(got - arc) / arc < 1e-9


def test_lcc_canada_roundtrip():
    fwd, inv = P.projection_for("3978")
    lon = RNG.uniform(-140, -55, 200)
    lat = RNG.uniform(42, 83, 200)
    _roundtrip(fwd, inv, lon, lat)


def test_albers_roundtrip_and_equal_area():
    fwd, inv = P.projection_for("5070")
    lon = RNG.uniform(-124, -67, 200)
    lat = RNG.uniform(25, 49, 200)
    _roundtrip(fwd, inv, lon, lat, tol=1e-7)
    # equal-area: projected shoelace area of a lon/lat rect equals the
    # ellipsoidal (authalic) area a²·Δλ·(q₂−q₁)/2
    ell = P.GRS80
    lo0, lo1, la0, la1 = -100.0, -98.0, 35.0, 37.0
    q0 = float(P._albers_q(ell, np.radians(np.array([la0])))[0])
    q1 = float(P._albers_q(ell, np.radians(np.array([la1])))[0])
    true_area = ell.a ** 2 * np.radians(lo1 - lo0) * (q1 - q0) / 2
    # dense boundary polygon (curved edges in projected space)
    n = 400
    lons = np.r_[np.linspace(lo0, lo1, n), np.full(n, lo1),
                 np.linspace(lo1, lo0, n), np.full(n, lo0)]
    lats = np.r_[np.full(n, la0), np.linspace(la0, la1, n),
                 np.full(n, la1), np.linspace(la1, la0, n)]
    x, y = fwd(lons, lats)
    shoelace = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert abs(shoelace - true_area) / true_area < 1e-6


def test_transform_coords_routing():
    # UTM → Lambert-93 via the 4326 hub, and alias/code-form handling
    arr = np.array([[500_000.0, 5_000_000.0]])
    out = transform_coords(arr.copy(), "EPSG:32631", "EPSG:2154")
    back = transform_coords(out, "2154", "epsg:32631")
    # mm-level: two chained series projections (TM truncation ~1e-4 m)
    assert np.abs(back - arr).max() < 1e-3
    with pytest.raises(ValueError):
        transform_coords(arr, "EPSG:99999", "EPSG:4326")
    # 3857 hub legs unchanged
    ll = transform_coords(np.array([[0.0, 0.0]]), "EPSG:3857", "OGC:CRS84")
    assert np.abs(ll).max() < 1e-12


def test_st_transform_sql_utm(spark):
    rows = spark.sql(
        "SELECT ST_X(t) AS x, ST_Y(t) AS y FROM (SELECT "
        "ST_Transform(ST_Point(15.0, 0.0), 'EPSG:4326', 'EPSG:32633') AS t)"
    ).collect()
    assert abs(rows[0]["x"] - 500_000.0) < 1e-6
    assert abs(rows[0]["y"]) < 1e-6


# ---------------------------------------------------------------------------
# round-3: polar stereographic (EPSG 3413/3031) + sinusoidal (54008)
# ---------------------------------------------------------------------------

def test_polar_stereographic_epsg_worked_example():
    """EPSG guidance note 7-2, method 9829 variant B worked example
    (Australian Antarctic Polar Stereographic): lat_ts -71, lon0 70E,
    FE = FN = 6000000; (120E, 75S) -> E 7255380.79, N 7053389.56."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    x, y = P.ps_fwd(np.array([120.0]), np.array([-75.0]), 70.0, -71.0,
                    6_000_000.0, 6_000_000.0)
    assert x[0] == pytest.approx(7255380.79, abs=0.01)
    assert y[0] == pytest.approx(7053389.56, abs=0.01)
    lon, lat = P.ps_inv(np.array([7255380.79]), np.array([7053389.56]),
                        70.0, -71.0, 6_000_000.0, 6_000_000.0)
    assert lon[0] == pytest.approx(120.0, abs=1e-6)
    assert lat[0] == pytest.approx(-75.0, abs=1e-6)


@pytest.mark.parametrize("code,lat_rng", [
    ("3413", (45.0, 89.9)), ("3031", (-89.9, -45.0)), ("54008", (-89.0, 89.0)),
])
def test_new_projection_round_trips(code, lat_rng):
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    fwd, inv = P.projection_for(code)
    rng = np.random.default_rng(9)
    lon = rng.uniform(-179.0, 179.0, 500)
    lat = rng.uniform(*lat_rng, 500)
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    assert np.abs(((lon2 - lon + 180) % 360) - 180).max() < 1e-6
    assert np.abs(lat2 - lat).max() < 1e-7


def test_sinusoidal_is_equal_area():
    """Sinusoidal preserves area: a 1x1 deg cell at 60N projects to about
    cos(60) ~ half the equatorial cell's width, same height."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    fwd, _ = P.projection_for("54008")
    (x0,), (y0,) = fwd(np.array([10.0]), np.array([60.0]))
    (x1,), (y1,) = fwd(np.array([11.0]), np.array([60.0]))
    (xe0,), _ = fwd(np.array([10.0]), np.array([0.0]))
    (xe1,), _ = fwd(np.array([11.0]), np.array([0.0]))
    import math
    from sedona_db_spark.geometry.proj import WGS84
    # exact ellipsoidal width ratio: cos φ / sqrt(1 − e² sin²φ)
    exp = 0.5 / math.sqrt(1 - WGS84.e2 * math.sin(math.radians(60.0)) ** 2)
    assert (x1 - x0) / (xe1 - xe0) == pytest.approx(exp, rel=1e-9)


def test_transform_sql_polar(spark):
    """ST_Transform through the SQL surface for the new codes."""
    r = spark.sql(
        "SELECT ST_AsText(ST_Transform(ST_Transform(ST_Point(-45.0, 70.0),"
        " 'EPSG:4326', 'EPSG:3413'), 'EPSG:3413', 'EPSG:4326')) AS w"
    ).collect()[0]["w"]
    assert "POINT (-45" in r and "70" in r


def test_laea_epsg_worked_example():
    """EPSG Guidance Note 7-2 worked example, method 9820 (ETRS89-LAEA
    Europe 3035): 50N 5E -> E 3962799.45, N 2999718.85."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    fwd, inv = P.projection_for("3035")
    x, y = fwd(np.array([5.0]), np.array([50.0]))
    assert float(x[0]) == pytest.approx(3962799.45, abs=0.01)
    assert float(y[0]) == pytest.approx(2999718.85, abs=0.01)
    # round trip over the European extent
    rng = np.random.default_rng(3)
    lons = rng.uniform(-10, 30, 300)
    lats = rng.uniform(35, 70, 300)
    X, Y = fwd(lons, lats)
    LO, LA = inv(X, Y)
    assert np.abs(LO - lons).max() < 1e-9
    assert np.abs(LA - lats).max() < 1e-9


def test_laea_is_equal_area():
    """LAEA preserves area: compare a small quad's projected area at 60N
    vs its exact ellipsoidal area ratio against an equatorial quad."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    from sedona_db_spark.geometry.proj import GRS80
    import math
    fwd, _ = P.projection_for("3035")

    def quad_area(lon, lat, d=0.1):
        xs, ys = fwd(np.array([lon, lon + d, lon + d, lon]),
                     np.array([lat, lat, lat + d, lat + d]))
        return 0.5 * abs(sum(xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i]
                             for i in range(4)))

    a_hi = quad_area(10.0, 60.0)
    a_lo = quad_area(10.0, 40.0)
    def cell_area(lat):
        # ellipsoidal area element ∝ cosφ (1-e²) / (1-e² sin²φ)²
        p = math.radians(lat + 0.05)
        return math.cos(p) * (1 - GRS80.e2) / (1 - GRS80.e2 * math.sin(p) ** 2) ** 2
    assert a_hi / a_lo == pytest.approx(cell_area(60.0) / cell_area(40.0),
                                        rel=1e-4)


def test_nztm_round_trip():
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    fwd, inv = P.projection_for("2193")
    lons = np.random.default_rng(5).uniform(166, 179, 200)
    lats = np.random.default_rng(6).uniform(-47.5, -34, 200)
    X, Y = fwd(lons, lats)
    LO, LA = inv(X, Y)
    # NZTM spans ±7° from the central meridian — the Snyder TM series
    # truncates around 2e-6 deg (~20 cm) at the fringes (documented tier)
    assert np.abs(LO - lons).max() < 5e-6
    assert np.abs(LA - lats).max() < 5e-6
    # central-meridian false easting: lon0=173 projects to E=1,600,000
    x, _ = fwd(np.array([173.0]), np.array([-41.0]))
    assert float(x[0]) == pytest.approx(1_600_000.0, abs=1e-6)


# ---------------------------------------------------------------------------
# round 4: Helmert datum-shift tier (OSGB 27700, DHDN Gauss-Krüger)
# ---------------------------------------------------------------------------

def test_osgb_projection_os_worked_example():
    """OS 'A guide to coordinate systems in Great Britain' worked example
    (projection stage, OSGB36 geographic input): mm-exact."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = P.tmerc_fwd(np.array([lon]), np.array([lat]), -2.0, 49.0,
                       0.9996012717, 400000.0, -100000.0, P.AIRY)
    assert abs(x[0] - 651409.903) < 1e-3
    assert abs(y[0] - 313177.270) < 1e-3


def test_helmert_position_vector_epsg_example():
    """EPSG Guidance Note 7-2, method 9606 example (WGS72 → WGS84):
    (0, 0, 4.5 m, 0, 0, 0.554", 0.219 ppm)."""
    from sedona_db_spark.geometry.proj import helmert_pv
    X, Y, Z = helmert_pv(3657660.66, 255768.55, 5201382.11,
                         (0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219))
    # the guidance note publishes 2-decimal outputs
    assert abs(X - 3657660.78) < 0.015
    assert abs(Y - 255778.43) < 0.015
    assert abs(Z - 5201387.75) < 0.015


def test_helmert_inverse_is_negation_roundtrip():
    import numpy as np
    from sedona_db_spark.geometry.proj import TOWGS84, helmert_pv
    rng = np.random.default_rng(3)
    X = rng.uniform(-6.4e6, 6.4e6, 50)
    Y = rng.uniform(-6.4e6, 6.4e6, 50)
    Z = rng.uniform(-6.4e6, 6.4e6, 50)
    Xp, Yp, Zp = helmert_pv(X, Y, Z, TOWGS84["OSGB36"])
    Xb, Yb, Zb = helmert_pv(Xp, Yp, Zp, TOWGS84["OSGB36"], inverse=True)
    # EPSG small-angle reversal: the ds x translation cross term dominates
    # (20.5 ppm x ~540 m ~ 1.1 cm); centimetre-level is the method's spec
    assert np.abs(Xb - X).max() < 0.02
    assert np.abs(Yb - Y).max() < 0.02
    assert np.abs(Zb - Z).max() < 0.02


def test_ecef_geodetic_roundtrip_all_ellipsoids():
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    rng = np.random.default_rng(4)
    lon = rng.uniform(-179, 179, 100)
    lat = rng.uniform(-85, 85, 100)
    for ell in (P.WGS84, P.AIRY, P.BESSEL):
        X, Y, Z = P.geodetic_to_ecef(lon, lat, ell)
        lo, la = P.ecef_to_geodetic(X, Y, Z, ell)
        assert np.abs(lo - lon).max() < 1e-11
        assert np.abs(la - lat).max() < 1e-11


def test_osgb_full_transform_roundtrip_and_sanity():
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    fwd, inv = P.projection_for("27700")
    # London: authoritative BNG grid ref ~ (530000 E, 180400 N)
    e, n = fwd(np.array([-0.1278]), np.array([51.5074]))
    assert 529000 < e[0] < 531000 and 179400 < n[0] < 181400
    rng = np.random.default_rng(5)
    lon = rng.uniform(-7.5, 1.7, 80)
    lat = rng.uniform(49.9, 60.8, 80)
    e, n = fwd(lon, lat)
    lo, la = inv(e, n)
    # negated-Helmert reversal dominates: ~1e-7 deg (~1 cm)
    assert np.abs(lo - lon).max() < 5e-7
    assert np.abs(la - lat).max() < 5e-7


def test_dhdn_gk_zones_roundtrip():
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    for zone, lon0 in ((2, 6.0), (3, 9.0), (4, 12.0), (5, 15.0)):
        fwd, inv = P.projection_for(str(31464 + zone))
        rng = np.random.default_rng(zone)
        lon = rng.uniform(lon0 - 1.6, lon0 + 1.6, 40)
        lat = rng.uniform(47.2, 55.0, 40)
        e, n = fwd(lon, lat)
        # GK false easting encodes the zone number
        assert ((e > zone * 1e6) & (e < zone * 1e6 + 1e6)).all()
        lo, la = inv(e, n)
        assert np.abs(lo - lon).max() < 5e-7
        assert np.abs(la - lat).max() < 5e-7


def test_transform_sql_osgb(spark):
    rows = spark.sql(
        "SELECT ST_AsText(ST_Transform(ST_Point(-0.1278d, 51.5074d), "
        "'EPSG:4326', 'EPSG:27700')) AS wkt").collect()
    x, y = map(float, rows[0]["wkt"].replace("POINT (", "").rstrip(")").split())
    assert 529000 < x < 531000 and 179400 < y < 181400


def test_ed50_utm_roundtrip_and_offset_direction():
    """ED50/UTM (EPSG:230zz, Intl 1924 + 3-param shift): round trips and
    the well-known ~100-200 m NE-ish offset vs WGS84 UTM in Europe."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    fwd50, inv50 = P.projection_for("23031")   # zone 31 (Benelux/France)
    fwd84, _ = P.projection_for("32631")
    lon = np.array([2.0, 4.5, 5.9])
    lat = np.array([44.0, 50.0, 52.2])
    e50, n50 = fwd50(lon, lat)
    e84, n84 = fwd84(lon, lat)
    d = np.hypot(e50 - e84, n50 - n84)
    assert ((d > 50) & (d < 350)).all()  # the classic ED50-WGS84 shift
    lo, la = inv50(e50, n50)
    assert np.abs(lo - lon).max() < 5e-7
    assert np.abs(la - lat).max() < 5e-7


def test_world_mercator_3395_epsg_worked_example():
    """EPSG Guidance 7-2 Mercator (1SP variant B essence): at the equator
    x = a*lam exactly; known pair: lat 53N lon 3E -> y ~ 6,948,386 m
    (published EPSG:3395 coordinate for the Dutch coast area); round trip
    to 1e-9 deg."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    x, y = P.merc_fwd(np.array([3.0]), np.array([53.0]))
    assert abs(x[0] - 3.0 * np.pi / 180 * 6378137.0) < 1e-6
    assert 6.90e6 < y[0] < 7.00e6
    lo, la = P.merc_inv(x, y)
    assert abs(lo[0] - 3.0) < 1e-11 and abs(la[0] - 53.0) < 1e-11
    # differs from the spherical 3857 northing by the ellipsoidal term
    y_sph = 6378137.0 * np.log(np.tan(np.pi / 4 + np.radians(53.0) / 2))
    assert abs(y[0] - y_sph) > 10_000


def test_ups_worked_example_and_roundtrip():
    """EPSG guidance UPS example: 73N 44E -> E 3320416.75, N 632668.43
    (EPSG:32661); plus round trips both poles."""
    import numpy as np
    from sedona_db_spark.geometry import proj as P
    x, y = P.ups_fwd(np.array([44.0]), np.array([73.0]), True)
    assert abs(x[0] - 3320416.75) < 0.02
    assert abs(y[0] - 632668.43) < 0.02
    for north in (True, False):
        rng = np.random.default_rng(9)
        lon = rng.uniform(-179, 179, 60)
        lat = rng.uniform(60, 89.5, 60) * (1 if north else -1)
        e, n = P.ups_fwd(lon, lat, north)
        lo, la = P.ups_inv(e, n, north)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9


def test_transform_sql_3395_and_ups(spark):
    r = spark.sql(
        "SELECT ST_AsText(ST_Transform(ST_Point(3.0d, 53.0d), 'EPSG:4326', "
        "'EPSG:3395')) AS m, "
        "ST_AsText(ST_Transform(ST_Point(44.0d, 73.0d), 'EPSG:4326', "
        "'EPSG:32661')) AS ups").collect()[0]
    mx, my = map(float, r["m"].replace("POINT (", "").rstrip(")").split())
    ux, uy = map(float, r["ups"].replace("POINT (", "").rstrip(")").split())
    assert 6.90e6 < my < 7.00e6
    assert abs(ux - 3320416.75) < 0.02 and abs(uy - 632668.43) < 0.02


# ---------------------------------------------------------------------------
# round-6 NTv2 grid-shift tier: bilinear mechanism + .gsb round trip
# ---------------------------------------------------------------------------

def _synth_grid():
    """Shift field linear in lon/lat (bilinear interpolation of a
    bilinear field is EXACT at every point, not just at nodes)."""
    from sedona_db_spark.geometry.proj import ShiftGrid
    lats = np.arange(40.0, 42.0001, 0.25)
    lons = np.arange(-106.0, -103.9999, 0.25)
    LON, LAT = np.meshgrid(lons, lats)
    dlat = 1.2 + 0.3 * (LAT - 40.0) + 0.1 * (LON + 106.0)   # arc-seconds
    dlon = -0.8 + 0.05 * (LAT - 40.0) - 0.2 * (LON + 106.0)
    return ShiftGrid(40.0, 0.25, -106.0, 0.25, dlat, dlon), \
        (lambda lon, lat: (1.2 + 0.3*(lat-40.0) + 0.1*(lon+106.0)) / 3600.0), \
        (lambda lon, lat: (-0.8 + 0.05*(lat-40.0) - 0.2*(lon+106.0)) / 3600.0)


def test_shift_grid_bilinear_exact_on_linear_field():
    grid, f_dlat, f_dlon = _synth_grid()
    rng = np.random.default_rng(8)
    lon = rng.uniform(-106.0, -104.0, 300)
    lat = rng.uniform(40.0, 42.0, 300)
    lo, la, ok = grid.apply(lon, lat)
    assert ok.all()
    np.testing.assert_allclose(la - lat, f_dlat(lon, lat), rtol=0, atol=1e-14)
    np.testing.assert_allclose(lo - lon, f_dlon(lon, lat), rtol=0, atol=1e-14)


def test_shift_grid_inverse_fixed_point():
    grid, _, _ = _synth_grid()
    rng = np.random.default_rng(9)
    lon = rng.uniform(-105.8, -104.2, 200)
    lat = rng.uniform(40.2, 41.8, 200)
    lo_t, la_t, _ = grid.apply(lon, lat)
    lo_b, la_b, ok = grid.apply_inverse(lo_t, la_t)
    assert ok.all()
    np.testing.assert_allclose(lo_b, lon, rtol=0, atol=1e-12)
    np.testing.assert_allclose(la_b, lat, rtol=0, atol=1e-12)


def test_shift_grid_outside_passthrough():
    grid, _, _ = _synth_grid()
    lo, la, ok = grid.apply(np.array([0.0]), np.array([0.0]))
    assert not ok[0] and lo[0] == 0.0 and la[0] == 0.0


def test_ntv2_gsb_round_trip():
    from sedona_db_spark.geometry.proj import load_ntv2, write_ntv2
    grid, _, _ = _synth_grid()
    blob = write_ntv2(grid)
    back = load_ntv2(blob)
    assert (back.ny, back.nx) == (grid.ny, grid.nx)
    assert back.lat_min == grid.lat_min and back.lon_min == grid.lon_min
    assert back.lat_inc == grid.lat_inc and back.lon_inc == grid.lon_inc
    # float32 storage: shifts survive to f4 precision
    np.testing.assert_allclose(back.dlat, grid.dlat, rtol=0, atol=1e-4)
    np.testing.assert_allclose(back.dlon, grid.dlon, rtol=0, atol=1e-4)


def test_nadgrids_transform_end_to_end():
    """'+nadgrids=' leg through resolve_crs: projected output must equal
    the manual composition grid-shift -> TM, and round-trip."""
    from sedona_db_spark.geometry.proj import (
        SHIFT_GRIDS, load_ntv2, resolve_crs, tmerc_fwd, write_ntv2, ELLPS)
    grid, _, _ = _synth_grid()
    load_ntv2(write_ntv2(grid), name="synth_test")
    try:
        fwd, inv = resolve_crs(
            "+proj=tmerc +lat_0=0 +lon_0=-105 +k=0.9996 +x_0=500000 "
            "+ellps=GRS80 +nadgrids=synth_test")
        rng = np.random.default_rng(10)
        lon = rng.uniform(-105.8, -104.2, 100)
        lat = rng.uniform(40.2, 41.8, 100)
        x, y = fwd(lon, lat)
        g = SHIFT_GRIDS["synth_test"]
        lo_l, la_l, _ = g.apply_inverse(lon, lat)   # WGS84 -> local datum
        xm, ym = tmerc_fwd(lo_l, la_l, -105.0, 0.0, 0.9996, 500000.0, 0.0,
                           ELLPS["GRS80"])
        np.testing.assert_allclose(x, xm, rtol=0, atol=1e-9)
        np.testing.assert_allclose(y, ym, rtol=0, atol=1e-9)
        lo_b, la_b = inv(x, y)
        np.testing.assert_allclose(lo_b, lon, rtol=0, atol=1e-9)
        np.testing.assert_allclose(la_b, lat, rtol=0, atol=1e-9)
    finally:
        SHIFT_GRIDS.pop("synth_test", None)


def test_nadgrids_missing_grid_errors_and_optional_skips():
    from sedona_db_spark.geometry.proj import parse_proj4
    with pytest.raises(ValueError, match="not registered"):
        parse_proj4("+proj=longlat +nadgrids=missing_grid")
    # optional '@' grid absent -> silently skipped; 'null' -> identity
    c = parse_proj4("+proj=longlat +nadgrids=@missing_grid,null")
    assert c.nadgrids is None
