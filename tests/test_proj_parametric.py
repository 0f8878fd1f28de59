"""Parametric EPSG table + PROJ-string parser (round 5).

The reference resolves any CRS through PROJ (c/sedona-proj/src/
st_transform.rs:41); docs/reference/sql/st_transform.qmd documents both
accepted input forms — 'EPSG:nnnn' codes and raw PROJ strings.  These tests
pin: (a) every parametric row round-trips fwd∘inv to 1e-7 degrees, (b) the
docs' own EPSG:26910 example resolves, (c) PROJ strings compile to the same
numbers as their EPSG rows, (d) published city coordinates land within
survey tolerance for a spread of projection families/datums/units."""

import numpy as np
import pytest

import sedona_db_spark.geometry.proj as P
from sedona_db_spark.geometry.algos import transform_coords


def _sample_lonlat(c: P.CRSDef):
    if c.proj == "utm":
        lon0 = c.zone * 6 - 183
        lat0 = -30.0 if c.south else 40.0
    else:
        lon0 = c.lon0
        lat0 = c.lat0 if abs(c.lat0) > 1 else (c.sp1 or 45.0)
    lons = np.array([lon0 - 2.0, lon0, lon0 + 2.5])
    lats = np.clip(np.array([lat0 - 2.0, lat0, lat0 + 2.0]), -85.0, 85.0)
    return lons, lats


@pytest.mark.parametrize("code", sorted(P.EPSG_PARAMS))
def test_epsg_param_row_round_trips(code):
    c = P.CRSDef(**P.EPSG_PARAMS[code])
    fwd, inv = P.build_transform(c)
    lons, lats = _sample_lonlat(c)
    x, y = fwd(lons, lats)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    lo, la = inv(x, y)
    dlon = (lo - lons + 180.0) % 360.0 - 180.0   # GK zones 31/32 wrap >180E
    assert np.abs(dlon).max() < 1e-7
    assert np.abs(la - lats).max() < 1e-7


def test_docs_example_26910_resolves():
    # docs/reference/sql/st_transform.qmd: ST_Transform(POINT(-122.35
    # 47.65) @4326, 'EPSG:26910') — NAD83 / UTM zone 10N
    out = transform_coords(np.array([[-122.35, 47.65]]), "EPSG:4326",
                           "EPSG:26910")
    # NAD83≈WGS84 null shift; zone-10 UTM of Seattle
    assert out[0, 0] == pytest.approx(548814.03, abs=0.5)
    assert out[0, 1] == pytest.approx(5277605.01, abs=0.5)


def test_proj4_string_equals_epsg_row():
    a = transform_coords(np.array([[-122.35, 47.65]]), "EPSG:4326",
                         "EPSG:26910")
    b = transform_coords(np.array([[-122.35, 47.65]]), "EPSG:4326",
                         "+proj=utm +zone=10 +datum=NAD83 +units=m +no_defs")
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


def test_proj4_lcc_ftus_equals_epsg_2229():
    p4 = ("+proj=lcc +lat_1=34.03333333333333 +lat_2=35.46666666666667 "
          "+lat_0=33.5 +lon_0=-118 +x_0=2000000.0001016 +y_0=500000.0001016"
          " +datum=NAD83 +units=us-ft +no_defs")
    pt = np.array([[-118.2437, 34.0522]])
    a = transform_coords(pt, "4326", "EPSG:2229")
    b = transform_coords(pt, "4326", p4)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-3)  # x_0 rounding, ft


@pytest.mark.parametrize("code,lonlat,expected,tol", [
    # LA City Hall — SPCS83 CA zone 5, US survey feet
    ("EPSG:2229", (-118.2437, 34.0522), (6487847.0, 1841468.3), 15.0),
    # Empire State Building — SPCS83 NY Long Island, ftUS
    ("EPSG:2263", (-73.9857, 40.7484), (988212.2, 211939.3), 15.0),
    # Paris — NTF Lambert II étendu (1SP + Clarke 1880 IGN + NTF shift)
    ("EPSG:27572", (2.3522, 48.8566), (601152.3, 2428695.9), 30.0),
    # Tokyo Station — JGD2011 Plane Rectangular CS IX (easting, northing)
    ("EPSG:6677", (139.7671, 35.6812), (-5995.2, -35367.2), 5.0),
    # Moscow — Pulkovo 1942 Gauss-Krüger zone 7 (Krassowsky + Helmert)
    ("EPSG:28407", (37.6176, 55.7558), (7413326.9, 6182349.1), 60.0),
    # Dublin O'Connell St — TM65 Irish Grid (Airy Modified + Helmert)
    ("EPSG:29903", (-6.2603, 53.3498), (315900.6, 234671.4), 30.0),
])
def test_city_pins(code, lonlat, expected, tol):
    out = transform_coords(np.array([lonlat], float), "4326", code)
    assert out[0, 0] == pytest.approx(expected[0], abs=tol)
    assert out[0, 1] == pytest.approx(expected[1], abs=tol)


def test_ftus_units_consistency():
    # ftUS row × US_FOOT == identical definition with to_meter=1
    row = dict(P.EPSG_PARAMS["2229"])
    fwd_ft, inv_ft = P.build_transform(P.CRSDef(**row))
    row["to_meter"] = 1.0
    fwd_m, _ = P.build_transform(P.CRSDef(**row))
    lons = np.array([-119.0, -118.0, -117.2])
    lats = np.array([33.8, 34.5, 35.1])
    xf, yf = fwd_ft(lons, lats)
    xm, ym = fwd_m(lons, lats)
    np.testing.assert_allclose(xf * P.US_FOOT, xm, rtol=0, atol=1e-6)
    np.testing.assert_allclose(yf * P.US_FOOT, ym, rtol=0, atol=1e-6)
    lo, la = inv_ft(xf, yf)
    np.testing.assert_allclose(lo, lons, atol=1e-9)
    np.testing.assert_allclose(la, lats, atol=1e-9)


def test_parametric_utm_matches_pattern_utm():
    # EPSG_PARAMS["32633"] must be numerically identical to the legacy
    # zone-pattern path (same kernel, same constants)
    fwd_t, _ = P.build_transform(P.CRSDef(**P.EPSG_PARAMS["32633"]))
    fwd_p, _ = P.projection_for("32633")
    lons = np.array([13.0, 15.0, 16.5]); lats = np.array([40.0, 48.0, 55.0])
    np.testing.assert_allclose(fwd_t(lons, lats), fwd_p(lons, lats),
                               rtol=0, atol=0)


def test_webmerc_proj4_equals_3857_hub():
    pt = np.array([[12.4924, 41.8902]])
    a = transform_coords(pt, "4326", "EPSG:3857")
    b = transform_coords(pt, "4326",
                         "+proj=webmerc +datum=WGS84 +no_defs")
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_longlat_towgs84_matches_named_ed50():
    # +proj=utm on intl ellipsoid + ED50 mean shift == named 23031
    pt = np.array([[2.1686, 41.3874]])   # Barcelona
    a = transform_coords(pt, "4326", "EPSG:23031")
    b = transform_coords(
        pt, "4326",
        "+proj=utm +zone=31 +ellps=intl +towgs84=-87,-98,-121 +units=m")
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_merc_lat_ts_scale():
    f, i = P.build_transform(P.parse_proj4("+proj=merc +lat_ts=30"))
    x, _ = f(np.array([10.0]), np.array([0.0]))
    scale = P._merc_scale(P.WGS84, 30.0)
    assert x[0] == pytest.approx(scale * P.WGS84.a * np.radians(10.0),
                                 rel=1e-12)
    lo, la = i(*f(np.array([12.3]), np.array([-44.5])))
    assert lo[0] == pytest.approx(12.3, abs=1e-9)
    assert la[0] == pytest.approx(-44.5, abs=1e-9)


def test_polar_stereo_k0_variant_matches_ups():
    # +proj=stere +lat_0=90 +k_0=0.994 +x_0/y_0=2e6 == EPSG:32661 (UPS N)
    f, _ = P.build_transform(P.parse_proj4(
        "+proj=stere +lat_0=90 +k_0=0.994 +lon_0=0 +x_0=2000000 "
        "+y_0=2000000 +datum=WGS84"))
    g, _ = P.projection_for("32661")
    lons = np.array([-30.0, 0.0, 45.0]); lats = np.array([80.0, 85.0, 88.0])
    np.testing.assert_allclose(f(lons, lats), g(lons, lats),
                               rtol=0, atol=1e-6)


def test_albers_southern_cone_inverse():
    # regression: Snyder sign reversal for n < 0 (Australian Albers 3577)
    fwd, inv = P.projection_for("3577")
    lons = np.array([115.0, 133.0, 151.0])
    lats = np.array([-34.0, -20.0, -28.5])
    lo, la = inv(*fwd(lons, lats))
    np.testing.assert_allclose(lo, lons, atol=1e-8)
    np.testing.assert_allclose(la, lats, atol=1e-8)


def test_parse_errors():
    with pytest.raises(ValueError):
        P.parse_proj4("+lat_0=50")                       # no +proj
    with pytest.raises(ValueError):
        P.parse_proj4("+proj=tpeqd +lat_1=10")           # family unsupported
    with pytest.raises(ValueError):
        P.parse_proj4("+proj=utm +zone=10 +frobnicate=1")
    with pytest.raises(ValueError):
        # oblique stereographic is rejected at build time
        P.build_transform(P.parse_proj4("+proj=stere +lat_0=52 +lon_0=5"))
    with pytest.raises(ValueError):
        P.build_transform(P.parse_proj4("+proj=utm"))    # zone missing
    with pytest.raises(ValueError):
        P.parse_proj4("+proj=utm +zone=10 +units=parsec")
    assert P.resolve_crs("EPSG:999999") is None


def test_named_entries_still_take_precedence():
    # hand-verified rows (oracle-pinned) must keep their exact numeric path
    assert P.projection_for("27700") is P._NAMED["27700"]
    assert P.projection_for("2154") is P._NAMED["2154"]


def test_swiss_somerc():
    """CH1903 / LV03 (EPSG:21781) and CH1903+ / LV95 (EPSG:2056) via the
    swisstopo rigorous double projection (EPSG method 9815, azimuth 90°).
    The fundamental point (old Bern observatory) maps to exactly
    (600000, 200000) on the CH1903 datum by definition."""
    fwd, inv = P.build_transform(P.CRSDef(**dict(
        P.EPSG_PARAMS["21781"], towgs84=None)))   # datum-free: exact pin
    lon0 = 7.0 + 26.0 / 60 + 22.5 / 3600
    lat0 = 46.0 + 57.0 / 60 + 8.66 / 3600
    x, y = fwd(np.array([lon0]), np.array([lat0]))
    assert x[0] == pytest.approx(600000.0, abs=1e-4)
    assert y[0] == pytest.approx(200000.0, abs=1e-4)
    # full WGS84 → LV03 chain: Zurich lands in the known city window
    out = transform_coords(np.array([[8.5417, 47.3769]]), "4326",
                           "EPSG:21781")
    assert out[0, 0] == pytest.approx(683210.0, abs=500.0)
    assert out[0, 1] == pytest.approx(247800.0, abs=500.0)
    # LV95 = LV03 + (2'000'000, 1'000'000) modulo the CH1903→CH1903+
    # Helmert refinement (sub-metre)
    out95 = transform_coords(np.array([[8.5417, 47.3769]]), "4326",
                             "EPSG:2056")
    assert out95[0, 0] - out[0, 0] == pytest.approx(2_000_000.0, abs=2.0)
    assert out95[0, 1] - out[0, 1] == pytest.approx(1_000_000.0, abs=2.0)
    # round trip through the datum chain
    back = transform_coords(out, "EPSG:21781", "4326")
    assert back[0, 0] == pytest.approx(8.5417, abs=1e-7)
    assert back[0, 1] == pytest.approx(47.3769, abs=1e-7)
    # proj4-string form compiles to the same numbers
    p4 = ("+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
          "+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel "
          "+towgs84=674.4,15.1,405.3 +units=m +no_defs")
    alt = transform_coords(np.array([[8.5417, 47.3769]]), "4326", p4)
    np.testing.assert_allclose(alt, out, rtol=0, atol=1e-6)


def test_omerc_matches_somerc_at_azimuth_90():
    """Hotine oblique Mercator (omerc, Snyder 9-1..9-39 closed forms)
    cross-validated against the INDEPENDENT somerc double projection:
    azimuth-90 omerc at the Swiss centre must reproduce somerc to
    sub-micrometre (two derivations, one surface)."""
    lon0 = 7.0 + 26.0 / 60 + 22.5 / 3600
    lat0 = 46.0 + 57.0 / 60 + 8.66 / 3600
    f_s, _ = P.build_transform(P.CRSDef(
        proj="somerc", lon0=lon0, lat0=lat0, k0=1.0, fe=600_000.0,
        fn=200_000.0, ellps="bessel"))
    f_o, i_o = P.build_transform(P.parse_proj4(
        f"+proj=omerc +lat_0={lat0} +lonc={lon0} +alpha=90 +gamma=90 "
        f"+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel"))
    lons = np.array([6.5, 7.44, 8.5, 9.8])
    lats = np.array([45.9, 46.95, 47.4, 46.2])
    np.testing.assert_allclose(f_o(lons, lats), f_s(lons, lats),
                               rtol=0, atol=1e-6)
    lo, la = i_o(*f_o(lons, lats))
    np.testing.assert_allclose(lo, lons, atol=1e-12)
    np.testing.assert_allclose(la, lats, atol=1e-12)


def test_omerc_oblique_centre_and_roundtrip():
    # Borneo RSO-style parameters: centre maps to (FE, FN), oblique
    # azimuth round-trips at machine precision, both hemispheres
    f, i = P.build_transform(P.parse_proj4(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.315 +gamma=53.13 "
        "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=intl"))
    x, y = f(np.array([115.0]), np.array([4.0]))
    assert x[0] == pytest.approx(590476.87, abs=1e-6)
    assert y[0] == pytest.approx(442857.65, abs=1e-6)
    lons = np.linspace(113, 118, 7)
    lats = np.linspace(1, 7, 7)
    lo, la = i(*f(lons, lats))
    np.testing.assert_allclose(lo, lons, atol=1e-12)
    np.testing.assert_allclose(la, lats, atol=1e-12)
    fs, si = P.build_transform(P.parse_proj4(
        "+proj=omerc +lat_0=-20 +lonc=30 +alpha=45 +k_0=1 +ellps=WGS84"))
    lo, la = si(*fs(np.array([30.0, 31.0]), np.array([-20.0, -21.5])))
    np.testing.assert_allclose(lo, [30.0, 31.0], atol=1e-12)
    np.testing.assert_allclose(la, [-20.0, -21.5], atol=1e-12)


def test_omerc_requires_alpha():
    with pytest.raises(ValueError):
        P.build_transform(P.parse_proj4("+proj=omerc +lat_0=4 +lonc=115"))


def test_south_polar_stereo_proj4_matches_ups_south():
    """Review regression: the south-aspect '+proj=stere' easting was
    mirrored about the false easting (theta must be lon−lon0 in BOTH
    aspects; only the northing term flips)."""
    f, i = P.build_transform(P.parse_proj4(
        "+proj=stere +lat_0=-90 +k_0=0.994 +lon_0=0 +x_0=2000000 "
        "+y_0=2000000 +datum=WGS84"))
    g, _ = P.projection_for("32761")
    lons = np.array([120.0, -45.0, 0.0, 179.0])
    lats = np.array([-75.0, -80.0, -88.0, -70.0])
    np.testing.assert_allclose(f(lons, lats), g(lons, lats),
                               rtol=0, atol=1e-6)
    lo, la = i(*f(lons, lats))
    np.testing.assert_allclose(lo, lons, atol=1e-9)
    np.testing.assert_allclose(la, lats, atol=1e-9)


def test_lcc_single_parallel_respects_lat_0():
    """Review regression: lcc with lat_1 == lat_2 (or only lat_1) must
    keep the northing origin at lat_0, not at the parallel."""
    f_a, i_a = P.build_transform(P.parse_proj4(
        "+proj=lcc +lat_1=49 +lat_0=0 +lon_0=-93 +datum=WGS84"))
    f_b, _ = P.build_transform(P.parse_proj4(
        "+proj=lcc +lat_1=49 +lat_0=49 +lon_0=-93 +datum=WGS84"))
    xa, ya = f_a(np.array([-90.0]), np.array([47.0]))
    xb, yb = f_b(np.array([-90.0]), np.array([47.0]))
    assert abs(xa[0] - xb[0]) < 1e-6          # easting unaffected
    assert abs(ya[0] - yb[0]) > 1_000_000.0   # origin moved ~49 degrees
    # lat_0 form must agree with the 2SP kernel at sp1=sp2 (same rho0-at-
    # lat_0 semantics, independent derivation)
    x2, y2 = P.lcc_fwd(np.array([-90.0]), np.array([47.0]), -93.0, 0.0,
                       49.0, 49.0, 0.0, 0.0, P.WGS84)
    assert xa[0] == pytest.approx(x2[0], abs=1e-6)
    assert ya[0] == pytest.approx(y2[0], abs=1e-6)
    lo, la = i_a(xa, ya)
    assert lo[0] == pytest.approx(-90.0, abs=1e-9)
    assert la[0] == pytest.approx(47.0, abs=1e-9)


def test_ups_proj4_honours_overrides():
    """Review regression: '+proj=ups' silently dropped +x_0/+y_0/+k_0."""
    f_default, _ = P.build_transform(P.parse_proj4("+proj=ups +datum=WGS84"))
    g, _ = P.projection_for("32661")
    lons = np.array([-30.0, 45.0]); lats = np.array([80.0, 87.0])
    np.testing.assert_allclose(f_default(lons, lats), g(lons, lats),
                               rtol=0, atol=1e-6)
    f_zero, _ = P.build_transform(P.parse_proj4(
        "+proj=ups +x_0=0 +y_0=0 +datum=WGS84"))
    x0, y0 = f_zero(lons, lats)
    xd, yd = f_default(lons, lats)
    np.testing.assert_allclose(x0 + 2_000_000.0, xd, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y0 + 2_000_000.0, yd, rtol=0, atol=1e-6)


def test_krovak_epsg_worked_example():
    """EPSG Guidance Note 7-2 method 9819 worked example, reproduced to
    the centimetre on the S-JTSK datum (datum-free kernel check):
    50°12'32.442"N 16°50'59.179"E → southing 1050538.63, westing
    568991.00; EPSG:5514 'Krovak East North' emits the negated pair."""
    fwd, inv = P.build_transform(P.CRSDef(**dict(
        P.EPSG_PARAMS["5514"], towgs84=None)))
    lat = 50 + 12 / 60 + 32.442 / 3600
    lon = 16 + 50 / 60 + 59.179 / 3600
    x, y = fwd(np.array([lon]), np.array([lat]))
    assert x[0] == pytest.approx(-568991.00, abs=0.02)
    assert y[0] == pytest.approx(-1050538.63, abs=0.02)
    lo, la = inv(x, y)
    assert lo[0] == pytest.approx(lon, abs=1e-9)
    assert la[0] == pytest.approx(lat, abs=1e-9)


def test_krovak_prague_via_wgs84_chain():
    # Prague centre through the Helmert chain lands in the known S-JTSK
    # window (published Czech coords ≈ (-743000, -1043000) ± the 3-param
    # mean-shift accuracy)
    out = transform_coords(np.array([[14.42, 50.087]]), "4326",
                           "EPSG:5514")
    assert out[0, 0] == pytest.approx(-742900.0, abs=400.0)
    assert out[0, 1] == pytest.approx(-1043100.0, abs=400.0)
    back = transform_coords(out, "EPSG:5514", "4326")
    assert back[0, 0] == pytest.approx(14.42, abs=1e-7)
    assert back[0, 1] == pytest.approx(50.087, abs=1e-7)


def test_krovak_proj4_string():
    p4 = ("+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
          "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel "
          "+towgs84=589,76,480 +units=m +no_defs")
    a = transform_coords(np.array([[14.42, 50.087]]), "4326", p4)
    b = transform_coords(np.array([[14.42, 50.087]]), "4326", "EPSG:5514")
    # the proj4 literal lon_0 differs from 42.5-17.666... in the last
    # double bit; mm-level agreement is the right assertion
    np.testing.assert_allclose(a, b, rtol=0, atol=0.01)


def test_custom_ellipsoid_a_b_rf():
    # +a with +b (sphere): the canonical legacy web-mercator PROJ string
    # must resolve and match the 3857 spherical formulas exactly
    pt = np.array([[-122.4194, 37.7749]])
    a = transform_coords(
        pt, "4326",
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 "
        "+y_0=0 +k=1 +units=m +nadgrids=@null +no_defs")
    b = transform_coords(pt, "4326", "EPSG:3857")
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    # +a with +rf == WGS84 → identical to the zone-family UTM path
    c = transform_coords(
        pt, "4326", "+proj=utm +zone=10 +a=6378137 +rf=298.257223563")
    d = transform_coords(pt, "4326", "EPSG:32610")
    np.testing.assert_allclose(c, d, rtol=0, atol=1e-6)
    # +a/+b non-sphere (airy) == +ellps=airy
    ln = np.array([[-0.1278, 51.5074]])
    e = transform_coords(
        ln, "4326",
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
        "+y_0=-100000 +a=6377563.396 +b=6356256.909 +units=m")
    g = transform_coords(
        ln, "4326",
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
        "+y_0=-100000 +ellps=airy +units=m")
    np.testing.assert_allclose(e, g, rtol=0, atol=1e-4)
    with pytest.raises(ValueError):
        P.parse_proj4("+proj=utm +zone=10 +rf=298.25")   # +rf without +a


import math

# ---------------------------------------------------------------------------
# round 7: eqdc / cass / mill / moll / eck4 / robin (Snyder closed forms)
# ---------------------------------------------------------------------------

def test_eqdc_defining_properties():
    """Equidistant Conic: true scale along EVERY meridian (projected
    radial distance == meridional arc difference) and on both standard
    parallels (projected parallel arc == a·m(sp)·dlam)."""
    from sedona_db_spark.geometry.proj import (WGS84, _lcc_m, _merid_arc,
                                               eqdc_fwd, eqdc_inv)
    lon0, lat0, sp1, sp2 = -96.0, 40.0, 20.0, 60.0
    lats = np.array([25.0, 40.0, 55.0, 70.0])
    lons = np.full_like(lats, -80.0)
    x, y = eqdc_fwd(lons, lats, lon0, lat0, sp1, sp2, 0.0, 0.0, WGS84)
    # meridian distances: |rho(a)-rho(b)| == |M(a)-M(b)|
    rho = np.hypot(x - 0.0, y - 0.0)   # not radial from origin — use pairs
    for i in range(len(lats) - 1):
        d_proj = np.hypot(x[i + 1] - x[i], y[i + 1] - y[i])
        # same meridian: chord along projected arc is not the distance;
        # instead compare rho differences via the inverse constants
        pass
    from sedona_db_spark.geometry.proj import _eqdc_consts
    n, G, rho0 = _eqdc_consts(WGS84, lat0, sp1, sp2)
    M = _merid_arc(WGS84, np.radians(lats))
    rho_t = WGS84.a * G - M
    got_rho = np.hypot(x, rho0 - y)
    assert np.allclose(got_rho, rho_t, rtol=0, atol=1e-6)
    # true scale on both standard parallels
    dlam = 2.0
    for sp in (sp1, sp2):
        x1, y1 = eqdc_fwd(np.array([-96.0]), np.array([sp]),
                          lon0, lat0, sp1, sp2, 0.0, 0.0, WGS84)
        x2, y2 = eqdc_fwd(np.array([-96.0 + dlam]), np.array([sp]),
                          lon0, lat0, sp1, sp2, 0.0, 0.0, WGS84)
        rho_sp = float(np.hypot(x1, rho0 - y1))
        arc = rho_sp * abs(n) * math.radians(dlam)
        truth = WGS84.a * _lcc_m(WGS84, math.radians(sp)) \
            * math.radians(dlam)
        assert arc == pytest.approx(truth, rel=1e-12)
    # round trip
    rng = np.random.default_rng(3)
    lo = rng.uniform(-130, -60, 200)
    la = rng.uniform(15, 75, 200)
    x, y = eqdc_fwd(lo, la, lon0, lat0, sp1, sp2, 0.0, 0.0, WGS84)
    lo2, la2 = eqdc_inv(x, y, lon0, lat0, sp1, sp2, 0.0, 0.0, WGS84)
    assert np.allclose(lo2, lo, atol=1e-9)
    assert np.allclose(la2, la, atol=1e-9)


def test_cass_central_meridian_is_meridional_arc():
    from sedona_db_spark.geometry.proj import (WGS84, _merid_arc,
                                               cass_fwd, cass_inv)
    lon0, lat0 = 10.0, 30.0
    lats = np.array([-10.0, 0.0, 30.0, 52.5, 80.0])
    x, y = cass_fwd(np.full_like(lats, lon0), lats, lon0, lat0,
                    0.0, 0.0, WGS84)
    assert np.allclose(x, 0.0, atol=1e-9)
    want = _merid_arc(WGS84, np.radians(lats)) \
        - float(_merid_arc(WGS84, np.array(math.radians(lat0))))
    assert np.allclose(y, want, rtol=0, atol=1e-9)
    rng = np.random.default_rng(4)
    lo = rng.uniform(7.5, 12.5, 300)           # Cassini is a <4° band proj
    la = rng.uniform(-60, 75, 300)
    x, y = cass_fwd(lo, la, lon0, lat0, 0.0, 0.0, WGS84)
    lo2, la2 = cass_inv(x, y, lon0, lat0, 0.0, 0.0, WGS84)
    assert np.allclose(lo2, lo, atol=2e-7)     # series truncation ~cm
    assert np.allclose(la2, la, atol=2e-7)


def test_mill_closed_form_and_roundtrip():
    from sedona_db_spark.geometry.proj import WGS84, mill_fwd, mill_inv
    x, y = mill_fwd(np.array([30.0]), np.array([45.0]), 0.0, 0.0, 0.0,
                    WGS84)
    assert float(x) == pytest.approx(WGS84.a * math.radians(30.0),
                                     rel=1e-15)
    want_y = WGS84.a * math.log(math.tan(math.pi / 4
                                         + 0.4 * math.radians(45.0))) / 0.8
    assert float(y) == pytest.approx(want_y, rel=1e-15)
    rng = np.random.default_rng(5)
    lo = rng.uniform(-179, 179, 300)
    la = rng.uniform(-89, 89, 300)
    x, y = mill_fwd(lo, la, 0.0, 0.0, 0.0, WGS84)
    lo2, la2 = mill_inv(x, y, 0.0, 0.0, 0.0, WGS84)
    assert np.allclose(lo2, lo, atol=1e-9)
    assert np.allclose(la2, la, atol=1e-9)


@pytest.mark.parametrize("name", ["moll", "eck4"])
def test_pseudocylindrical_equal_area(name):
    """Mollweide / Eckert IV are equal-area: the numeric Jacobian
    (dx/dλ · dy/dφ − dx/dφ · dy/dλ) must equal R² cos φ everywhere, and
    the pole/equator pins must hold."""
    from sedona_db_spark.geometry import proj as P
    fwd = getattr(P, f"{name}_fwd")
    inv = getattr(P, f"{name}_inv")
    R = P.WGS84.a
    rng = np.random.default_rng(6)
    lo = rng.uniform(-170, 170, 200)
    la = rng.uniform(-85, 85, 200)
    h = 1e-5
    x0, y0 = fwd(lo, la, 0.0, 0.0, 0.0, P.WGS84)
    xl, yl = fwd(lo + h, la, 0.0, 0.0, 0.0, P.WGS84)
    xp, yp = fwd(lo, la + h, 0.0, 0.0, 0.0, P.WGS84)
    hr = math.radians(h)
    J = ((xl - x0) / hr * (yp - y0) / hr
         - (xp - x0) / hr * (yl - y0) / hr)
    want = R * R * np.cos(np.radians(la))
    assert np.allclose(J, want, rtol=5e-4)
    # pole y pins
    _, ypole = fwd(np.array([0.0]), np.array([90.0]), 0.0, 0.0, 0.0,
                   P.WGS84)
    want_pole = (math.sqrt(2) * R if name == "moll"
                 else 2 * math.sqrt(math.pi / (4 + math.pi)) * R)
    assert float(ypole) == pytest.approx(want_pole, rel=1e-12)
    # round trip
    x, y = fwd(lo, la, 0.0, 0.0, 0.0, P.WGS84)
    lo2, la2 = inv(x, y, 0.0, 0.0, 0.0, P.WGS84)
    assert np.allclose(lo2, lo, atol=1e-7)
    assert np.allclose(la2, la, atol=1e-7)


def test_robin_knot_exact_and_roundtrip():
    """Robinson must reproduce Robinson's published table EXACTLY at the
    5° knots (any valid interpolant passes through them)."""
    from sedona_db_spark.geometry import proj as P
    R = P.WGS84.a
    lats = P._ROBIN_LAT
    x, y = P.robin_fwd(np.full_like(lats, 20.0), lats, 0.0, 0.0, 0.0,
                       P.WGS84)
    assert np.allclose(x, 0.8487 * R * P._ROBIN_X * math.radians(20.0),
                       rtol=1e-14)
    assert np.allclose(y, 1.3523 * R * P._ROBIN_Y, rtol=1e-14)
    rng = np.random.default_rng(7)
    lo = rng.uniform(-179, 179, 200)
    la = rng.uniform(-89.5, 89.5, 200)
    x, y = P.robin_fwd(lo, la, 0.0, 0.0, 0.0, P.WGS84)
    lo2, la2 = P.robin_inv(x, y, 0.0, 0.0, 0.0, P.WGS84)
    assert np.allclose(la2, la, atol=5e-6)
    assert np.allclose(lo2, lo, atol=5e-6)


def test_world_codes_resolve_and_roundtrip():
    """ESRI world codes (54003/54009/54012/54030, 102010) resolve with
    and without the ESRI:/EPSG: prefix and round-trip."""
    from sedona_db_spark.geometry.proj import resolve_crs
    for code in ("54003", "ESRI:54009", "EPSG:54012", "54030", "102010"):
        pr = resolve_crs(code)
        assert pr is not None, code
        fwd, inv = pr
        if code == "102010":           # conic centred on North America
            lo = np.array([-120.0, -96.0, -70.0])
            la = np.array([25.0, 48.0, 60.0])
        else:
            lo = np.array([-96.0, 12.0, 150.0])
            la = np.array([-40.0, 48.0, 5.0])
        x, y = fwd(lo, la)
        lo2, la2 = inv(x, y)
        assert np.allclose(lo2, lo, atol=1e-5), code
        assert np.allclose(la2, la, atol=1e-5), code


def test_proj_string_new_families():
    """+proj= strings for the six round-7 families parse and round-trip
    through the public resolve_crs surface."""
    from sedona_db_spark.geometry.proj import resolve_crs
    cases = [
        "+proj=eqdc +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=-96 "
        "+ellps=GRS80 +x_0=100000 +y_0=50000",
        "+proj=cass +lat_0=30 +lon_0=10 +x_0=1000 +y_0=2000",
        "+proj=mill +lon_0=20",
        "+proj=moll +lon_0=-90",
        "+proj=eck4 +lon_0=15",
        "+proj=robin +lon_0=10",
    ]
    for s in cases:
        fwd, inv = resolve_crs(s)
        if "cass" in s or "eqdc" in s:
            # band / conic projections: stay near their centres
            lo = np.array([-95.0, -96.5, -97.0]) if "eqdc" in s \
                else np.array([9.0, 11.0, 12.5])
            la = np.array([25.0, 52.0, 49.5])
        else:
            lo = np.array([-95.0, 11.0, 12.5])
            la = np.array([25.0, 52.0, 49.5])
        x, y = fwd(lo, la)
        lo2, la2 = inv(x, y)
        assert np.allclose(lo2, lo, atol=1e-4), s
        assert np.allclose(la2, la, atol=1e-4), s
