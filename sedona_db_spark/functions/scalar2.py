"""Second batch of ST_ scalar functions (pandas UDFs over the algos layer).

Covers the remaining reference surface from SURVEY.md §2.3: constructors
(ST_MakeLine, ST_PointZ), formatters (ST_AsGeoJSON, ST_AsEWKB), accessors
(ST_Dump, ST_Points, ST_ExteriorRing, ST_InteriorRingN, ST_NumInteriorRings,
ST_HasZ/HasM/ZMFlag, ST_Z, ST_Boundary), validity (ST_IsValid,
ST_IsValidReason, ST_IsSimple, ST_IsRing), processing (ST_Simplify,
ST_SnapToGrid, ST_Intersection, ST_Collect), linear referencing
(ST_LineInterpolatePoint, ST_LineLocatePoint, ST_ClosestPoint,
ST_ShortestLine), ST_Azimuth, ST_MaxDistance, CRS (ST_Transform,
ST_SetSRID, ST_SRID), geography-lite (ST_DistanceSphere), affine
(ST_Rotate, ST_Affine).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, DoubleType, IntegerType, StringType,
)

from sedona_db_spark.geometry import algos as A
from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.functions.scalar import _decode_series, _map_coords, _all_points


# --- constructors -----------------------------------------------------------

@pandas_udf(BinaryType())
def st_makeline(b1: pd.Series, b2: pd.Series) -> pd.Series:
    out = []
    for g1, g2 in zip(_decode_series(b1), _decode_series(b2)):
        if g1 is None or g2 is None:
            out.append(None)
            continue
        pts = []
        for g in (g1, g2):
            if g[0] == "Point":
                pts.append(np.asarray(g[1][:2]).reshape(1, 2))
            elif g[0] in ("LineString", "MultiPoint"):
                pts.append(np.asarray(g[1])[:, :2])
            else:
                pts.append(K._all_coords(g)[:, :2])
        out.append(W.encode(("LineString", np.vstack(pts))))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_pointz(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
    out = []
    for xi, yi, zi in zip(x, y, z):
        if xi is None or yi is None or zi is None:
            out.append(None)
        else:
            out.append(W.encode(("Point", np.array([xi, yi, zi]))))
    return pd.Series(out)


# --- formatters --------------------------------------------------------------

def _geojson_of(g):
    name, p = g
    if name == "Point":
        if np.any(np.isnan(np.asarray(p[:2], dtype=np.float64))):
            return {"type": "Point", "coordinates": []}  # POINT EMPTY
        return {"type": "Point", "coordinates": [float(v) for v in p]}
    if name == "LineString":
        return {"type": "LineString", "coordinates": np.asarray(p).tolist()}
    if name == "Polygon":
        return {"type": "Polygon", "coordinates": [np.asarray(r).tolist() for r in p]}
    if name == "MultiPoint":
        return {"type": "MultiPoint", "coordinates": np.asarray(p).tolist()}
    if name == "MultiLineString":
        return {"type": "MultiLineString",
                "coordinates": [np.asarray(l).tolist() for l in p]}
    if name == "MultiPolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[np.asarray(r).tolist() for r in rings] for rings in p]}
    if name == "GeometryCollection":
        return {"type": "GeometryCollection",
                "geometries": [_geojson_of(q) for q in p]}
    raise ValueError(name)


@pandas_udf(StringType())
def st_asgeojson(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else json.dumps(_geojson_of(g), separators=(",", ":"))
                      for g in _decode_series(b)])


def _st_asewkb_impl(*cols):
    """ST_AsEWKB(geom[, srid]) — PostGIS/GEOS extended-flavor WKB (Z/M as
    high-bit flags, SRID embedded top-level only when nonzero; reference
    functions/test_wkb.py verifies these bytes against shapely+PostGIS).
    The 1-arg form uses the geometry's embedded SRID (ST_SetSRID)."""
    b = cols[0]
    srid = cols[1] if len(cols) > 1 else None
    out = []
    svals = srid if srid is not None else [None] * len(b)
    for v, s in zip(b, svals):
        if v is None:
            out.append(None)
            continue
        out.append(W.to_ewkb(bytes(v), None if s is None or pd.isna(s)
                             else int(s)))
    return pd.Series(out)


st_asewkb = pandas_udf(_st_asewkb_impl, BinaryType())


@pandas_udf(IntegerType())
def st_srid(b: pd.Series) -> pd.Series:
    def srid_of(v):
        if v is None:
            return None
        raw = bytes(v)
        (code,) = struct.unpack_from("<I" if raw[0] == 1 else ">I", raw, 1)
        if code & 0x20000000:
            (s,) = struct.unpack_from("<I" if raw[0] == 1 else ">I", raw, 5)
            return int(s)
        return 0
    return pd.Series([srid_of(v) for v in b], dtype="Int32")


# --- accessors ---------------------------------------------------------------

@pandas_udf(ArrayType(BinaryType()))
def st_dump(b: pd.Series) -> pd.Series:
    """Explode collections into parts (pair with F.explode, mirroring the
    reference's ST_Dump list-of-struct, st_dump.rs:39-238)."""
    def parts(g):
        if g is None:
            return []
        name, p = g
        if name == "MultiPolygon":
            return [W.encode(("Polygon", rings)) for rings in p]
        if name == "MultiLineString":
            return [W.encode(("LineString", l)) for l in p]
        if name == "MultiPoint":
            return [W.encode(("Point", row)) for row in p]
        if name == "GeometryCollection":
            return [enc for q in p for enc in parts(q)]
        return [W.encode(g)]
    return pd.Series([parts(g) for g in _decode_series(b)])


@pandas_udf(BinaryType())
def st_points(b: pd.Series) -> pd.Series:
    def pts(g):
        if g is None:
            return None
        c = K._all_coords(g)
        return W.encode(("MultiPoint", c if c is not None else np.empty((0, 2))))
    return pd.Series([pts(g) for g in _decode_series(b)])


@pandas_udf(BinaryType())
def st_exteriorring(b: pd.Series) -> pd.Series:
    return pd.Series([
        W.encode(("LineString", g[1][0])) if g is not None and g[0] == "Polygon" and g[1]
        else None for g in _decode_series(b)])


@pandas_udf(BinaryType())
def st_interiorringn(b: pd.Series, n: pd.Series) -> pd.Series:
    out = []
    for v, g, i in zip(b, _decode_series(b), n):
        if g is None or i is None or g[0] != "Polygon" or int(i) < 1 \
                or int(i) > len(g[1]) - 1:
            out.append(None)
        else:
            # M flag travels with the ring (reference: InteriorRingN of a
            # POLYGON M is a LINESTRING M)
            out.append(W.encode(("LineString", g[1][int(i)]),
                                m_flag=W._read_header(bytes(v), 0)[3]))
    return pd.Series(out)


@pandas_udf(IntegerType())
def st_numinteriorrings(b: pd.Series) -> pd.Series:
    # NULL for every non-Polygon input (incl. MultiPolygon and collections
    # — PostGIS/reference semantics); POLYGON EMPTY counts 0
    return pd.Series([max(0, len(g[1]) - 1)
                      if g is not None and g[0] == "Polygon" else None
                      for g in _decode_series(b)], dtype="Int32")


@pandas_udf(BooleanType())
def st_hasz(b: pd.Series) -> pd.Series:
    # header-aware: an M-only 3-D geometry has NO Z
    return pd.Series([None if v is None else W._read_header(bytes(v), 0)[2]
                      for v in b])


@pandas_udf(DoubleType())
def st_z(b: pd.Series) -> pd.Series:
    out = []
    for v, g in zip(b, _decode_series(b)):
        if g is None or g[0] != "Point" or len(g[1]) < 3:
            out.append(None)
            continue
        has_z = W._read_header(bytes(v), 0)[2]
        z = float(g[1][2]) if has_z else None  # M-only: no Z
        out.append(None if z is None or z != z else z)
    return pd.Series(pd.array(out, dtype="Float64"))


@pandas_udf(BinaryType())
def st_boundary(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else W.encode(A.boundary(g))
                      for g in _decode_series(b)])


# --- validity ----------------------------------------------------------------

@pandas_udf(BooleanType())
def st_isvalid(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else A.is_valid(g)
                      for g in _decode_series(b)])


@pandas_udf(StringType())
def st_isvalidreason(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else (A.invalid_reason(g) or "Valid Geometry")
                      for g in _decode_series(b)])


@pandas_udf(BooleanType())
def st_issimple(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else A.is_simple(g)
                      for g in _decode_series(b)])


@pandas_udf(BooleanType())
def st_isring(b: pd.Series) -> pd.Series:
    def ring(g):
        if g is None:
            return None
        if g[0] != "LineString" or len(g[1]) < 4:
            return False
        return bool(np.array_equal(g[1][0], g[1][-1])) and A.is_simple(g)
    return pd.Series([ring(g) for g in _decode_series(b)])


# --- processing ---------------------------------------------------------------

@pandas_udf(BinaryType())
def st_simplify(b: pd.Series, tol: pd.Series) -> pd.Series:
    return pd.Series([None if g is None or pd.isna(t)
                      else W.encode(A.simplify(g, float(t)))
                      for g, t in zip(_decode_series(b), tol)])


@pandas_udf(BinaryType())
def st_simplifypreservetopology(b: pd.Series, tol: pd.Series) -> pd.Series:
    """GEOS TopologyPreservingSimplifier semantics (algos.
    simplify_preserve_topology): DP sections with per-ring minimum size and
    chord-intersection rejection — rings never collapse, holes never cross
    shells.  Replays the reference's test module row-for-row."""
    return pd.Series([None if g is None or pd.isna(t)
                      else W.encode(A.simplify_preserve_topology(g, float(t)))
                      for g, t in zip(_decode_series(b), tol)])


@pandas_udf(BinaryType())
def st_snaptogrid(b: pd.Series, size: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else W.encode(A.snap_to_grid(g, float(s)))
                      for g, s in zip(_decode_series(b), size)])


@pandas_udf(BinaryType())
def st_intersection(b1: pd.Series, b2: pd.Series) -> pd.Series:
    from sedona_db_spark.geometry.overlay import mixed_boolean_op
    out = []
    for g1, g2 in zip(_decode_series(b1), _decode_series(b2)):
        if g1 is None or g2 is None:
            out.append(None)
        else:
            out.append(W.encode(mixed_boolean_op(g1, g2, "intersection")))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_collect(arr: pd.Series) -> pd.Series:
    """Finisher for ST_Collect_Agg: collect_list(geom) → multi-geometry
    (st_collect_agg.rs:46-49 semantics: uniform type → Multi*, else
    GeometryCollection)."""
    out = []
    for lst in arr:
        if lst is None or len(lst) == 0:
            out.append(None)
            continue
        geoms = [W.decode(bytes(v)) for v in lst if v is not None]
        geoms = [g for g in geoms if g is not None]
        names = {g[0] for g in geoms}
        if names == {"Point"}:
            out.append(W.encode(("MultiPoint",
                                 np.vstack([g[1][:2] for g in geoms]))))
        elif names == {"LineString"}:
            out.append(W.encode(("MultiLineString", [g[1] for g in geoms])))
        elif names == {"Polygon"}:
            out.append(W.encode(("MultiPolygon", [g[1] for g in geoms])))
        else:
            out.append(W.encode(("GeometryCollection", geoms)))
    return pd.Series(out)


# --- linear referencing -------------------------------------------------------

@pandas_udf(BinaryType())
def st_lineinterpolatepoint(b: pd.Series, frac: pd.Series) -> pd.Series:
    return pd.Series([
        W.encode(("Point", A.line_interpolate_point(g[1], float(f))))
        if g is not None and g[0] == "LineString" and len(g[1]) else None
        for g, f in zip(_decode_series(b), frac)])


@pandas_udf(DoubleType())
def st_linelocatepoint(b: pd.Series, p: pd.Series) -> pd.Series:
    out = []
    for g, gp in zip(_decode_series(b), _decode_series(p)):
        if g is None or gp is None or g[0] != "LineString" or gp[0] != "Point":
            out.append(np.nan)
        else:
            out.append(A.line_locate_point(g[1], gp[1][:2]))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_closestpoint(b1: pd.Series, b2: pd.Series) -> pd.Series:
    out = []
    for g1, g2 in zip(_decode_series(b1), _decode_series(b2)):
        pt = A.closest_point(g1, g2)
        out.append(None if pt is None else W.encode(("Point", pt)))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_shortestline(b1: pd.Series, b2: pd.Series) -> pd.Series:
    out = []
    for g1, g2 in zip(_decode_series(b1), _decode_series(b2)):
        p1 = A.closest_point(g1, g2)
        p2 = A.closest_point(g2, g1)
        if p1 is None or p2 is None:
            out.append(None)
        else:
            out.append(W.encode(("LineString", np.vstack([p1, p2]))))
    return pd.Series(out)


@pandas_udf(DoubleType())
def st_azimuth(b1: pd.Series, b2: pd.Series) -> pd.Series:
    out = []
    for g1, g2 in zip(_decode_series(b1), _decode_series(b2)):
        if g1 is None or g2 is None or g1[0] != "Point" or g2[0] != "Point" \
                or np.array_equal(g1[1][:2], g2[1][:2]):
            out.append(np.nan)
        else:
            out.append(A.azimuth(g1[1], g2[1]))
    return pd.Series(out)


@pandas_udf(DoubleType())
def st_maxdistance(b1: pd.Series, b2: pd.Series) -> pd.Series:
    out = []
    for g1, g2 in zip(_decode_series(b1), _decode_series(b2)):
        if g1 is None or g2 is None:
            out.append(np.nan)
            continue
        c1 = K._all_coords(g1)
        c2 = K._all_coords(g2)
        if c1 is None or c2 is None or not len(c1) or not len(c2):
            out.append(np.nan)
            continue
        d = np.hypot(c1[:, None, 0] - c2[None, :, 0],
                     c1[:, None, 1] - c2[None, :, 1])
        out.append(float(d.max()))
    return pd.Series(out)


# --- CRS / geography -----------------------------------------------------------

@pandas_udf(BinaryType())
def st_transform(b: pd.Series, src: pd.Series, dst: pd.Series) -> pd.Series:
    out = []
    for g, s, d in zip(_decode_series(b), src, dst):
        if g is None:
            out.append(None)
        else:
            out.append(W.encode(_map_coords(
                g, lambda a, s=s, d=d: A.transform_coords(a, s, d))))
    return pd.Series(out)


@pandas_udf(DoubleType())
def st_distancesphere(b1: pd.Series, b2: pd.Series) -> pd.Series:
    """Great-circle distance in meters; point×point is the vectorized
    haversine fast path, any other combo goes through the spherical
    kernels (point→arc cross-track, arc×arc, spherical containment)."""
    if len(b1) and _all_points(b1) and _all_points(b2):
        x1, y1 = W.wkb_to_points(b1)
        x2, y2 = W.wkb_to_points(b2)
        return pd.Series(A.haversine_m(x1, y1, x2, y2))
    from sedona_db_spark.geometry import sphere as SPH
    out = []
    for g1, g2 in zip(_decode_series(b1), _decode_series(b2)):
        if g1 is None or g2 is None:
            out.append(np.nan)
        elif g1[0] == "Point" and g2[0] == "Point":
            out.append(float(A.haversine_m(
                np.array([g1[1][0]]), np.array([g1[1][1]]),
                np.array([g2[1][0]]), np.array([g2[1][1]]))[0]))
        else:
            out.append(SPH.geog_distance_m(g1, g2))
    return pd.Series(out)


@pandas_udf(BooleanType())
def st_intersectssphere(b1: pd.Series, b2: pd.Series) -> pd.Series:
    """Spherical ST_Intersects: edges are great-circle arcs, polygon
    interiors are spherical (geography-lite tier of the reference's S2
    kernels, c/sedona-s2geography/src/kernels.rs:27-51)."""
    from sedona_db_spark.geometry import sphere as SPH
    return pd.Series([
        None if g1 is None or g2 is None else SPH.geog_intersects(g1, g2)
        for g1, g2 in zip(_decode_series(b1), _decode_series(b2))])


@pandas_udf(BooleanType())
def st_containssphere(b1: pd.Series, b2: pd.Series) -> pd.Series:
    """Spherical covers-style containment (boundary-inclusive)."""
    from sedona_db_spark.geometry import sphere as SPH
    return pd.Series([
        None if g1 is None or g2 is None else SPH.geog_contains(g1, g2)
        for g1, g2 in zip(_decode_series(b1), _decode_series(b2))])


@pandas_udf(BooleanType())
def st_dwithinsphere(b1: pd.Series, b2: pd.Series, d: pd.Series) -> pd.Series:
    """Great-circle distance ≤ d meters (any geometry combination)."""
    from sedona_db_spark.geometry import sphere as SPH
    out = []
    for g1, g2, dd in zip(_decode_series(b1), _decode_series(b2), d):
        if g1 is None or g2 is None or dd is None:
            out.append(None)
        elif g1[0] == "Point" and g2[0] == "Point":
            out.append(bool(float(A.haversine_m(
                np.array([g1[1][0]]), np.array([g1[1][1]]),
                np.array([g2[1][0]]), np.array([g2[1][1]]))[0]) <= float(dd)))
        else:
            out.append(bool(SPH.geog_distance_m(g1, g2) <= float(dd)))
    return pd.Series(out)


# --- affine --------------------------------------------------------------------

@pandas_udf(BinaryType())
def st_rotate(b: pd.Series, angle: pd.Series) -> pd.Series:
    out = []
    for g, a in zip(_decode_series(b), angle):
        if g is None:
            out.append(None)
            continue
        c, s = np.cos(float(a)), np.sin(float(a))
        def rot(arr, c=c, s=s):
            o = arr.copy()
            o[:, 0] = c * arr[:, 0] - s * arr[:, 1]
            o[:, 1] = s * arr[:, 0] + c * arr[:, 1]
            return o
        out.append(W.encode(_map_coords(g, rot)))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_affine(b: pd.Series, a: pd.Series, bb: pd.Series, d: pd.Series,
              e: pd.Series, xoff: pd.Series, yoff: pd.Series) -> pd.Series:
    out = []
    for g, aa, bbv, dd, ee, xo, yo in zip(_decode_series(b), a, bb, d, e, xoff, yoff):
        if g is None or any(pd.isna(v) for v in (aa, bbv, dd, ee, xo, yo)):
            out.append(None)
            continue
        def aff(arr, aa=float(aa), bbv=float(bbv), dd=float(dd),
                ee=float(ee), xo=float(xo), yo=float(yo)):
            o = arr.copy()
            o[:, 0] = aa * arr[:, 0] + bbv * arr[:, 1] + xo
            o[:, 1] = dd * arr[:, 0] + ee * arr[:, 1] + yo
            return o
        out.append(W.encode(_map_coords(g, aff)))
    return pd.Series(out)


UDFS2 = {
    "ST_MakeLine": st_makeline,
    "ST_PointZ": st_pointz,
    "ST_AsGeoJSON": st_asgeojson,
    "ST_AsEWKB": st_asewkb,
    "ST_SRID": st_srid,
    "ST_Dump": st_dump,
    "ST_Points": st_points,
    "ST_ExteriorRing": st_exteriorring,
    "ST_InteriorRingN": st_interiorringn,
    "ST_NumInteriorRings": st_numinteriorrings,
    "ST_HasZ": st_hasz,
    "ST_Z": st_z,
    "ST_Boundary": st_boundary,
    "ST_IsValid": st_isvalid,
    "ST_IsValidReason": st_isvalidreason,
    "ST_IsSimple": st_issimple,
    "ST_IsRing": st_isring,
    "ST_Simplify": st_simplify,
    "ST_SimplifyPreserveTopology": st_simplifypreservetopology,
    "ST_SnapToGrid": st_snaptogrid,
    "ST_Intersection": st_intersection,
    "ST_Collect": st_collect,
    "ST_LineInterpolatePoint": st_lineinterpolatepoint,
    "ST_LineLocatePoint": st_linelocatepoint,
    "ST_ClosestPoint": st_closestpoint,
    "ST_ShortestLine": st_shortestline,
    "ST_Azimuth": st_azimuth,
    "ST_MaxDistance": st_maxdistance,
    "ST_Transform": st_transform,
    "ST_DistanceSphere": st_distancesphere,
    "ST_IntersectsSphere": st_intersectssphere,
    "ST_ContainsSphere": st_containssphere,
    "ST_DWithinSphere": st_dwithinsphere,
    "ST_Rotate": st_rotate,
    "ST_Affine": st_affine,
}


def _geom_from_geojson_obj(obj):
    t = obj.get("type")
    c = obj.get("coordinates")
    if t == "Point":
        return ("Point", np.asarray(c, dtype=np.float64))
    if t == "LineString":
        return ("LineString", np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        return ("Polygon", [np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPoint":
        return ("MultiPoint", np.asarray(c, dtype=np.float64))
    if t == "MultiLineString":
        return ("MultiLineString", [np.asarray(l, dtype=np.float64) for l in c])
    if t == "MultiPolygon":
        return ("MultiPolygon",
                [[np.asarray(r, dtype=np.float64) for r in rings] for rings in c])
    if t == "GeometryCollection":
        return ("GeometryCollection",
                [_geom_from_geojson_obj(g) for g in obj.get("geometries", [])])
    raise ValueError(f"unsupported GeoJSON type {t!r}")


@pandas_udf(BinaryType())
def st_geomfromgeojson(s: pd.Series) -> pd.Series:
    """Parse GeoJSON geometry (or Feature) strings to WKB — the ingest
    complement of ST_AsGeoJSON (GeoJSON vector ingest is GDAL-backed in the
    reference, c/sedona-gdal)."""
    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        obj = json.loads(v)
        if obj.get("type") == "Feature":
            obj = obj.get("geometry") or {}
        out.append(W.encode(_geom_from_geojson_obj(obj)))
    return pd.Series(out)


UDFS2["ST_GeomFromGeoJSON"] = st_geomfromgeojson


@pandas_udf(DoubleType())
def st_areasphere(b: pd.Series) -> pd.Series:
    """Geodesic area in m² on the mean sphere (the geography tier of
    ST_Area; the reference dispatches by edge type, S2-backed)."""
    return pd.Series([np.nan if g is None else A.spherical_area_m2(g)
                      for g in _decode_series(b)])


@pandas_udf(DoubleType())
def st_lengthsphere(b: pd.Series) -> pd.Series:
    """Great-circle length in meters (geography tier of ST_Length)."""
    return pd.Series([np.nan if g is None else A.spherical_length_m(g)
                      for g in _decode_series(b)])


@pandas_udf(BooleanType())
def st_intersectssphere_oriented(b1: pd.Series, b2: pd.Series) -> pd.Series:
    """Full-sphere (S2-semantics) spherical ST_Intersects: polygon
    interiors are the regions LEFT of their directed rings, so
    larger-than-hemisphere interiors and polar caps are expressible —
    s2geography's oriented=true reading (the reference's default reading
    normalizes to the smaller region, which ST_IntersectsSphere mirrors).
    """
    from sedona_db_spark.geometry import sphere as SPH
    return pd.Series([
        None if g1 is None or g2 is None
        else SPH.geog_intersects(g1, g2, oriented=True)
        for g1, g2 in zip(_decode_series(b1), _decode_series(b2))])


@pandas_udf(BooleanType())
def st_containssphere_oriented(b1: pd.Series, b2: pd.Series) -> pd.Series:
    """Full-sphere spherical covers-style containment (oriented rings)."""
    from sedona_db_spark.geometry import sphere as SPH
    return pd.Series([
        None if g1 is None or g2 is None
        else SPH.geog_contains(g1, g2, oriented=True)
        for g1, g2 in zip(_decode_series(b1), _decode_series(b2))])


@pandas_udf(DoubleType())
def st_areasphere_oriented(b: pd.Series) -> pd.Series:
    """Full-sphere geodesic area: each ring contributes the area LEFT of
    its direction (mod 4πR²) — a clockwise ring yields the world-minus-cap
    complement the smallest-polygon rule cannot represent."""
    return pd.Series([np.nan if g is None
                      else A.spherical_area_m2(g, oriented=True)
                      for g in _decode_series(b)])


UDFS2["ST_AreaSphere"] = st_areasphere
UDFS2["ST_LengthSphere"] = st_lengthsphere
UDFS2["ST_PerimeterSphere"] = st_lengthsphere
@pandas_udf(DoubleType())
def st_distancespheroid(b1: pd.Series, b2: pd.Series) -> pd.Series:
    """WGS84 geodesic point-to-point distance in metres (vectorized
    Vincenty inverse, exact quarter-meridian/equator pins).
    Beyond-reference: SedonaDB's only spheroid hook is st_knn's
    use_spheroid flag, which it stubs (spatial_predicate.rs:279-283);
    PostGIS exposes this as ST_DistanceSpheroid.  Points only — densify
    other geometries or use ST_DistanceSphere."""
    from sedona_db_spark.geometry import wkb as W
    lons1, lats1, lons2, lats2, idx = [], [], [], [], []
    n = len(b1)
    out = np.full(n, np.nan)
    for i, (r1, r2) in enumerate(zip(b1, b2)):
        if r1 is None or r2 is None:
            continue
        g1, g2 = W.decode(bytes(r1)), W.decode(bytes(r2))
        if g1 is None or g2 is None:
            continue
        if g1[0] != "Point" or g2[0] != "Point":
            continue    # non-points yield NULL/NaN (points-only surface —
            #             a bad row must not poison the whole job)
        lons1.append(float(g1[1][0])); lats1.append(float(g1[1][1]))
        lons2.append(float(g2[1][0])); lats2.append(float(g2[1][1]))
        idx.append(i)
    if idx:
        d = A.vincenty_inverse_m(np.array(lons1), np.array(lats1),
                                 np.array(lons2), np.array(lats2))
        out[idx] = d
    return pd.Series(out)


UDFS2["ST_DistanceSpheroid"] = st_distancespheroid
UDFS2["ST_IntersectsSphereOriented"] = st_intersectssphere_oriented
UDFS2["ST_ContainsSphereOriented"] = st_containssphere_oriented
UDFS2["ST_AreaSphereOriented"] = st_areasphere_oriented
