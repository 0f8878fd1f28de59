"""Additional geometry algorithms (public textbook implementations).

Simplification (Douglas–Peucker), convex clipping (Sutherland–Hodgman),
linear referencing (interpolate/locate/closest point), azimuth, validity
checks, boundary, snap-to-grid, affine transforms, spherical distance
(haversine) and Web-Mercator reprojection — the numpy backing for the
second batch of ST_ functions (reference surface: rust/sedona-functions,
c/sedona-geos, c/sedona-proj kernels; see SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W


# ---------------------------------------------------------------------------
# simplification
# ---------------------------------------------------------------------------

def douglas_peucker(pts: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas–Peucker on an (n, 2+) path."""
    n = len(pts)
    if n < 3:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = pts[i0 + 1:i1, :2]
        d = K.points_seg_dist(seg[:, 0], seg[:, 1],
                              pts[i0, 0], pts[i0, 1], pts[i1, 0], pts[i1, 1])
        k = int(np.argmax(d))
        if d[k] > tol:
            mid = i0 + 1 + k
            keep[mid] = True
            stack.append((i0, mid))
            stack.append((mid, i1))
    return pts[keep]


def simplify(g, tol: float):
    if g is None:
        return None
    name, p = g
    if name == "LineString":
        return (name, douglas_peucker(p, tol))
    if name == "MultiLineString":
        return (name, [douglas_peucker(l, tol) for l in p])
    if name in ("Polygon", "MultiPolygon"):
        def simp_ring(r):
            """Simplified ring, or None if it collapses (GEOS ST_Simplify
            DROPS rings/parts that degenerate below a valid ring —
            reference test_st_simplify rows 18-23)."""
            out = douglas_peucker(r, tol)
            if len(out) < 4 or abs(K._ring_area2(
                    np.asarray(out, dtype=np.float64)[:, :2])) == 0.0:
                return None
            return out

        def simp_poly(rings):
            shell = simp_ring(rings[0]) if rings else None
            if shell is None:
                return None
            holes = [h for h in (simp_ring(r) for r in rings[1:])
                     if h is not None]
            return [shell] + holes
        if name == "Polygon":
            rings = simp_poly(p)
            return (name, rings if rings is not None else [])
        parts = [r for r in (simp_poly(rings) for rings in p)
                 if r is not None]
        return (name, parts)
    if name == "GeometryCollection":
        return (name, [simplify(q, tol) for q in p])
    return g


def snap_to_grid(g, size: float):
    if g is None or size <= 0:
        return g
    def snap(arr):
        out = arr.copy()
        out[:, 0] = np.round(arr[:, 0] / size) * size
        out[:, 1] = np.round(arr[:, 1] / size) * size
        return out
    from sedona_db_spark.functions.scalar import _map_coords
    return _map_coords(g, snap)


# ---------------------------------------------------------------------------
# convex clipping (Sutherland–Hodgman) → ST_Intersection for convex clips
# ---------------------------------------------------------------------------

def is_convex_ring(ring: np.ndarray) -> bool:
    r = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    n = len(r)
    if n < 3:
        return False
    sign = 0.0
    for i in range(n):
        o = K._orient(r[i][0], r[i][1], r[(i + 1) % n][0], r[(i + 1) % n][1],
                      r[(i + 2) % n][0], r[(i + 2) % n][1])
        if o != 0:
            if sign == 0:
                sign = o
            elif (o > 0) != (sign > 0):
                return False
    return True


def clip_polygon_convex(subject_rings, clip_ring: np.ndarray):
    """Sutherland–Hodgman: clip subject polygon by a CONVEX ring. Exact for
    convex clips; returns ring list (may be empty).  Holes in the subject
    are clipped independently."""
    r = clip_ring[:-1] if np.array_equal(clip_ring[0], clip_ring[-1]) else clip_ring
    # ensure CCW
    if K._ring_area2(np.vstack([r, r[:1]])) < 0:
        r = r[::-1]
    out_rings = []
    for ring in subject_rings:
        poly = [tuple(p[:2]) for p in (ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring)]
        n = len(r)
        for i in range(n):
            if not poly:
                break
            a, b = r[i], r[(i + 1) % n]
            new_poly = []
            for j in range(len(poly)):
                cur = poly[j]
                prev = poly[j - 1]
                cur_in = K._orient(a[0], a[1], b[0], b[1], cur[0], cur[1]) >= 0
                prev_in = K._orient(a[0], a[1], b[0], b[1], prev[0], prev[1]) >= 0
                if cur_in:
                    if not prev_in:
                        new_poly.append(_line_intersect(prev, cur, a, b))
                    new_poly.append(cur)
                elif prev_in:
                    new_poly.append(_line_intersect(prev, cur, a, b))
            poly = new_poly
        if len(poly) >= 3:
            arr = np.array(poly + [poly[0]], dtype=np.float64)
            out_rings.append(arr)
    return out_rings


def _line_intersect(p1, p2, a, b):
    x1, y1 = p1[0], p1[1]
    x2, y2 = p2[0], p2[1]
    x3, y3 = a[0], a[1]
    x4, y4 = b[0], b[1]
    denom = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if denom == 0:
        return (x2, y2)
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / denom
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


def intersection(g1, g2):
    """ST_Intersection for the supported combinations:

    - point/multipoint vs anything (membership filter) — exact;
    - any vs convex polygon (Sutherland–Hodgman clip) — exact;
    - segments vs polygon for linestrings — exact;
    general concave∩concave polygon overlay is not implemented (the
    reference delegates this to GEOS)."""
    if g1 is None or g2 is None:
        return None
    if not K.geom_intersects(g1, g2):
        return ("GeometryCollection", [])
    for a, b in ((g1, g2), (g2, g1)):
        if a[0] in ("Point", "MultiPoint"):
            coords = K._all_coords(a)
            m = K.points_in_geom(coords[:, 0], coords[:, 1], b)
            kept = coords[m]
            if len(kept) == 0:
                return ("GeometryCollection", [])
            if len(kept) == 1:
                return ("Point", kept[0])
            return ("MultiPoint", kept)
    if g1[0] == "LineString" and g2[0] in ("Polygon", "MultiPolygon"):
        return _clip_line_by_poly(g1[1], g2)
    if g2[0] == "LineString" and g1[0] in ("Polygon", "MultiPolygon"):
        return _clip_line_by_poly(g2[1], g1)
    if g1[0] == "Polygon" and g2[0] == "Polygon":
        # convex clip: Sutherland–Hodgman gives the minimal-vertex result
        for subject, clip in ((g1, g2), (g2, g1)):
            if len(subject[1]) == 1 and len(clip[1]) == 1 \
                    and is_convex_ring(clip[1][0]):
                rings = clip_polygon_convex(subject[1][:1], clip[1][0])
                if not rings:
                    return ("GeometryCollection", [])
                return ("Polygon", rings)
    if g1[0] in ("Polygon", "MultiPolygon") and g2[0] in ("Polygon", "MultiPolygon"):
        # general overlay: region-exact slab decomposition
        from sedona_db_spark.geometry.overlay import boolean_op
        return boolean_op(g1, g2, "intersection")
    raise NotImplementedError(
        f"ST_Intersection: unsupported type combination {g1[0]} × {g2[0]}")


def _clip_line_by_poly(line: np.ndarray, poly, keep_inside: bool = True):
    """Exact line∩polygon (or line∖polygon with keep_inside=False): split
    segments at boundary crossings, keep the pieces on the requested side."""
    pieces = []
    cur = []
    for i in range(len(line) - 1):
        p, q = line[i, :2], line[i + 1, :2]
        # gather crossing parameters with every polygon edge
        ts = [0.0, 1.0]
        for a, b in K._segments_of(poly):
            t = _seg_param_intersect(p, q, a, b)
            if t is not None:
                ts.append(t)
        ts = sorted(set(ts))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            mid = p + (q - p) * ((t0 + t1) / 2)
            inside = bool(K.points_in_geom(np.array([mid[0]]),
                                           np.array([mid[1]]), poly)[0])
            if inside == keep_inside:
                s = p + (q - p) * t0
                e = p + (q - p) * t1
                if cur and np.allclose(cur[-1], s):
                    cur.append(e)
                else:
                    if len(cur) >= 2:
                        pieces.append(np.array(cur))
                    cur = [s, e]
    if len(cur) >= 2:
        pieces.append(np.array(cur))
    if not pieces:
        return ("GeometryCollection", [])
    if len(pieces) == 1:
        return ("LineString", pieces[0])
    return ("MultiLineString", pieces)


def _seg_param_intersect(p, q, a, b):
    d1 = (q[0] - p[0], q[1] - p[1])
    d2 = (b[0] - a[0], b[1] - a[1])
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if denom == 0:
        return None
    t = ((a[0] - p[0]) * d2[1] - (a[1] - p[1]) * d2[0]) / denom
    u = ((a[0] - p[0]) * d1[1] - (a[1] - p[1]) * d1[0]) / denom
    if 0 <= t <= 1 and 0 <= u <= 1:
        return float(t)
    return None


# ---------------------------------------------------------------------------
# linear referencing
# ---------------------------------------------------------------------------

def line_interpolate_point(line: np.ndarray, frac: float) -> np.ndarray:
    """Point at fraction ``frac`` of the line's length."""
    seg = np.diff(line[:, :2], axis=0)
    lens = np.hypot(seg[:, 0], seg[:, 1])
    total = lens.sum()
    if total == 0:
        return line[0, :2]
    target = np.clip(frac, 0.0, 1.0) * total
    cum = np.concatenate([[0.0], np.cumsum(lens)])
    i = int(np.searchsorted(cum, target, side="right") - 1)
    i = min(i, len(lens) - 1)
    rem = target - cum[i]
    t = rem / lens[i] if lens[i] > 0 else 0.0
    return line[i, :2] + t * seg[i]


def line_locate_point(line: np.ndarray, pt: np.ndarray) -> float:
    """Fraction of the line's length at the closest point to ``pt``."""
    seg = np.diff(line[:, :2], axis=0)
    lens = np.hypot(seg[:, 0], seg[:, 1])
    total = lens.sum()
    if total == 0:
        return 0.0
    best_d = np.inf
    best_at = 0.0
    cum = 0.0
    for i in range(len(seg)):
        ll = lens[i] ** 2
        if ll == 0:
            t = 0.0
        else:
            t = np.clip(((pt[0] - line[i, 0]) * seg[i, 0]
                         + (pt[1] - line[i, 1]) * seg[i, 1]) / ll, 0, 1)
        proj = line[i, :2] + t * seg[i]
        d = float(np.hypot(pt[0] - proj[0], pt[1] - proj[1]))
        if d < best_d:
            best_d = d
            best_at = cum + t * lens[i]
        cum += lens[i]
    return float(best_at / total)


def closest_point(g1, g2) -> np.ndarray | None:
    """Point on g1 closest to g2 (matches reference ST_ClosestPoint arg
    order)."""
    if g1 is None or g2 is None:
        return None
    if K.geom_intersects(g1, g2):
        # any shared point; use a vertex of g1 inside g2 or intersection pt
        c1 = K._all_coords(g1)
        if c1 is not None and len(c1):
            m = K.points_in_geom(c1[:, 0], c1[:, 1], g2)
            if m.any():
                return c1[m][0][:2]
    # sample: closest vertex/segment projection of g1 toward g2's vertices
    best = None
    best_d = np.inf
    c2 = K._all_coords(g2)
    segs1 = K._segments_of(g1)
    if segs1:
        for p in c2:
            for a, b in segs1:
                d1 = (b[0] - a[0], b[1] - a[1])
                ll = d1[0] ** 2 + d1[1] ** 2
                t = 0.0 if ll == 0 else np.clip(
                    ((p[0] - a[0]) * d1[0] + (p[1] - a[1]) * d1[1]) / ll, 0, 1)
                proj = (a[0] + t * d1[0], a[1] + t * d1[1])
                d = np.hypot(p[0] - proj[0], p[1] - proj[1])
                if d < best_d:
                    best_d = d
                    best = np.array(proj)
    c1 = K._all_coords(g1)
    for p in c1:
        d = K.points_to_geom_distance(np.array([p[0]]), np.array([p[1]]), g2)[0]
        if d < best_d:
            best_d = d
            best = p[:2].copy()
    return best


def azimuth(p1: np.ndarray, p2: np.ndarray) -> float:
    """North-based clockwise azimuth in radians (PostGIS/reference
    convention)."""
    return float(np.arctan2(p2[0] - p1[0], p2[1] - p1[1])) % (2 * np.pi)


# ---------------------------------------------------------------------------
# validity
# ---------------------------------------------------------------------------

def ring_self_intersects(ring: np.ndarray) -> bool:
    r = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    n = len(r)
    for i in range(n):
        a1, a2 = r[i], r[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share a vertex by construction
            b1, b2 = r[j], r[(j + 1) % n]
            if K._segments_intersect(a1, a2, b1, b2):
                return True
    return False


def is_valid(g) -> bool:
    reason = invalid_reason(g)
    return reason is None


def invalid_reason(g) -> str | None:
    if g is None:
        return None
    name, p = g
    if name in ("LineString", "MultiLineString"):
        # degenerate (zero-length) linestrings are invalid
        # (reference test_functions.py:923-930)
        lines = [p] if name == "LineString" else p
        for line in lines:
            if len(line) >= 2 and all(
                    np.array_equal(line[0], line[i]) for i in range(1, len(line))):
                return "Zero-length linestring"
    if name in ("Polygon", "MultiPolygon"):
        polys = [p] if name == "Polygon" else p
        for rings in polys:
            for ring in rings:
                if len(ring) and not np.array_equal(ring[0], ring[-1]):
                    return "Ring not closed"
                if len(ring) < 4:
                    if len(ring) > 0:
                        return "Ring has fewer than 4 points"
                    continue
                if ring_self_intersects(ring):
                    return "Self-intersection"
            for hole in rings[1:]:
                hx, hy = hole[:, 0], hole[:, 1]
                if not K.points_in_ring(hx, hy, rings[0]).all():
                    return "Hole lies outside shell"
                # a hole may touch the shell at finitely many POINTS only;
                # a shared (collinear-overlapping) edge is invalid
                # (reference test_st_isvalid rows 15/17)
                for i in range(len(hole) - 1):
                    for j in range(len(rings[0]) - 1):
                        if K._collinear_overlap(hole[i], hole[i + 1],
                                                rings[0][j], rings[0][j + 1]):
                            return "Hole edge shares shell boundary"
        if name == "MultiPolygon" and len(p) > 1:
            # parts of a valid MultiPolygon may touch only at points: any
            # interior overlap is invalid (reference test_functions.py:941-948)
            for i in range(len(p)):
                for j in range(i + 1, len(p)):
                    gi, gj = ("Polygon", p[i]), ("Polygon", p[j])
                    if K.geom_overlaps(gi, gj) or K.geom_contains(gi, gj) \
                            or K.geom_contains(gj, gi):
                        return "MultiPolygon parts overlap"
    if name == "GeometryCollection":
        for q in p:
            r = invalid_reason(q)
            if r:
                return r
    return None


def path_self_intersects(path: np.ndarray) -> bool:
    """Self-intersection of an OPEN path (no phantom closing edge)."""
    n = len(path)
    for i in range(n - 1):
        for j in range(i + 1, n - 1):
            if j == i + 1:
                continue  # adjacent edges share a vertex
            if K._segments_intersect(path[i], path[i + 1], path[j], path[j + 1]):
                return True
    return False


def is_simple(g) -> bool:
    """OGC/GEOS ST_IsSimple (reference test_st_issimple, full row set):

    - MultiPoint: no repeated points;
    - LineString: no self-intersection away from the endpoints (a closed
      line that merely doubles back, e.g. (0 0, 1 1, 0 0), is NOT simple);
    - MultiLineString: every component simple AND components may only meet
      at points that are boundary (end) points of both — crossing or
      overlapping interiors break simplicity;
    - Polygon/MultiPolygon: each ring individually non-self-intersecting
      and non-degenerate; unlike VALIDITY, inter-ring and inter-polygon
      overlap does NOT matter (GEOS IsSimpleOp checks rings in isolation,
      so overlapping MultiPolygon parts are still 'simple').
    """
    if g is None:
        return False
    name, p = g
    if name in ("Point",):
        return True
    if name == "MultiPoint":
        return len(np.unique(p[:, :2], axis=0)) == len(p)
    if name == "LineString":
        if len(p) <= 2:
            return True
        if np.array_equal(p[0], p[-1]):  # closed: test as a ring
            if len(p) < 4:
                return False  # degenerate back-and-forth "ring"
            return not ring_self_intersects(p)
        return not path_self_intersects(p)
    if name == "MultiLineString":
        from sedona_db_spark.geometry.relate import relate_matrix
        comps = [("LineString", l) for l in p]
        if not all(is_simple(c) for c in comps):
            return False
        for i in range(len(comps)):
            for j in range(i + 1, len(comps)):
                m = relate_matrix(comps[i], comps[j])
                # only boundary×boundary contact is allowed
                if m[0] != "F" or m[1] != "F" or m[3] != "F":
                    return False
        return True
    if name in ("Polygon", "MultiPolygon"):
        polys = [p] if name == "Polygon" else p
        for rings in polys:
            for ring in rings:
                if len(ring) and not np.array_equal(ring[0], ring[-1]):
                    return False
                if 0 < len(ring) < 4:
                    return False
                if len(ring) >= 4 and (
                        abs(K._ring_area2(np.asarray(ring, dtype=np.float64)[:, :2])) == 0.0
                        or ring_self_intersects(ring)):
                    return False
        return True
    if name == "GeometryCollection":
        return all(is_simple(q) for q in p)
    return is_valid(g)


def boundary(g):
    if g is None:
        return None
    name, p = g
    if name in ("Point", "MultiPoint"):
        return ("GeometryCollection", [])
    if name == "LineString":
        if len(p) == 0 or np.array_equal(p[0], p[-1]):
            return ("MultiPoint", np.empty((0, 2)))
        return ("MultiPoint", np.vstack([p[0, :2], p[-1, :2]]))
    if name == "Polygon":
        if len(p) == 1:
            return ("LineString", p[0])
        return ("MultiLineString", list(p))
    if name == "MultiPolygon":
        rings = [r for rings in p for r in rings]
        return ("MultiLineString", rings)
    if name == "MultiLineString":
        pts = []
        for l in p:
            if len(l) and not np.array_equal(l[0], l[-1]):
                pts += [l[0, :2], l[-1, :2]]
        return ("MultiPoint", np.array(pts) if pts else np.empty((0, 2)))
    if name == "GeometryCollection":
        # union of element boundaries (reference test_st_boundary GC rows):
        # point boundaries first as one MULTIPOINT, then the line
        # boundaries; a single kind is returned bare (no GC wrapper)
        pts: list = []
        lines: list = []

        def walk(q):
            if q is None:
                return
            if q[0] == "GeometryCollection":
                for r in q[1]:
                    walk(r)
                return
            bq = boundary(q)
            if bq is None:
                return
            if bq[0] == "MultiPoint":
                pts.extend(np.asarray(bq[1], dtype=np.float64)[:, :2].tolist())
            elif bq[0] == "LineString":
                lines.append(bq[1])
            elif bq[0] == "MultiLineString":
                lines.extend(bq[1])

        for q in p:
            walk(q)
        uniq_pts = []
        seen = set()
        for pt in pts:
            key = (float(pt[0]), float(pt[1]))
            if key not in seen:
                seen.add(key)
                uniq_pts.append(pt)
        parts = []
        if uniq_pts:
            parts.append(("MultiPoint", np.array(uniq_pts))
                         if len(uniq_pts) > 1
                         else ("Point", np.array(uniq_pts[0])))
        if lines:
            parts.append(("MultiLineString", lines) if len(lines) > 1
                         else ("LineString", lines[0]))
        if not parts:
            return ("GeometryCollection", [])
        if len(parts) == 1:
            return parts[0]
        return ("GeometryCollection", parts)
    return ("GeometryCollection", [])


# ---------------------------------------------------------------------------
# spherical / projection
# ---------------------------------------------------------------------------

EARTH_RADIUS_M = 6371008.8  # mean earth radius (IUGG)
WGS84_A = 6378137.0


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized great-circle distance in meters (mean-radius sphere)."""
    la1, lo1, la2, lo2 = map(np.radians, (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = np.sin(dlat / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


_CRS_ALIASES = {
    "EPSG:4326": "4326", "OGC:CRS84": "4326", "CRS84": "4326", "4326": "4326",
    "EPSG:3857": "3857", "3857": "3857",
    "ESRI:54008": "54008",
    # legacy web-mercator spellings
    "EPSG:900913": "3857", "900913": "3857", "ESRI:102100": "3857",
    "102100": "3857",
}


def _crs_code(crs) -> str:
    if not isinstance(crs, str):
        crs = str(crs)
    s = crs.upper()
    if s.startswith("EPSG:"):
        s = s[5:]
    return _CRS_ALIASES.get(s, s)


def transform_coords(arr: np.ndarray, src: str, dst: str) -> np.ndarray:
    """Reproject (n, 2+) coords, routed through EPSG:4326 as the hub.

    Supported: EPSG:4326/OGC:CRS84, EPSG:3857 (spherical Web-Mercator),
    the hand-verified named entries (2154, 3978, 5070, 3413, 3031, 54008,
    3035, 2193, 3395, 32661/32761, 27700, 31466-69, 23028-38), the
    parametric EPSG table (round 5: 300+ codes — WGS84/ETRS89/NAD83/NAD27/
    SIRGAS UTM, GDA MGA, Pulkovo Gauss-Krüger, Japan Plane Rectangular
    I-XIX, SPCS83 Lambert zones incl. ftUS units, and national TM/LCC
    grids), and any ``+proj=...`` PROJ string (longlat/utm/tmerc/lcc/
    lcc1sp/aea/polar stere/laea/merc/webmerc/sinu/ups + +towgs84/+datum/
    +units) — all published Snyder/EPSG closed forms in geometry/proj.py.
    The reference resolves the same two CRS input forms through PROJ
    (c/sedona-proj/src/st_transform.rs:41, docs st_transform.qmd)."""
    from sedona_db_spark.geometry import proj as P

    s_raw, d_raw = str(src), str(dst)
    s = s_raw if "+proj=" in s_raw else _crs_code(src)
    d = d_raw if "+proj=" in d_raw else _crs_code(dst)
    out = arr.copy()
    if s == d:
        return out
    # leg 1: src → lon/lat
    if s == "4326":
        lon, lat = arr[:, 0].astype(np.float64), arr[:, 1].astype(np.float64)
    elif s == "3857":
        lon = np.degrees(arr[:, 0] / WGS84_A)
        lat = np.degrees(2 * np.arctan(np.exp(arr[:, 1] / WGS84_A)) - np.pi / 2)
    else:
        pr = P.resolve_crs(s)
        if pr is None:
            raise ValueError(
                f"unsupported CRS {src} (built-in: 4326/CRS84, 3857, the "
                f"parametric EPSG table in geometry/proj.py — UTM/MGA/GK "
                f"zone families, SPCS83, national grids — or any "
                f"'+proj=...' PROJ string)")
        lon, lat = pr[1](arr[:, 0], arr[:, 1])
    # leg 2: lon/lat → dst
    if d == "4326":
        x, y = lon, lat
    elif d == "3857":
        x = np.radians(lon) * WGS84_A
        y = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) * WGS84_A
    else:
        pr = P.resolve_crs(d)
        if pr is None:
            raise ValueError(
                f"unsupported CRS {dst} (built-in: 4326/CRS84, 3857, the "
                f"parametric EPSG table in geometry/proj.py — UTM/MGA/GK "
                f"zone families, SPCS83, national grids — or any "
                f"'+proj=...' PROJ string)")
        x, y = pr[0](lon, lat)
    out[:, 0], out[:, 1] = x, y
    return out


# ---------------------------------------------------------------------------
# spherical (geography-lite) measures
# ---------------------------------------------------------------------------

def spherical_ring_area_m2(ring: np.ndarray) -> float:
    """Signed spherical polygon area (steradians × R²) via the classic
    spherical-excess line integral (Chamberlain & Duquette 2007):
    A = R²/2 · |Σ (λ₂−λ₁)(2 + sin φ₁ + sin φ₂)| with λ, φ in radians."""
    lam = np.radians(ring[:, 0])
    phi = np.radians(ring[:, 1])
    lam2 = np.roll(lam, -1)
    phi2 = np.roll(phi, -1)
    dlam = lam2 - lam
    # wrap antimeridian-crossing edges to the short way
    dlam = np.where(dlam > np.pi, dlam - 2 * np.pi, dlam)
    dlam = np.where(dlam < -np.pi, dlam + 2 * np.pi, dlam)
    s = np.sum(dlam * (2 + np.sin(phi) + np.sin(phi2)))
    return float(s) * EARTH_RADIUS_M ** 2 / 2.0


def spherical_area_m2(g, oriented: bool = False) -> float:
    """Geodesic (mean-sphere) area in m² of polygonal geometries.

    Default: smallest-polygon rule (|outer| − Σ|holes|), matching the
    non-oriented reading the reference's s2geography layer defaults to.
    ``oriented=True`` is the S2 full-sphere tier: each ring contributes
    the area of the region to its LEFT, i.e. −(line integral) reduced
    mod 4πR² — a clockwise ring yields the larger-than-hemisphere
    complement (world-minus-cap), CCW-shell + CW-holes reduce to
    shell − holes exactly as in the default."""
    if g is None:
        return float("nan")
    name, p = g
    if name == "Polygon":
        if not p:
            return 0.0
        if oriented:
            sphere = 4.0 * np.pi * EARTH_RADIUS_M ** 2
            s = -spherical_ring_area_m2(p[0]) % sphere
            for hole in p[1:]:
                s += -spherical_ring_area_m2(hole) % sphere - sphere
            return max(s, 0.0)
        sphere = 4.0 * np.pi * EARTH_RADIUS_M ** 2

        def smallest(r: np.ndarray) -> float:
            # uniform smallest-region rule: the raw line integral of a
            # pole-enclosing ring carries a 4π ambiguity (it measures the
            # area south of the curve), so reduce mod 4πR² and take the
            # smaller side — consistent with the default containment rule
            m = abs(spherical_ring_area_m2(r)) % sphere
            return min(m, sphere - m)
        a = smallest(p[0])
        for hole in p[1:]:
            a -= smallest(hole)
        return a
    if name == "MultiPolygon":
        return sum(spherical_area_m2(("Polygon", rings), oriented)
                   for rings in p)
    if name == "GeometryCollection":
        return sum(spherical_area_m2(q, oriented) for q in p)
    return 0.0


def spherical_length_m(g) -> float:
    """Great-circle length in meters of linear geometries."""
    if g is None:
        return float("nan")
    name, p = g
    if name == "LineString":
        if len(p) < 2:
            return 0.0
        return float(np.sum(haversine_m(p[:-1, 0], p[:-1, 1],
                                        p[1:, 0], p[1:, 1])))
    if name == "MultiLineString":
        return sum(spherical_length_m(("LineString", l)) for l in p)
    if name in ("Polygon", "MultiPolygon"):
        polys = [p] if name == "Polygon" else p
        total = 0.0
        for rings in polys:
            for r in rings:
                closed = r if np.array_equal(r[0], r[-1]) else np.vstack([r, r[:1]])
                total += spherical_length_m(("LineString", closed))
        return total
    if name == "GeometryCollection":
        return sum(spherical_length_m(q) for q in p)
    return 0.0


# ---------------------------------------------------------------------------
# Topology-preserving simplification (GEOS TopologyPreservingSimplifier
# semantics, re-implemented from the published algorithm: DP sections with a
# minimum-size floor per component and rejection of flattenings whose chord
# would create an interior intersection with any other live segment —
# reference c/sedona-geos ST_SimplifyPreserveTopology, verified row-for-row
# against functions/test_functions.py::test_st_simplifypreservetopology)
# ---------------------------------------------------------------------------

def _interior_intersect(p1, p2, q1, q2) -> bool:
    """True if segments (p1,p2) and (q1,q2) intersect at a point interior
    to at least one of them (shared endpoints don't count)."""
    d1 = K._orient(q1[0], q1[1], q2[0], q2[1], p1[0], p1[1])
    d2 = K._orient(q1[0], q1[1], q2[0], q2[1], p2[0], p2[1])
    d3 = K._orient(p1[0], p1[1], p2[0], p2[1], q1[0], q1[1])
    d4 = K._orient(p1[0], p1[1], p2[0], p2[1], q2[0], q2[1])
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True  # proper crossing
    # collinear / endpoint-touching cases: interior iff a touch point is
    # not an endpoint of BOTH segments
    def on(a, b, c):  # c on segment [a, b] (collinear assumed)
        return (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))
    pts = set()
    if d1 == 0 and on(q1, q2, p1):
        pts.add(tuple(p1))
    if d2 == 0 and on(q1, q2, p2):
        pts.add(tuple(p2))
    if d3 == 0 and on(p1, p2, q1):
        pts.add(tuple(q1))
    if d4 == 0 and on(p1, p2, q2):
        pts.add(tuple(q2))
    if len(pts) > 1:
        return True  # collinear overlap spans an interval
    ends_p = {tuple(p1), tuple(p2)}
    ends_q = {tuple(q1), tuple(q2)}
    return any(pt not in ends_p or pt not in ends_q for pt in pts)


class _TaggedLine:
    def __init__(self, coords: np.ndarray, min_size: int):
        self.c = np.asarray(coords, dtype=np.float64)
        self.min_size = min_size
        self.alive = [True] * len(self.c)
        # live segments as (i, j) vertex-index pairs
        self.segs = {(i, i + 1) for i in range(len(self.c) - 1)}

    def n_alive(self) -> int:
        return sum(self.alive)


def _seg_dist_scalar(p, a, b) -> float:
    return float(K.points_seg_dist(np.array([p[0]]), np.array([p[1]]),
                                   a[0], a[1], b[0], b[1])[0])


def simplify_preserve_topology(g, tol):
    if g is None or tol is None:
        return None
    name = g[0]
    if name in ("Point", "MultiPoint"):
        return g
    if name == "GeometryCollection":
        return (name, [simplify_preserve_topology(q, tol) for q in g[1]])

    # collect all linework into one shared live-segment universe (hole ↔
    # shell topology is preserved across components, as in GEOS)
    lines: list[_TaggedLine] = []
    if name == "LineString":
        lines.append(_TaggedLine(g[1], 2))
        shape = ("line", None)
    elif name == "MultiLineString":
        for l in g[1]:
            lines.append(_TaggedLine(l, 2))
        shape = ("mline", len(g[1]))
    elif name == "Polygon":
        for r in g[1]:
            lines.append(_TaggedLine(r, 4))
        shape = ("poly", [len(g[1])])
    elif name == "MultiPolygon":
        counts = []
        for rings in g[1]:
            counts.append(len(rings))
            for r in rings:
                lines.append(_TaggedLine(r, 4))
        shape = ("mpoly", counts)
    else:
        return g

    def bad_chord(line: _TaggedLine, i: int, j: int) -> bool:
        a, b = line.c[i], line.c[j]
        for other in lines:
            for (s0, s1) in other.segs:
                if other is line and i <= s0 and s1 <= j:
                    continue  # segments being replaced
                if _interior_intersect(a, b, other.c[s0], other.c[s1]):
                    return True
        return False

    def flatten(line: _TaggedLine, i: int, j: int) -> None:
        for k in range(i + 1, j):
            line.alive[k] = False
        line.segs = {(s0, s1) for (s0, s1) in line.segs
                     if not (i <= s0 and s1 <= j)}
        line.segs.add((i, j))

    def section(line: _TaggedLine, i: int, j: int) -> None:
        if j - i <= 1:
            return
        a, b = line.c[i], line.c[j]
        k, maxd = -1, -1.0
        for m in range(i + 1, j):
            d = _seg_dist_scalar(line.c[m], a, b)
            if d > maxd:  # strict: first max, GEOS order
                k, maxd = m, d
        if (maxd <= float(tol)
                and line.n_alive() - (j - i - 1) >= line.min_size
                and not bad_chord(line, i, j)):
            flatten(line, i, j)
            return
        section(line, i, k)
        section(line, k, j)

    for line in lines:
        if len(line.c) >= 2:
            section(line, 0, len(line.c) - 1)

    def out(line: _TaggedLine) -> np.ndarray:
        return line.c[np.asarray(line.alive, dtype=bool)]

    kind, meta = shape
    if kind == "line":
        return ("LineString", out(lines[0]))
    if kind == "mline":
        return ("MultiLineString", [out(l) for l in lines])
    if kind == "poly":
        return ("Polygon", [out(l) for l in lines])
    parts, idx = [], 0
    for cnt in meta:
        parts.append([out(lines[idx + r]) for r in range(cnt)])
        idx += cnt
    return ("MultiPolygon", parts)


def vincenty_inverse_m(lon1, lat1, lon2, lat2, iters: int = 64):
    """WGS84 geodesic (spheroid) inverse distance in metres, vectorized
    Vincenty (1975).  Beyond-reference: SedonaDB's only spheroid surface is
    the st_knn use_spheroid flag, which it stubs (spatial_predicate.rs:
    279-283); PostGIS exposes the same computation as ST_DistanceSpheroid.

    Converges everywhere except near-antipodal pairs (classic Vincenty
    limitation); non-converged rows fall back to the mean-sphere haversine
    scaled by (1 + f/2) — within ~0.2% on the pathological set, exact
    meridian/equator behavior preserved by the main path."""
    from sedona_db_spark.geometry.proj import WGS84
    a, f = WGS84.a, 1.0 / 298.257223563
    b = a * (1.0 - f)
    lon1 = np.asarray(lon1, np.float64)
    lat1 = np.asarray(lat1, np.float64)
    lon2 = np.asarray(lon2, np.float64)
    lat2 = np.asarray(lat2, np.float64)
    U1 = np.arctan((1 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1 - f) * np.tan(np.radians(lat2)))
    L = np.radians(lon2 - lon1)
    sU1, cU1 = np.sin(U1), np.cos(U1)
    sU2, cU2 = np.sin(U2), np.cos(U2)
    lam = L.copy()
    active = np.ones(lam.shape, dtype=bool)
    sig = np.zeros_like(lam)
    ssig = np.zeros_like(lam)
    csig = np.ones_like(lam)
    cos2a = np.ones_like(lam)
    c2sm = np.zeros_like(lam)
    for _ in range(iters):
        sl, cl = np.sin(lam), np.cos(lam)
        ssig_n = np.hypot(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl)
        csig_n = sU1 * sU2 + cU1 * cU2 * cl
        sig_n = np.arctan2(ssig_n, csig_n)
        with np.errstate(divide="ignore", invalid="ignore"):
            sina = np.where(ssig_n != 0, cU1 * cU2 * sl / ssig_n, 0.0)
            cos2a_n = 1.0 - sina ** 2
            c2sm_n = np.where(cos2a_n != 0,
                              csig_n - 2.0 * sU1 * sU2 / cos2a_n, 0.0)
        C = f / 16.0 * cos2a_n * (4.0 + f * (4.0 - 3.0 * cos2a_n))
        lam_new = L + (1 - C) * f * sina * (
            sig_n + C * ssig_n * (c2sm_n + C * csig_n
                                  * (-1.0 + 2.0 * c2sm_n ** 2)))
        upd = active
        sig = np.where(upd, sig_n, sig)
        ssig = np.where(upd, ssig_n, ssig)
        csig = np.where(upd, csig_n, csig)
        cos2a = np.where(upd, cos2a_n, cos2a)
        c2sm = np.where(upd, c2sm_n, c2sm)
        conv = np.abs(lam_new - lam) < 1e-13
        lam = np.where(upd, lam_new, lam)
        active = active & ~conv
        if not active.any():
            break
    u2 = cos2a * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2
                                             * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsig = B * ssig * (c2sm + B / 4.0 * (
        csig * (-1.0 + 2.0 * c2sm ** 2)
        - B / 6.0 * c2sm * (-3.0 + 4.0 * ssig ** 2)
        * (-3.0 + 4.0 * c2sm ** 2)))
    dist = b * A * (sig - dsig)
    if active.any():
        fb = haversine_m(lon1, lat1, lon2, lat2) * (1.0 + f / 2.0)
        dist = np.where(active, fb, dist)
    return dist
