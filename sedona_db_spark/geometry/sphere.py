"""Spherical (geography) predicate and distance kernels.

Great-circle semantics over lon/lat WKB geometries: edges are minor arcs
of great circles, polygon interiors are spherical polygons.  The reference
backs its geography type with S2 kernels
(/root/reference/c/sedona-s2geography/src/kernels.rs:27-51); these are
independent implementations of the published unit-vector formulations:

- arc × arc crossing: plane-side sign tests + on-arc verification of the
  candidate intersection directions (robust for minor arcs);
- point in spherical polygon: signed-angle winding sum (±2π inside, 0
  outside), valid for polygons not enclosing the test point's antipode;
- point → arc distance: cross-track distance clamped to the segment
  (along-track test), in meters on the mean sphere.

All kernels are numpy-vectorized over one geometry's edges; the pairwise
UDF layer loops geometries per batch like the planar kernels do.
"""

from __future__ import annotations

import numpy as np

from sedona_db_spark.geometry.algos import EARTH_RADIUS_M


def unit_vecs(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(n, 3) unit vectors from degree lon/lat."""
    lam, phi = np.radians(lon), np.radians(lat)
    cp = np.cos(phi)
    return np.stack([cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)], axis=-1)


def _norm(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-300)


def arc_angle(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Robust central angle between unit vectors (atan2 form)."""
    cross = np.linalg.norm(np.cross(u, v), axis=-1)
    dot = np.sum(u * v, axis=-1)
    return np.arctan2(cross, dot)


def point_arc_dist_m(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Great-circle distance (meters) from points p (n,3) to minor arc a→b."""
    n = _norm(np.cross(a, b))
    # along-track: is the closest point of the full circle within the arc?
    ta = np.cross(n, a)   # tangent at a toward b
    tb = np.cross(b, n)   # tangent at b toward a
    within = (p @ ta >= 0) & (p @ tb >= 0)
    cross_track = np.abs(np.arcsin(np.clip(p @ n, -1.0, 1.0)))
    d_end = np.minimum(arc_angle(p, a[None, :]), arc_angle(p, b[None, :]))
    return EARTH_RADIUS_M * np.where(within, cross_track, d_end)


def arcs_cross(a, b, c, d) -> bool:
    """Do minor arcs a→b and c→d share a point (crossing or touching)?"""
    n1 = np.cross(a, b)
    n2 = np.cross(c, d)
    t = np.cross(n1, n2)
    tl = np.linalg.norm(t)
    if tl < 1e-15:
        # coplanar arcs: overlap iff any endpoint lies on the other arc
        return bool(point_arc_dist_m(np.stack([a, b]), c, d).min() < 1e-3
                    or point_arc_dist_m(np.stack([c, d]), a, b).min() < 1e-3)
    t = t / tl
    for cand in (t, -t):
        if (_on_arc(cand, a, b, n1) and _on_arc(cand, c, d, n2)):
            return True
    return False


def _on_arc(t, a, b, n) -> bool:
    """Is direction t (already on the great circle of n) within minor arc
    a→b?  Wedge test via tangents (arcs < π)."""
    return bool(np.dot(t, np.cross(n, a)) >= -1e-15
                and np.dot(t, np.cross(b, n)) >= -1e-15)


def _ring_vecs(ring: np.ndarray) -> np.ndarray:
    r = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    v = unit_vecs(r[:, 0], r[:, 1])
    # drop consecutive duplicate unit vectors (e.g. lon -180 and +180
    # vertices of a polar ring are the SAME 3-D point — a zero-length
    # edge makes the crossing kernels degenerate)
    if len(v) > 1:
        keep = np.r_[True, arc_angle(v[1:], v[:-1]) > 1e-15]
        if not keep[0] or arc_angle(v[:1], v[-1:])[0] <= 1e-15:
            keep[0] = True
            keep[-1] = arc_angle(v[:1], v[-1:])[0] > 1e-15
        v = v[keep]
    return v


def _outside_ref(ring_v: np.ndarray) -> np.ndarray:
    """Outside reference point for the crossing-parity ray: the antipode
    of the ring centroid, always nudged along an irregular direction (the
    degenerate cases below); shared by the scalar AND vectorized parity
    kernels so they agree row-for-row."""
    q = -_norm(ring_v.sum(axis=0))
    # ALWAYS nudge along an irregular direction: rings built on regular
    # lon/lat grids otherwise put the p→q ray exactly through a vertex
    # (double-counted crossing), and p antipodal to q leaves the ray
    # undefined entirely (exact-pole query in a polar-cap ring).  The
    # nudge is ~0.046 rad — far smaller than the >=90° gap between a
    # hemisphere-fitting ring and its centroid antipode.
    t = np.cross(q, [0.5773502691896258, 0.211324865405187,
                     0.7886751345948129])
    if np.dot(t, t) < 1e-12:
        t = np.cross(q, [0.3247179572447461, 0.8794735288309245,
                         -0.3478103847799310])
    return _norm(q + 0.04567 * _norm(t))


def _left_witness(ring_v: np.ndarray) -> np.ndarray:
    """A point just inside the LEFT region of the directed ring: the
    midpoint of the longest edge, nudged ~0.64 m left of the travel
    direction (left of travel τ at m is m×τ — τ rotated +90° about m).
    Valid as long as the left region is locally thicker than the nudge at
    that midpoint (documented tolerance of the oriented tier)."""
    a = ring_v
    b = np.roll(ring_v, -1, axis=0)
    i = int(np.argmax(arc_angle(a, b)))
    m = _norm(a[i] + b[i])
    tau = _norm(b[i] - m * float(np.dot(m, b[i])))
    return _norm(m + 1e-7 * np.cross(m, tau))


def _left_contains_ref(ring_v: np.ndarray, q: np.ndarray) -> bool:
    """Whether the parity reference point q lies in the directed ring's
    LEFT region — decided once per ring by crossing-parity against the
    left witness, so every per-point query can reuse the (vectorized)
    parity kernels regardless of how large the interior is."""
    w = _left_witness(ring_v)
    if arc_angle(w[None, :], q[None, :])[0] < 1e-12:
        return True
    a = ring_v
    b = np.roll(ring_v, -1, axis=0)
    crossings = sum(arcs_cross(w, q, a[i], b[i]) for i in range(len(a)))
    return crossings % 2 == 0


def point_in_spherical_ring(p: np.ndarray, ring_v: np.ndarray,
                            oriented: bool = False) -> bool:
    """Containment of unit vector p in the spherical polygon bounded by
    ring_v (closed implicitly); boundary points count inside.

    Crossing parity along the minor arc from p to a reference point q (the
    nudged antipode of the ring's centroid direction).  Default mode takes
    q to be OUTSIDE — the smallest-polygon rule (the reference's own
    default: s2geography's WKT/WKB readers run with oriented=false and
    normalize to the smaller region; BigQuery GEOGRAPHY does the same), so
    the polygon must fit in a hemisphere.  ``oriented=True`` is the
    S2/full-sphere tier: the interior is the region to the LEFT of the
    directed ring (larger-than-hemisphere interiors and polar caps
    included) — q's own side is then determined per ring via
    _left_contains_ref instead of being assumed.  A winding-angle sum
    cannot distinguish p from its antipode, which is why both modes stay
    on crossing parity."""
    a = ring_v
    b = np.roll(ring_v, -1, axis=0)
    # boundary tolerance ~1 mm
    for i in range(len(a)):
        if point_arc_dist_m(p[None, :], a[i], b[i])[0] < 1e-3:
            return True
    q = _outside_ref(ring_v)
    q_in = _left_contains_ref(ring_v, q) if oriented else False
    if arc_angle(p[None, :], q[None, :])[0] < 1e-12:
        return q_in  # p IS the reference point
    crossings = sum(arcs_cross(p, q, a[i], b[i]) for i in range(len(a)))
    return (crossings % 2 == 1) != q_in


def _geom_arcs(g):
    """List of (a, b) unit-vector pairs for every edge of g (rings closed)."""
    out = []
    name, payload = g
    if name in ("LineString",):
        v = unit_vecs(payload[:, 0], payload[:, 1])
        out += [(v[i], v[i + 1]) for i in range(len(v) - 1)]
    elif name == "MultiLineString":
        for line in payload:
            v = unit_vecs(line[:, 0], line[:, 1])
            out += [(v[i], v[i + 1]) for i in range(len(v) - 1)]
    elif name == "Polygon":
        for ring in payload:
            v = _ring_vecs(ring)
            out += [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))]
    elif name == "MultiPolygon":
        for rings in payload:
            for ring in rings:
                v = _ring_vecs(ring)
                out += [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))]
    return out


def _geom_points(g) -> np.ndarray | None:
    from sedona_db_spark.geometry import kernels as K
    c = K._all_coords(g)
    if c is None or not len(c):
        return None
    return unit_vecs(c[:, 0], c[:, 1])


def point_in_geog(p: np.ndarray, g, oriented: bool = False) -> bool:
    """Unit vector p inside/on geometry g under spherical semantics.

    ``oriented=True`` (S2 tier): every ring's interior is the region to
    its LEFT, and a polygon's interior is the intersection of its rings'
    left regions — an outer CCW shell with CW holes reproduces shell-minus-
    holes, while a single CW ring expresses the larger-than-hemisphere
    complement (e.g. world-minus-cap), which the default smallest-polygon
    rule cannot represent."""
    name, payload = g
    if name == "Point":
        return bool(arc_angle(p[None, :], unit_vecs(
            np.array([payload[0]]), np.array([payload[1]])))[0] < 1e-12)
    if name == "MultiPoint":
        v = unit_vecs(payload[:, 0], payload[:, 1])
        return bool(arc_angle(np.broadcast_to(p, v.shape), v).min() < 1e-12)
    if name in ("LineString", "MultiLineString"):
        return any(point_arc_dist_m(p[None, :], a, b)[0] < 1e-3
                   for a, b in _geom_arcs(g))
    if name == "Polygon":
        rings = payload
        if not rings:
            return False
        if oriented:
            return all(point_in_spherical_ring(p, _ring_vecs(r),
                                               oriented=True)
                       for r in rings)
        if not point_in_spherical_ring(p, _ring_vecs(rings[0])):
            return False
        return not any(point_in_spherical_ring(p, _ring_vecs(h))
                       and not _on_ring_boundary(p, h) for h in rings[1:])
    if name == "MultiPolygon":
        return any(point_in_geog(p, ("Polygon", rings), oriented)
                   for rings in payload)
    if name == "GeometryCollection":
        return any(point_in_geog(p, q, oriented) for q in payload)
    return False


def _on_ring_boundary(p: np.ndarray, ring: np.ndarray) -> bool:
    v = _ring_vecs(ring)
    return any(point_arc_dist_m(p[None, :], v[i], v[(i + 1) % len(v)])[0] < 1e-3
               for i in range(len(v)))


def geog_intersects(g1, g2, oriented: bool = False) -> bool:
    """Spherical ST_Intersects for Point/Line/Polygon combos.

    oriented=True evaluates polygon interiors under the S2 full-sphere
    rule (region left of each directed ring) instead of the default
    smallest-polygon rule."""
    if g1 is None or g2 is None:
        return False
    for a, b in ((g1, g2), (g2, g1)):
        if a[0] in ("Point", "MultiPoint"):
            pts = _geom_points(a)
            return pts is not None and any(point_in_geog(p, b, oriented)
                                           for p in pts)
    arcs1, arcs2 = _geom_arcs(g1), _geom_arcs(g2)
    for a, b in arcs1:
        for c, d in arcs2:
            if arcs_cross(a, b, c, d):
                return True
    # containment without boundary crossing
    p1, p2 = _geom_points(g1), _geom_points(g2)
    if p1 is not None and len(p1) and point_in_geog(p1[0], g2, oriented):
        return True
    if p2 is not None and len(p2) and point_in_geog(p2[0], g1, oriented):
        return True
    return False


def geog_contains(g1, g2, oriented: bool = False) -> bool:
    """Spherical covers-style containment: every vertex of g2 inside g1
    and no boundary crossing (boundary-inclusive, i.e. ST_Covers)."""
    if g1 is None or g2 is None or g1[0] not in ("Polygon", "MultiPolygon"):
        return False
    pts = _geom_points(g2)
    if pts is None or not len(pts):
        return False
    if not all(point_in_geog(p, g1, oriented) for p in pts):
        return False
    if g2[0] in ("Point", "MultiPoint"):
        return True
    # edge midpoints must stay inside; boundary arcs must not properly cross
    for c, d in _geom_arcs(g2):
        mid = _norm((c + d) / 2.0)
        if not point_in_geog(mid, g1, oriented):
            return False
    return True


def _arcs_cross_vec(p: np.ndarray, q: np.ndarray, a: np.ndarray,
                    b: np.ndarray) -> np.ndarray:
    """Vectorized arcs_cross: does the minor arc p[i]→q cross arc a→b, for
    every row of p (n, 3)?  Coplanar rows fall back to the scalar kernel."""
    n1 = np.cross(p, q[None, :])
    n2 = np.cross(a, b)
    t = np.cross(n1, n2[None, :])
    tl = np.linalg.norm(t, axis=1)
    out = np.zeros(len(p), dtype=bool)
    ok = tl >= 1e-15
    if ok.any():
        tn = t[ok] / tl[ok][:, None]
        n1k, pk = n1[ok], p[ok]
        ta1 = np.cross(n1k, pk)           # tangent at p toward q
        tb1 = np.cross(q[None, :], n1k)   # tangent at q toward p
        ta2 = np.cross(n2, a)
        tb2 = np.cross(b, n2)
        hit = np.zeros(len(tn), dtype=bool)
        for c in (tn, -tn):
            on1 = (np.sum(c * ta1, axis=1) >= -1e-15) \
                & (np.sum(c * tb1, axis=1) >= -1e-15)
            on2 = (c @ ta2 >= -1e-15) & (c @ tb2 >= -1e-15)
            hit |= on1 & on2
        out[ok] = hit
    if (~ok).any():
        idx = np.flatnonzero(~ok)
        for i in idx:
            out[i] = arcs_cross(p[i], q, a, b)
    return out


def points_in_spherical_polygon(p: np.ndarray, rings: list,
                                oriented: bool = False) -> np.ndarray:
    """Vectorized point-in-spherical-polygon over unit vectors p (n, 3):
    crossing parity along the arc to each ring's reference point (antipode
    of the ring centroid — see point_in_spherical_ring).  oriented=True is
    the S2 full-sphere tier: interior = ∩ of the rings' LEFT regions."""
    def ring_parity(ring_v: np.ndarray, want_left: bool) -> np.ndarray:
        a = ring_v
        b = np.roll(ring_v, -1, axis=0)
        q = _outside_ref(ring_v)
        q_in = _left_contains_ref(ring_v, q) if want_left else False
        crossings = np.zeros(len(p), dtype=np.int64)
        for i in range(len(a)):
            crossings += _arcs_cross_vec(p, q, a[i], b[i])
        parity = (crossings % 2 == 1) != q_in
        # p coinciding with the reference point takes q's own side
        parity[arc_angle(p, q[None, :]) < 1e-12] = q_in
        return parity

    if not rings:
        return np.zeros(len(p), dtype=bool)
    if oriented:
        inside = ring_parity(_ring_vecs(rings[0]), True)
        for r in rings[1:]:
            inside &= ring_parity(_ring_vecs(r), True)
        return inside
    inside = ring_parity(_ring_vecs(rings[0]), False)
    for h in rings[1:]:
        inside &= ~ring_parity(_ring_vecs(h), False)
    return inside


def _ring_member_vec(p: np.ndarray, ring: np.ndarray,
                     oriented: bool = False):
    """Vectorized point_in_spherical_ring over unit vectors p (n, 3).
    Returns (member, on_boundary) so polygon hole semantics can mirror the
    scalar kernel (hole interior excludes, hole boundary stays inside)."""
    v = _ring_vecs(ring)
    a = v
    b = np.roll(v, -1, axis=0)
    onb = np.zeros(len(p), dtype=bool)
    for i in range(len(a)):
        onb |= point_arc_dist_m(p, a[i], b[i]) < 1e-3
    q = _outside_ref(v)
    q_in = _left_contains_ref(v, q) if oriented else False
    crossings = np.zeros(len(p), dtype=np.int64)
    for i in range(len(a)):
        crossings += _arcs_cross_vec(p, q, a[i], b[i])
    parity = (crossings % 2 == 1) != q_in
    parity[arc_angle(p, q[None, :]) < 1e-12] = q_in
    return onb | parity, onb


def points_in_geog(px: np.ndarray, py: np.ndarray, g,
                   oriented: bool = False) -> np.ndarray:
    """Vectorized point_in_geog over lon/lat arrays — agrees row-for-row
    with the scalar kernel so the broadcast join refine and the generic
    pairwise st_intersectssphere refine produce identical results."""
    p = unit_vecs(np.asarray(px, dtype=np.float64),
                  np.asarray(py, dtype=np.float64))
    name, payload = g
    if name == "Point":
        v = unit_vecs(np.array([payload[0]]), np.array([payload[1]]))
        return arc_angle(p, v) < 1e-12
    if name == "MultiPoint":
        out = np.zeros(len(p), dtype=bool)
        for row in payload:
            v = unit_vecs(np.array([row[0]]), np.array([row[1]]))
            out |= arc_angle(p, v) < 1e-12
        return out
    if name in ("LineString", "MultiLineString"):
        out = np.zeros(len(p), dtype=bool)
        for a, b in _geom_arcs(g):
            out |= point_arc_dist_m(p, a, b) < 1e-3
        return out
    if name == "Polygon":
        rings = payload
        if not rings:
            return np.zeros(len(p), dtype=bool)
        if oriented:
            inside, _ = _ring_member_vec(p, rings[0], oriented=True)
            for r in rings[1:]:
                mr, _ = _ring_member_vec(p, r, oriented=True)
                inside &= mr
            return inside
        inside, _ = _ring_member_vec(p, rings[0])
        for h in rings[1:]:
            mh, onb_h = _ring_member_vec(p, h)
            inside &= ~(mh & ~onb_h)
        return inside
    if name == "MultiPolygon":
        out = np.zeros(len(p), dtype=bool)
        for rings in payload:
            out |= points_in_geog(px, py, ("Polygon", rings), oriented)
        return out
    if name == "GeometryCollection":
        out = np.zeros(len(p), dtype=bool)
        for q in payload:
            out |= points_in_geog(px, py, q, oriented)
        return out
    return np.zeros(len(p), dtype=bool)


def points_to_geog_distance_m(px: np.ndarray, py: np.ndarray, g) -> np.ndarray:
    """Great-circle distance (m) from each lon/lat point to geometry g —
    vectorized over the points (the broadcast spherical join's refine
    kernel: arcs loop per edge, containment via the vectorized parity)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    p = unit_vecs(px, py)
    n = len(p)
    if g is None:
        return np.full(n, np.nan)
    name = g[0]
    if name in ("Point", "MultiPoint"):
        v = _geom_points(g)
        if v is None or not len(v):
            return np.full(n, np.nan)
        best = np.full(n, np.inf)
        for q in v:
            best = np.minimum(best, arc_angle(p, q[None, :]))
        return EARTH_RADIUS_M * best
    best = np.full(n, np.inf)
    for a, b in _geom_arcs(g):
        best = np.minimum(best, point_arc_dist_m(p, a, b))
    if name == "Polygon":
        best[points_in_spherical_polygon(p, g[1])] = 0.0
    elif name == "MultiPolygon":
        for rings in g[1]:
            best[points_in_spherical_polygon(p, rings)] = 0.0
    elif name == "GeometryCollection":
        for part in g[1]:
            best = np.minimum(best, points_to_geog_distance_m(px, py, part))
    return np.where(np.isfinite(best), best, np.nan)


def geog_distance_m(g1, g2) -> float:
    """Great-circle distance in meters between geometries (0 if they
    intersect under spherical semantics)."""
    if g1 is None or g2 is None:
        return float("nan")
    if geog_intersects(g1, g2):
        return 0.0
    best = np.inf
    p1, p2 = _geom_points(g1), _geom_points(g2)
    arcs1, arcs2 = _geom_arcs(g1), _geom_arcs(g2)
    if p1 is not None and len(p1):
        for a, b in arcs2:
            best = min(best, float(point_arc_dist_m(p1, a, b).min()))
        if p2 is not None and len(p2) and not arcs2:
            for q in p2:
                best = min(best, float(
                    EARTH_RADIUS_M * arc_angle(p1, q[None, :]).min()))
    if p2 is not None and len(p2):
        for a, b in arcs1:
            best = min(best, float(point_arc_dist_m(p2, a, b).min()))
        if p1 is not None and len(p1) and not arcs1 and not arcs2:
            pass  # point×point handled above
    return float(best) if np.isfinite(best) else float("nan")
