"""DE-9IM intersection matrices (ST_Relate).

Computes the 9-char DE-9IM string for point/line/area combinations using
the interior/boundary decomposition helpers from kernels.py: interiors
via strict containment + proper crossings, boundaries via rings/endpoints,
intersection dimensions via collinear-overlap vs isolated-point analysis.
Matches GEOS semantics (c/sedona-geos st_relate.rs) for the supported
type combinations (all Point/Line/Polygon pairs, Multi* included).
"""

from __future__ import annotations

import numpy as np

from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import algos as A


def _boundary_of(g):
    return A.boundary(g)


def _interior_dim(g) -> int:
    return K._dim_of(g)


def _pts_of(g):
    c = K._all_coords(g)
    return c[:, :2] if c is not None and len(c) else np.empty((0, 2))


def _pt_in_closed(x, y, g) -> bool:
    return bool(K.points_in_geom(np.array([x]), np.array([y]), g)[0])


def _pt_in_interior(x, y, g) -> bool:
    d = K._dim_of(g)
    if d == 2:
        return K._point_strictly_inside(x, y, g)
    if d == 1:
        return _pt_in_closed(x, y, g) and not K._is_line_endpoint(
            np.array([x, y]), g)
    # point geometry: interior == the points themselves
    return _pt_in_closed(x, y, g)


def _split_points(seg_a, seg_b, other):
    """Parameters splitting segment (seg_a→seg_b) at crossings with other's
    segments AND at other's vertices lying on the segment — collinear
    overlaps have no proper crossing, but the overlap ends where the other
    segment's endpoint sits (LINESTRING (0 0, 2 2) vs (1 1, 3 3) must split
    at t=0.5 or the outside half is invisible to midpoint sampling)."""
    ts = [0.0, 1.0]
    dx, dy = seg_b[0] - seg_a[0], seg_b[1] - seg_a[1]
    ll = dx * dx + dy * dy
    for b1, b2 in K._segments_of(other):
        t = K._seg_intersection_param(seg_a, seg_b, b1, b2)
        if t is not None:
            ts.append(t)
        if ll > 0:
            for v in (b1, b2):
                cross = dx * (v[1] - seg_a[1]) - dy * (v[0] - seg_a[0])
                if abs(cross) < 1e-12 * max(1.0, abs(dx) + abs(dy)):
                    tv = ((v[0] - seg_a[0]) * dx + (v[1] - seg_a[1]) * dy) / ll
                    if 0.0 < tv < 1.0:
                        ts.append(float(tv))
    return sorted(set(ts))


def _dim_char(d: int) -> str:
    return "F" if d < 0 else str(d)


def _gc_effective(g):
    """GEOS relates a GeometryCollection via the union of its components
    (mod-2 boundary semantics): a point coincident with a line absorbs into
    the line, overlapping lines merge, etc.  Our mixed-dimension overlay
    union IS that operation, so normalize GC operands through it
    (reference c/sedona-geos/src/st_relate.rs computes the same via GEOS)."""
    if g is None or g[0] != "GeometryCollection":
        return g
    from sedona_db_spark.geometry.overlay import union_all, _parts_of
    parts = _parts_of(g)
    if not parts:
        return g
    return union_all(parts)


def relate_matrix(a, b) -> str:
    """9-char DE-9IM string for (a, b)."""
    if a is None or b is None:
        return "FFFFFFFF2"
    a, b = _gc_effective(a), _gc_effective(b)
    da, db = K._dim_of(a), K._dim_of(b)

    out = {}

    # --- II ------------------------------------------------------------
    if K._interiors_intersect(a, b):
        if da == 2 and db == 2:
            out["II"] = 2
        elif min(da, db) == 0:
            out["II"] = 0
        else:  # 1-1 or 1-2
            if da == 1 and db == 1:
                shared = any(K._collinear_overlap(s1, s2, t1, t2)
                             for s1, s2 in K._segments_of(a)
                             for t1, t2 in K._segments_of(b))
                out["II"] = 1 if shared else 0
            else:
                out["II"] = 1
    else:
        out["II"] = -1

    # boundaries as geometries
    ba = _boundary_of(a)
    bb = _boundary_of(b)
    ba_empty = ba is None or K.num_points(ba) == 0
    bb_empty = bb is None or K.num_points(bb) == 0

    # --- IB: interior(a) ∩ boundary(b); dim capped by interior(a)'s dim ----
    if bb_empty:
        out["IB"] = -1
    elif da == 0:
        # 0-dim interior: which of a's points lie on b's boundary
        out["IB"] = 0 if any(_pt_in_closed(p[0], p[1], bb)
                             for p in _pts_of(a)) else -1
    else:
        out["IB"] = _set_vs_region_dim(
            bb, lambda x, y: _pt_in_interior(x, y, a),
            split_against=a, cap=min(1, da))
    # --- BI ----------------------------------------------------------------
    if ba_empty:
        out["BI"] = -1
    elif db == 0:
        out["BI"] = 0 if any(_pt_in_closed(p[0], p[1], ba)
                             for p in _pts_of(b)) else -1
    else:
        out["BI"] = _set_vs_region_dim(
            ba, lambda x, y: _pt_in_interior(x, y, b),
            split_against=b, cap=min(1, db))
    # --- BB ----------------------------------------------------------------
    if ba_empty or bb_empty:
        out["BB"] = -1
    else:
        out["BB"] = _boundary_boundary_dim(ba, bb)
    # --- IE: interior(a) ∩ exterior(b) --------------------------------------
    out["IE"] = _interior_exterior_dim(a, b, da)
    # --- BE ------------------------------------------------------------------
    out["BE"] = _set_vs_region_dim(ba, lambda x, y: not _pt_in_closed(x, y, b),
                                   split_against=b) if not ba_empty else -1
    # --- EI / EB --------------------------------------------------------------
    out["EI"] = _interior_exterior_dim(b, a, db)
    out["EB"] = _set_vs_region_dim(bb, lambda x, y: not _pt_in_closed(x, y, a),
                                   split_against=a) if not bb_empty else -1
    out["EE"] = 2

    return "".join(_dim_char(out[k])
                   for k in ("II", "IB", "IE", "BI", "BB", "BE", "EI", "EB", "EE"))


def _set_vs_region_dim(set_g, test, split_against, cap: int = 2) -> int:
    """Dim of {p ∈ set_g : test(p)} capped at ``cap`` (the other operand's
    point-set dimension bounds the intersection's dimension)."""
    if set_g is None:
        return -1
    d = K._dim_of(set_g)
    if d == 0 or cap == 0:
        pts = list(_pts_of(set_g))
        if d >= 1:
            # sample midpoints of split segments too (a 0-dim region can
            # meet a curve away from its vertices)
            for a, b in K._segments_of(set_g):
                for t in _split_points(a, b, split_against):
                    pts.append((a[0] + (b[0] - a[0]) * t,
                                a[1] + (b[1] - a[1]) * t))
        return 0 if any(test(p[0], p[1]) for p in pts) else -1
    best = -1
    for a, b in K._segments_of(set_g):
        ts = _split_points(a, b, split_against)
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 0:
                continue
            mx = a[0] + (b[0] - a[0]) * (t0 + t1) / 2
            my = a[1] + (b[1] - a[1]) * (t0 + t1) / 2
            if test(mx, my):
                return min(1, cap)
        # isolated crossing points
        for t in ts:
            px, py = a[0] + (b[0] - a[0]) * t, a[1] + (b[1] - a[1]) * t
            if test(px, py):
                best = max(best, 0)
    return best


def _boundary_boundary_dim(ba, bb) -> int:
    dda, ddb = K._dim_of(ba), K._dim_of(bb)
    if dda == 0 or ddb == 0:
        pa = _pts_of(ba if dda == 0 else bb)
        other = bb if dda == 0 else ba
        hit = any(bool(K.points_in_geom(np.array([p[0]]), np.array([p[1]]),
                                        other)[0]) for p in pa)
        return 0 if hit else -1
    shared = any(K._collinear_overlap(s1, s2, t1, t2)
                 for s1, s2 in K._segments_of(ba)
                 for t1, t2 in K._segments_of(bb))
    if shared:
        return 1
    touch = any(K._segments_intersect(s1, s2, t1, t2)
                for s1, s2 in K._segments_of(ba)
                for t1, t2 in K._segments_of(bb))
    return 0 if touch else -1


def _interior_exterior_dim(a, b, da) -> int:
    """Dim of interior(a) ∩ exterior(b)."""
    if da == 2:
        return -1 if K.geom_covers(b, a) else 2
    if da == 1:
        return _set_vs_region_dim(a, lambda x, y: not _pt_in_closed(x, y, b),
                                  split_against=b)
    pts = _pts_of(a)
    return 0 if any(not _pt_in_closed(p[0], p[1], b) for p in pts) else -1


def relate_pattern(a, b, pattern: str) -> bool:
    """DE-9IM pattern match: T=non-F, F=F, 0/1/2 exact, * any."""
    m = relate_matrix(a, b)
    if len(pattern) != 9:
        raise ValueError("DE-9IM pattern must be 9 characters")
    for got, want in zip(m, pattern.upper()):
        if want == "*":
            continue
        if want == "T" and got == "F":
            return False
        if want == "F" and got != "F":
            return False
        if want in "012" and got != want:
            return False
    return True
