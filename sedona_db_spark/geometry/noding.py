"""Planar noding utilities: winding-region extraction and arrangement
faces over (possibly self-intersecting) segment soups.

Built on the same slab decomposition as ``overlay``: slab boundaries at
every endpoint x and every pairwise-intersection x, so edges never cross
strictly inside a slab; per-slab bands are trapezoids whose corners reuse
the overlay's endpoint-snapped interpolation (two edges meeting at a
vertex produce the identical float).

Consumers:
- ``winding_region``: GEOS 3.12+ single-sided buffer extraction — the
  directed offset curve's positive/negative-winding faces
  (c/sedona-geos/src/st_buffer.rs:648-668 documents the artifact-free
  semantics this reproduces).
- ``arrangement_faces``: full planar noding for ST_Polygonize — crossing
  edges are split at intersection points and every bounded face of the
  arrangement becomes a polygon, holes assigned by the face's own
  geometry (reference c/sedona-geos/src/st_polygonize_agg.rs semantics;
  dangles and cut edges bound no face and drop out naturally).
"""

from __future__ import annotations

import numpy as np


def _pair_intersection_xs(e: np.ndarray) -> list:
    """x's of proper pairwise intersections within one edge set
    (round 4: the chunked vectorized kernel, not the python double loop)."""
    from sedona_db_spark.geometry.overlay import _pairwise_intersection_xs_vec
    if not len(e):
        return []
    return _pairwise_intersection_xs_vec(e).tolist()


def _slab_rows(e: np.ndarray, x0: float, x1: float):
    """Edges fully spanning slab [x0, x1] (non-vertical), as
    (ym, y_at_x0, y_at_x1, idx) sorted by mid-slab y."""
    xm = (x0 + x1) / 2.0
    exmin = np.minimum(e[:, 0], e[:, 2])
    exmax = np.maximum(e[:, 0], e[:, 2])
    act = (exmin <= x0) & (exmax >= x1) & (e[:, 0] != e[:, 2])
    rows = []
    for idx in np.flatnonzero(act):
        x1e, y1e, x2e, y2e = e[idx]

        def yat(xq):
            if xq == x1e:
                return y1e
            if xq == x2e:
                return y2e
            return y1e + (xq - x1e) / (x2e - x1e) * (y2e - y1e)

        rows.append((yat(xm), yat(x0), yat(x1), int(idx)))
    rows.sort(key=lambda r: r[0])
    return rows


def _trap_poly(x0, x1, ylo0, ylo1, yhi0, yhi1):
    if yhi0 - ylo0 <= 0 and yhi1 - ylo1 <= 0:
        return None
    ring = np.array([[x0, ylo0], [x1, ylo1], [x1, yhi1], [x0, yhi0],
                     [x0, ylo0]])
    return ("Polygon", [ring])


def winding_region(ring_pts: list, positive: bool | None = True):
    """Region of the plane where the winding number of the closed directed
    ring is > 0 (``positive=True``), < 0 (``False``), or != 0 (``None``,
    the nonzero rule), as Polygon/MultiPolygon.

    Winding accumulates along an upward sweep at each slab midpoint:
    crossing an edge directed rightward (dx > 0) adds +1, leftward -1 —
    the standard nonzero rule; self-crossing loops of the opposite
    orientation cancel to zero and vanish (no buffer artifacts)."""
    from sedona_db_spark.geometry.overlay import union_polygons
    pts = [tuple(p) for p in ring_pts]
    if len(pts) > 1 and pts[0] != pts[-1]:
        pts.append(pts[0])
    segs = []
    for a, b in zip(pts[:-1], pts[1:]):
        if a != b:
            segs.append((a[0], a[1], b[0], b[1]))
    if not segs:
        return ("Polygon", [])
    e = np.asarray(segs, dtype=np.float64)
    xs = np.unique(np.asarray(
        e[:, 0].tolist() + e[:, 2].tolist() + _pair_intersection_xs(e),
        dtype=np.float64))
    traps = []
    for k in range(len(xs) - 1):
        x0, x1 = float(xs[k]), float(xs[k + 1])
        if x1 - x0 <= 0:
            continue
        rows = _slab_rows(e, x0, x1)
        w = 0
        for i in range(len(rows) - 1):
            idx = rows[i][3]
            w += 1 if e[idx, 2] > e[idx, 0] else -1
            keep = (w != 0) if positive is None else \
                ((w > 0) if positive else (w < 0))
            if keep:
                t = _trap_poly(x0, x1, rows[i][1], rows[i][2],
                               rows[i + 1][1], rows[i + 1][2])
                if t is not None:
                    traps.append(t)
    if not traps:
        return ("Polygon", [])
    out = union_polygons(traps)
    return out if out is not None else ("Polygon", [])


def arrangement_faces(segments) -> list:
    """Bounded faces of the arrangement of an undirected segment soup,
    each as a Polygon (holes included when a face surrounds another).

    Pieces are per-slab trapezoids between vertically consecutive edges;
    union-find links pieces across slab boundaries where their y-intervals
    overlap with positive length.  A face leaking past the first/last slab
    or into an uncovered interval is unbounded and dropped."""
    from sedona_db_spark.geometry.overlay import union_polygons
    segs = [tuple(map(float, s)) for s in segments
            if (s[0], s[1]) != (s[2], s[3])]
    if not segs:
        return []
    e = np.asarray(segs, dtype=np.float64)
    xs = np.unique(np.asarray(
        e[:, 0].tolist() + e[:, 2].tolist() + _pair_intersection_xs(e),
        dtype=np.float64))
    # vertical edges close faces at slab boundaries: merged y-intervals per x
    vmap: dict[float, list] = {}
    for x1, y1, x2, y2 in e[e[:, 0] == e[:, 2]]:
        vmap.setdefault(float(x1), []).append((min(y1, y2), max(y1, y2)))
    for x, ivs in vmap.items():
        ivs.sort()
        merged = [list(ivs[0])]
        for lo, hi in ivs[1:]:
            if lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        vmap[x] = merged

    def _minus_cover(lo, hi, xb):
        """Sub-intervals of [lo, hi] NOT covered by vertical edges at xb."""
        out = []
        cur = lo
        for a, b in vmap.get(xb, []):
            if b <= cur or a >= hi:
                continue
            if a > cur:
                out.append((cur, a))
            cur = max(cur, b)
        if cur < hi:
            out.append((cur, hi))
        return out
    # pieces[i] = (slab_k, x0, x1, ylo0, ylo1, yhi0, yhi1)
    pieces = []
    slab_of: list[list[int]] = []
    for k in range(len(xs) - 1):
        x0, x1 = float(xs[k]), float(xs[k + 1])
        here = []
        if x1 - x0 > 0:
            rows = _slab_rows(e, x0, x1)
            for i in range(len(rows) - 1):
                lo, hi = rows[i], rows[i + 1]
                if hi[0] - lo[0] > 0:
                    here.append(len(pieces))
                    pieces.append((k, x0, x1, lo[1], lo[2], hi[1], hi[2]))
        slab_of.append(here)

    parent = list(range(len(pieces)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def link(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    unbounded: set = set()

    def interval_at(pi, right: bool):
        _, _, _, ylo0, ylo1, yhi0, yhi1 = pieces[pi]
        return (ylo1, yhi1) if right else (ylo0, yhi0)

    tol = 1e-9

    def boundary_pass(xb, these, those, these_right: bool):
        """At boundary x=xb: link pieces across it where their overlap is
        not blocked by a vertical edge; mark pieces whose open (vertical-
        edge-free) interval is not fully covered by neighbors as leaking
        into the unbounded face."""
        for pi in these:
            lo, hi = interval_at(pi, these_right)
            for sub_lo, sub_hi in _minus_cover(lo, hi, xb):
                covered = 0.0
                for pj in those:
                    lo2, hi2 = interval_at(pj, not these_right)
                    ov_lo, ov_hi = max(sub_lo, lo2), min(sub_hi, hi2)
                    if ov_hi - ov_lo > tol * max(1.0, abs(ov_hi)):
                        link(pi, pj)
                        covered += ov_hi - ov_lo
                if sub_hi - sub_lo - covered > tol * max(1.0, sub_hi - sub_lo):
                    unbounded.add(pi)

    for k in range(len(slab_of)):
        x0 = float(xs[k])
        x1 = float(xs[k + 1])
        left_neighbors = slab_of[k - 1] if k > 0 else []
        right_neighbors = slab_of[k + 1] if k + 1 < len(slab_of) else []
        boundary_pass(x0, slab_of[k], left_neighbors, these_right=False)
        boundary_pass(x1, slab_of[k], right_neighbors, these_right=True)

    groups: dict[int, list[int]] = {}
    for i in range(len(pieces)):
        groups.setdefault(find(i), []).append(i)
    unbounded_roots = {find(u) for u in unbounded}
    faces = []
    for root, members in groups.items():
        if find(root) in unbounded_roots:
            continue
        traps = []
        for pi in members:
            _, x0, x1, ylo0, ylo1, yhi0, yhi1 = pieces[pi]
            t = _trap_poly(x0, x1, ylo0, ylo1, yhi0, yhi1)
            if t is not None:
                traps.append(t)
        if not traps:
            continue
        face = union_polygons(traps)
        if face is not None and face[0] in ("Polygon", "MultiPolygon"):
            if face[0] == "MultiPolygon":
                faces.extend(_clean_rings(rings) for rings in face[1])
            else:
                faces.append(_clean_rings(face[1]))
    return [f for f in faces if f is not None]


def _clean_rings(rings):
    """Drop consecutive duplicate vertices the trapezoid dissolve can
    leave behind (slab corners coinciding with ring vertices)."""
    out = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        keep = np.r_[True, np.any(np.diff(r, axis=0) != 0, axis=1)]
        r = r[keep]
        if len(r) >= 2 and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        if len(r) >= 4:
            out.append(r)
    return ("Polygon", out) if out else None
