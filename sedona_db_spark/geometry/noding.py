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
    """x's of proper pairwise intersections within one edge set."""
    from sedona_db_spark.geometry.overlay import _intersection_xs
    if not len(e):
        return []
    return _intersection_xs(e, e)


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
    from sedona_db_spark.geometry.overlay import union_all
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
    out = union_all(traps)
    return out if out is not None else ("Polygon", [])


def arrangement_faces(segments) -> list:
    """Bounded faces of the arrangement of an undirected segment soup,
    each as a Polygon (holes included when a face surrounds another).

    Pieces are per-slab trapezoids between vertically consecutive edges;
    union-find links pieces across slab boundaries where their y-intervals
    overlap with positive length.  A face leaking past the first/last slab
    or into an uncovered interval is unbounded and dropped."""
    from sedona_db_spark.geometry.overlay import union_all
    segs = [tuple(map(float, s)) for s in segments
            if (s[0], s[1]) != (s[2], s[3])]
    if not segs:
        return []
    e = np.asarray(segs, dtype=np.float64)
    xs = np.unique(np.asarray(
        e[:, 0].tolist() + e[:, 2].tolist() + _pair_intersection_xs(e),
        dtype=np.float64))
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

    for k in range(len(slab_of) - 1):
        left_ps = slab_of[k]
        right_ps = slab_of[k + 1]
        # coverage check both directions; link overlapping intervals
        for pi in left_ps:
            lo, hi = interval_at(pi, right=True)
            covered = 0.0
            for pj in right_ps:
                lo2, hi2 = interval_at(pj, right=False)
                ov = min(hi, hi2) - max(lo, lo2)
                if ov > 1e-12 * max(1.0, abs(hi), abs(lo)):
                    link(pi, pj)
                    covered += max(0.0, ov)
            if hi - lo - covered > 1e-9 * max(1.0, hi - lo):
                unbounded.add(find(pi))
        for pj in right_ps:
            lo, hi = interval_at(pj, right=False)
            covered = sum(
                max(0.0, min(hi, interval_at(pi, True)[1])
                    - max(lo, interval_at(pi, True)[0]))
                for pi in left_ps)
            if hi - lo - covered > 1e-9 * max(1.0, hi - lo):
                unbounded.add(find(pj))
    # outermost slab boundaries always leak
    if slab_of:
        for pi in slab_of[0]:
            lo, hi = interval_at(pi, right=False)
            if hi - lo > 0:
                unbounded.add(find(pi))
        for pi in slab_of[-1]:
            lo, hi = interval_at(pi, right=True)
            if hi - lo > 0:
                unbounded.add(find(pi))

    groups: dict[int, list[int]] = {}
    for i in range(len(pieces)):
        groups.setdefault(find(i), []).append(i)
    faces = []
    for root, members in groups.items():
        if find(root) in {find(u) for u in unbounded}:
            continue
        traps = []
        for pi in members:
            _, x0, x1, ylo0, ylo1, yhi0, yhi1 = pieces[pi]
            t = _trap_poly(x0, x1, ylo0, ylo1, yhi0, yhi1)
            if t is not None:
                traps.append(t)
        if not traps:
            continue
        face = union_all(traps)
        if face is not None and face[0] in ("Polygon", "MultiPolygon"):
            if face[0] == "MultiPolygon":
                faces.extend(("Polygon", rings) for rings in face[1])
            else:
                faces.append(face)
    return faces
