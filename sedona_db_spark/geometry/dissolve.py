"""Dissolve a trapezoid tiling (overlay.py output) into minimal-vertex
polygon rings.

The slab decomposition guarantees two structural facts this exploits:

1. Non-vertical (top/bottom) edges are NEVER shared between two trapezoids
   — vertically adjacent bands with identical interfaces are merged during
   decomposition — so they are boundary edges as-is.
2. Vertical edges can partially overlap between the trapezoids left and
   right of a slab border; per distinct x, a 1-D interval sweep keeps only
   the net boundary (+1 = region to the west ends here, -1 = begins).

Boundary edges are directed with the region on the LEFT (trapezoids emit
CCW rings), so face tracing with a sharpest-left-turn rule at junction
vertices yields simple rings: outer boundaries CCW (positive signed area),
holes CW.  Collinear through-vertices are then removed (minimal form) and
holes are assigned to the smallest enclosing outer ring.

This replaces the trapezoid-tiling output form the round-1 VERDICT noted
as the documented approximation of ST_Union/Intersection/Difference/
SymDifference (the reference gets minimal form from GEOS overlayng).
"""

from __future__ import annotations

import math

import numpy as np


def _collect_boundary_edges(quads) -> list:
    """Directed boundary edges [(p1, p2), ...] with region on the left."""
    verticals: dict = {}   # x -> list[(ylo, yhi, +1|-1)]  (+1 = east side up)
    edges: list = []
    for xl, xr, ylo_l, ylo_r, yhi_l, yhi_r in quads:
        if (yhi_l - ylo_l) <= 0 and (yhi_r - ylo_r) <= 0:
            continue  # degenerate band
        # bottom: left→right (region above/left); top: right→left
        if (xl, ylo_l) != (xr, ylo_r):
            edges.append(((xl, ylo_l), (xr, ylo_r)))
        if (xr, yhi_r) != (xl, yhi_l):
            edges.append(((xr, yhi_r), (xl, yhi_l)))
        # right: up (region west of it); left: down (region east of it)
        if yhi_r > ylo_r:
            verticals.setdefault(xr, []).append((ylo_r, yhi_r, +1))
        if yhi_l > ylo_l:
            verticals.setdefault(xl, []).append((ylo_l, yhi_l, -1))
    for x, ivals in verticals.items():
        ys = sorted({y for lo, hi, _ in ivals for y in (lo, hi)})
        events: dict = {}
        for lo, hi, sign in ivals:
            events[lo] = events.get(lo, 0) + sign
            events[hi] = events.get(hi, 0) - sign
        net = 0
        for y0, y1 in zip(ys[:-1], ys[1:]):
            net += events.get(y0, 0)
            if net > 0:      # up edge (east boundary of region to the west)
                edges.append(((x, y0), (x, y1)))
            elif net < 0:    # down edge
                edges.append(((x, y1), (x, y0)))
    return edges


def _trace_rings(edges: list) -> list:
    """Chain directed edges into closed rings (sharpest-left-turn rule at
    junction vertices keeps each ring on one face)."""
    out_of: dict = {}
    for a, b in edges:
        out_of.setdefault(a, []).append(b)
    used = set()
    rings = []
    for a0, b0 in edges:
        if (a0, b0) in used:
            continue
        ring = [a0, b0]
        used.add((a0, b0))
        cur, prev = b0, a0
        while cur != a0:
            cands = [p for p in out_of.get(cur, ())
                     if (cur, p) not in used]
            if not cands:
                # open chain: the boundary graph failed to close — caller
                # must fall back to the tiling form (NEVER drop area)
                raise ValueError("open boundary chain")
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # incoming direction; pick sharpest LEFT turn (max CCW
                # angle change keeps the region-left face closed)
                din = math.atan2(cur[1] - prev[1], cur[0] - prev[0])
                best, best_key = None, None
                for p in cands:
                    dout = math.atan2(p[1] - cur[1], p[0] - cur[0])
                    turn = (dout - din + math.pi) % (2 * math.pi)
                    key = turn  # 0 = U-turn … 2π; larger = harder left
                    if best is None or key > best_key:
                        best, best_key = p, key
                nxt = best
            used.add((cur, nxt))
            ring.append(nxt)
            prev, cur = cur, nxt
        if ring is not None:
            rings.append(ring)
    return rings


def _simplify_ring(ring: list) -> np.ndarray | None:
    """Remove collinear through-vertices; returns closed (n,2) array."""
    pts = ring[:-1] if ring[0] == ring[-1] else ring
    n = len(pts)
    keep = []
    for i in range(n):
        a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
        cross = ((b[0] - a[0]) * (c[1] - b[1])
                 - (b[1] - a[1]) * (c[0] - b[0]))
        if cross != 0.0 or ((b[0] - a[0]) * (c[0] - b[0])
                            + (b[1] - a[1]) * (c[1] - b[1])) < 0:
            keep.append(b)
    if len(keep) < 3:
        return None
    return np.array(keep + [keep[0]], dtype=np.float64)


def _ring_area(arr: np.ndarray) -> float:
    x, y = arr[:-1, 0], arr[:-1, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _point_in_ring(px: float, py: float, arr: np.ndarray) -> bool:
    inside = False
    j = len(arr) - 2
    for i in range(len(arr) - 1):
        x1, y1 = arr[j]
        x2, y2 = arr[i]
        if (y1 > py) != (y2 > py):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xint:
                inside = not inside
        j = i
    return inside


def quads_to_polygons(quads):
    """Trapezoid list → geom tuple with minimal-vertex rings.

    Returns ("Polygon", rings) / ("MultiPolygon", [...]) / empty
    GeometryCollection.  Raises ValueError if the boundary graph fails to
    close (caller falls back to the trapezoid tiling)."""
    edges = _collect_boundary_edges(quads)
    if not edges:
        return ("GeometryCollection", [])
    rings = _trace_rings(edges)
    outers, holes = [], []
    for ring in rings:
        arr = _simplify_ring(ring)
        if arr is None:
            continue
        a = _ring_area(arr)
        if a == 0.0:
            continue
        (outers if a > 0 else holes).append(arr)
    if not outers:
        raise ValueError("dissolve produced no outer rings")
    # each hole → smallest outer ring containing a boundary midpoint
    polys = [[o] for o in outers]
    for h in holes:
        mid = ((h[0, 0] + h[1, 0]) / 2.0, (h[0, 1] + h[1, 1]) / 2.0)
        best_i, best_area = None, None
        for i, o in enumerate(outers):
            if _point_in_ring(mid[0], mid[1], o):
                a = _ring_area(o)
                if best_area is None or a < best_area:
                    best_i, best_area = i, a
        if best_i is None:
            raise ValueError("hole outside every outer ring")
        polys[best_i].append(h)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)
