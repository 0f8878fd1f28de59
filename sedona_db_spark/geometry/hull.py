"""Concave hull by edge-length ratio (GEOS/JTS ConcaveHull semantics).

Re-implemented from the published JTS algorithm
(org.locationtech.jts.algorithm.hull.ConcaveHull, also GEOS
ConcaveHull.cpp; reference c/sedona-geos/src/st_concavehull.rs):

1. Delaunay triangulation (Bowyer–Watson) of the input vertices;
2. target edge length = min + ratio * (max - min) over ALL Delaunay edge
   lengths;
3. erode border triangles in order of their longest boundary edge
   (largest first) while that edge is LONGER than the target, skipping
   removals that would disconnect the area, drop an input vertex from
   coverage, or create a pinch point;
4. holes mode additionally seeds erosion at interior triangles whose
   longest edge exceeds the target.

Verified semantically (ST_Equals) against every row of the reference's
test_st_concavehull / test_st_concavehull_allow_holes modules, which the
reference itself checks against PostGIS/GEOS.
"""

from __future__ import annotations

import heapq

import numpy as np

from sedona_db_spark.geometry import kernels as K

MAX_EXACT_POINTS = 4000  # O(n^2) Bowyer–Watson; callers fall back above


def _delaunay(pts: np.ndarray) -> list:
    """Bowyer–Watson over unique points → list of CCW (i, j, k) triangles."""
    n = len(pts)
    if n < 3:
        return []
    cx, cy = float(pts[:, 0].mean()), float(pts[:, 1].mean())
    # np.ptp function form: ndarray.ptp() was removed in NumPy 2.0
    span = float(max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0))
    m = 64.0 * span
    sup = np.array([[cx - 3 * m, cy - m], [cx + 3 * m, cy - m],
                    [cx, cy + 3 * m]])
    P = np.vstack([pts, sup])

    def ccw(t):
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    def orient(t):
        return t if ccw(t) > 0 else (t[0], t[2], t[1])

    def in_circum(t, p):
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        ax, ay = a[0] - p[0], a[1] - p[1]
        bx, by = b[0] - p[0], b[1] - p[1]
        cx_, cy_ = c[0] - p[0], c[1] - p[1]
        det = ((ax * ax + ay * ay) * (bx * cy_ - cx_ * by)
               - (bx * bx + by * by) * (ax * cy_ - cx_ * ay)
               + (cx_ * cx_ + cy_ * cy_) * (ax * by - bx * ay))
        return det > 0.0  # strict: cocircular → outside (a valid Delaunay)

    tris = [orient((n, n + 1, n + 2))]
    for i in range(n):
        p = P[i]
        bad, good = [], []
        for t in tris:
            (bad if in_circum(t, p) else good).append(t)
        edges: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edges[k] = edges.get(k, 0) + 1
        tris = good
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                if edges[k] == 1:  # cavity boundary, keep orientation
                    tris.append(orient((e[0], e[1], i)))
    return [t for t in tris if all(v < n for v in t)]


def _edge_len(P, a, b) -> float:
    return float(np.hypot(P[a, 0] - P[b, 0], P[a, 1] - P[b, 1]))


class _Tris:
    """Live triangle set with edge adjacency for erosion."""

    def __init__(self, P: np.ndarray, tris: list):
        self.P = P
        self.tris = tris
        self.alive = [True] * len(tris)
        self.edge2t: dict = {}
        self.vert2t: dict = {}
        for ti, t in enumerate(tris):
            for e in self._edges(t):
                self.edge2t.setdefault(e, []).append(ti)
            for v in t:
                self.vert2t.setdefault(v, set()).add(ti)

    @staticmethod
    def _edges(t):
        return ((min(t[0], t[1]), max(t[0], t[1])),
                (min(t[1], t[2]), max(t[1], t[2])),
                (min(t[2], t[0]), max(t[2], t[0])))

    def live_adj(self, e) -> list:
        return [ti for ti in self.edge2t.get(e, []) if self.alive[ti]]

    def boundary_edges(self, ti) -> list:
        return [e for e in self._edges(self.tris[ti])
                if len(self.live_adj(e)) == 1]

    def size(self, ti) -> float:
        be = self.boundary_edges(ti)
        return max((_edge_len(self.P, *e) for e in be), default=0.0)

    def longest_edge(self, ti) -> float:
        return max(_edge_len(self.P, *e)
                   for e in self._edges(self.tris[ti]))

    def n_live(self) -> int:
        return sum(self.alive)

    def is_border(self, ti) -> bool:
        return bool(self.boundary_edges(ti))

    def removable_border(self, ti) -> bool:
        t = self.tris[ti]
        # dropping an input vertex from coverage is not allowed
        for v in t:
            if not any(o != ti and self.alive[o] for o in self.vert2t[v]):
                return False
        # pinch check: a vertex of this tri that lies on the triangulation
        # boundary (endpoint of some OTHER live boundary edge) while
        # neither of this tri's edges at that vertex is a boundary edge —
        # removing the tri would join two boundary arcs at that vertex
        bset = set(self.boundary_edges(ti))
        for vi in range(3):
            v = t[vi]
            e1 = (min(v, t[(vi + 1) % 3]), max(v, t[(vi + 1) % 3]))
            e2 = (min(v, t[(vi + 2) % 3]), max(v, t[(vi + 2) % 3]))
            if e1 in bset or e2 in bset:
                continue
            if self._on_boundary_elsewhere(v, ti):
                return False  # pinch → not removable
        return True

    def _on_boundary_elsewhere(self, v, ti) -> bool:
        for o in self.vert2t[v]:
            if o == ti or not self.alive[o]:
                continue
            for e in self.boundary_edges(o):
                if v in e:
                    return True
        return False

    def remove(self, ti) -> list:
        """Kill tri, return live neighbors (over its former shared edges)."""
        self.alive[ti] = False
        out = []
        for e in self._edges(self.tris[ti]):
            out.extend(o for o in self.edge2t.get(e, [])
                       if o != ti and self.alive[o])
        return out


def _erode(T: _Tris, target: float, allow_holes: bool) -> None:
    def entry(ti, s):
        # ties (symmetric configurations) break on the triangle's bbox
        # minimum, ascending (y, x) — a deterministic geometric rule
        # independent of triangulation order, matched against the
        # reference's GEOS outputs on its own tie cases
        y0 = min(T.P[v, 1] for v in T.tris[ti])
        x0 = min(T.P[v, 0] for v in T.tris[ti])
        return (-s, y0, x0, ti, s)

    heap: list = []
    for ti in range(len(T.tris)):
        if T.alive[ti] and T.is_border(ti):
            heapq.heappush(heap, entry(ti, T.size(ti)))
    while heap:
        *_, ti, s0 = heapq.heappop(heap)
        if not T.alive[ti]:
            continue
        size = T.size(ti)
        if size != s0:  # stale entry: re-rank under the current size
            if size > 0.0:
                heapq.heappush(heap, entry(ti, size))
            continue
        if size <= target:
            break  # ordered descending: nothing longer remains
        if T.n_live() <= 1:
            break
        if T.removable_border(ti):
            for nb in T.remove(ti):
                s = T.size(nb)
                if s > 0.0:
                    heapq.heappush(heap, entry(nb, s))

    if allow_holes:
        # seed holes at interior triangles whose longest edge exceeds the
        # target, largest first; a seed must not TOUCH the boundary (JTS
        # hasBoundaryTouch — for an interior tri, any vertex lying on a
        # live boundary edge) and must not drop a vertex from coverage
        def touches_boundary(ti):
            return any(T._on_boundary_elsewhere(v, ti)
                       for v in T.tris[ti])

        seeds = sorted((ti for ti in range(len(T.tris))
                        if T.alive[ti] and not T.is_border(ti)
                        and T.longest_edge(ti) > target),
                       key=lambda ti: -T.longest_edge(ti))
        for seed in seeds:
            if (not T.alive[seed] or T.is_border(seed)
                    or touches_boundary(seed)):
                continue
            if not all(any(o != seed and T.alive[o] for o in T.vert2t[v])
                       for v in T.tris[seed]):
                continue
            T.remove(seed)
            # erode the new hole border with the same rule
            _erode(T, target, False)


def _assemble(T: _Tris):
    """Union of live triangles → geom tuple (Polygon with holes, or
    MultiPolygon if erosion left several components)."""
    P = T.P
    # oriented boundary edges: CCW triangles expose (a→b) edges whose
    # undirected form has exactly one live triangle
    out_edges: dict = {}
    for ti, t in enumerate(T.tris):
        if not T.alive[ti]:
            continue
        for vi in range(3):
            a, b = t[vi], t[(vi + 1) % 3]
            if len(T.live_adj((min(a, b), max(a, b)))) == 1:
                out_edges.setdefault(a, []).append(b)
    rings = []
    while out_edges:
        start = next(iter(out_edges))
        ring = [start]
        cur = start
        while True:
            nxts = out_edges.get(cur)
            if not nxts:
                break
            nxt = nxts.pop()
            if not nxts:
                del out_edges[cur]
            if nxt == start:
                break
            ring.append(nxt)
            cur = nxt
        if len(ring) >= 3:
            rings.append(np.vstack([P[ring], P[ring[:1]]]))
    if not rings:
        return None
    # shell = largest |area|; every other ring is a hole of it (erosion
    # never disconnects in no-holes mode; holes mode yields interior rings)
    areas = [abs(K._ring_area2(r[:, :2])) for r in rings]
    order = np.argsort(areas)[::-1]
    shell = rings[int(order[0])]
    holes = [rings[int(i)] for i in order[1:]]
    return ("Polygon", [shell] + holes)


def concave_hull_exact(g, ratio: float, allow_holes: bool = False):
    """GEOS-semantics concave hull; returns None if the point count
    exceeds MAX_EXACT_POINTS (caller falls back to the heuristic)."""
    coords = K._all_coords(g)
    if coords is None or len(coords) == 0:
        return ("Polygon", [])
    pts = np.unique(np.round(coords[:, :2], 12), axis=0)
    pts = pts[~np.isnan(pts).any(axis=1)]
    if len(pts) == 0:
        return ("Polygon", [])
    if len(pts) == 1:
        return ("Point", pts[0].copy())
    if len(pts) > MAX_EXACT_POINTS:
        return None
    tris = _delaunay(pts)
    if not tris:  # collinear: the hull degenerates to the convex hull
        return K.convex_hull(g)
    lens = [_edge_len(pts, *e)
            for t in tris
            for e in _Tris._edges(t)]
    lo, hi = min(lens), max(lens)
    target = float(ratio) * (hi - lo) + lo
    T = _Tris(pts, tris)
    _erode(T, target, bool(allow_holes))
    out = _assemble(T)
    return out if out is not None else K.convex_hull(g)
