"""General polygon boolean operations (union / intersection / difference /
symmetric difference) via vertical-slab trapezoidal decomposition.

The reference outsources overlay to GEOS (c/sedona-geos overlay.rs); this
is an independent from-scratch implementation of the classic scanline
decomposition (public textbook technique):

1. split the x-axis at every vertex x and every A-edge×B-edge intersection
   x → within a slab no two edges cross;
2. per slab, sort the active edges by their y at the slab midpoint and
   sweep top-down accumulating even-odd parity for A and B separately;
3. bands where ``op(inside_A, inside_B)`` holds become trapezoids;
   horizontally mergeable trapezoids (matching shared vertical edge)
   are dissolved greedily.

The result is *region-exact*: area, point membership, and any further
boolean/predicate operation agree with the mathematical result; the ring
decomposition is a trapezoid tiling rather than GEOS's minimal-vertex
form (documented trade-off; rings may share boundary segments, which
even-odd semantics handle consistently).
"""

from __future__ import annotations

import numpy as np

from sedona_db_spark.geometry import kernels as K

OPS = {
    "union": lambda a, b: a or b,
    "intersection": lambda a, b: a and b,
    "difference": lambda a, b: a and not b,
    "symdifference": lambda a, b: a != b,
}


def _rings_of(g) -> list:
    if g is None:
        return []
    if g[0] == "Polygon":
        return list(g[1])
    if g[0] == "MultiPolygon":
        return [r for rings in g[1] for r in rings]
    if g[0] == "GeometryCollection":
        return [r for p in g[1] for r in _rings_of(p)]
    return []


def _edges_of(rings) -> np.ndarray:
    """(n, 4) array of segments x1,y1,x2,y2 (closing edges included)."""
    segs = []
    for ring in rings:
        r = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
        n = len(r)
        for i in range(n):
            a, b = r[i], r[(i + 1) % n]
            if a[0] != b[0] or a[1] != b[1]:
                segs.append((a[0], a[1], b[0], b[1]))
    return np.array(segs, dtype=np.float64).reshape(-1, 4)


def _intersection_xs(ea: np.ndarray, eb: np.ndarray) -> list:
    """x coordinates of proper A-edge × B-edge intersections."""
    out = []
    for x1, y1, x2, y2 in ea:
        for x3, y3, x4, y4 in eb:
            if max(x1, x2) < min(x3, x4) or max(x3, x4) < min(x1, x2):
                continue
            d1x, d1y = x2 - x1, y2 - y1
            d2x, d2y = x4 - x3, y4 - y3
            denom = d1x * d2y - d1y * d2x
            if denom == 0:
                continue
            t = ((x3 - x1) * d2y - (y3 - y1) * d2x) / denom
            u = ((x3 - x1) * d1y - (y3 - y1) * d1x) / denom
            if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                out.append(x1 + t * d1x)
    return out


def boolean_op(gA, gB, op: str):
    """Region-exact boolean op on polygonal geometries → MultiPolygon/
    Polygon/empty GeometryCollection."""
    fn = OPS[op]
    ra, rb = _rings_of(gA), _rings_of(gB)
    if not ra and not rb:
        return ("GeometryCollection", [])
    ea, eb = _edges_of(ra), _edges_of(rb)

    xs = []
    for e in (ea, eb):
        if len(e):
            xs.extend(e[:, 0].tolist())
            xs.extend(e[:, 2].tolist())
    xs.extend(_intersection_xs(ea, eb))
    # SELF-intersections too: invalid (bowtie) inputs cross within one
    # geometry; without these split points a slab would contain crossing
    # edges and the even-odd bands would be nonsense (ST_MakeValid path)
    if len(ea):
        xs.extend(_intersection_xs(ea, ea))
    if len(eb):
        xs.extend(_intersection_xs(eb, eb))
    xs = np.unique(np.asarray(xs, dtype=np.float64))
    if len(xs) < 2:
        return ("GeometryCollection", [])

    # per-slab trapezoid bands: slab -> list of (ylo_l, ylo_r, yhi_l, yhi_r)
    slabs: list[tuple[float, float, list]] = []
    for k in range(len(xs) - 1):
        x0, x1 = float(xs[k]), float(xs[k + 1])
        if x1 - x0 <= 0:
            continue
        xm = (x0 + x1) / 2.0
        rows = []  # (ym, y_at_x0, y_at_x1, is_A)
        for e, is_a in ((ea, True), (eb, False)):
            if not len(e):
                continue
            exmin = np.minimum(e[:, 0], e[:, 2])
            exmax = np.maximum(e[:, 0], e[:, 2])
            act = (exmin <= x0 + 0.0) & (exmax >= x1) & (e[:, 0] != e[:, 2])
            for x1e, y1e, x2e, y2e in e[act]:
                # endpoint-snapped evaluation: two edges meeting at a vertex
                # must produce the IDENTICAL float there, or the dissolved
                # boundary graph fails to close (1-ulp interpolation drift)
                def yat(xq):
                    if xq == x1e:
                        return y1e
                    if xq == x2e:
                        return y2e
                    return y1e + (xq - x1e) / (x2e - x1e) * (y2e - y1e)
                rows.append((yat(xm), yat(x0), yat(x1), is_a))
        if not rows:
            continue
        rows.sort(key=lambda r: r[0])
        in_a = in_b = False
        inside = False
        band_start = None  # (y_l, y_r)
        bands = []
        for ym, yl, yr, is_a in rows:
            new_a, new_b = in_a ^ is_a, in_b ^ (not is_a)
            now = bool(fn(new_a, new_b))
            if now and not inside:
                band_start = (yl, yr)
            elif inside and not now:
                bands.append((band_start[0], band_start[1], yl, yr))
                band_start = None
            in_a, in_b, inside = new_a, new_b, now
        # merge vertically adjacent bands (collinear shared horizontal edges
        # toggle parity twice producing zero-gap splits)
        vbands: list = []
        for band in bands:
            if vbands and vbands[-1][2] == band[0] and vbands[-1][3] == band[1]:
                prev = vbands.pop()
                vbands.append((prev[0], prev[1], band[2], band[3]))
            else:
                vbands.append(band)
        if vbands:
            slabs.append((x0, x1, vbands))

    # greedy horizontal dissolve: merge a band into its left neighbor when
    # the shared vertical edge matches exactly
    quads = []  # each: [xl, xr, ylo_l, ylo_r, yhi_l, yhi_r]
    open_by_right: dict = {}
    for x0, x1, bands in slabs:
        new_open = {}
        for ylo_l, ylo_r, yhi_l, yhi_r in bands:
            key = (round(x0, 12), round(ylo_l, 12), round(yhi_l, 12))
            prev = open_by_right.pop(key, None)
            if prev is not None:
                # extend only if edges are collinear through the junction
                pxl, pxr, plo_l, plo_r, phi_l, phi_r = prev
                lo_slope_prev = (plo_r - plo_l) / (pxr - pxl)
                lo_slope_new = (ylo_r - ylo_l) / (x1 - x0)
                hi_slope_prev = (phi_r - phi_l) / (pxr - pxl)
                hi_slope_new = (yhi_r - yhi_l) / (x1 - x0)
                if (abs(lo_slope_prev - lo_slope_new) < 1e-12
                        and abs(hi_slope_prev - hi_slope_new) < 1e-12):
                    merged = [pxl, x1, plo_l, ylo_r, phi_l, yhi_r]
                    new_open[(round(x1, 12), round(ylo_r, 12), round(yhi_r, 12))] = merged
                    continue
                quads.append(prev)
            new_open[(round(x1, 12), round(ylo_r, 12), round(yhi_r, 12))] = \
                [x0, x1, ylo_l, ylo_r, yhi_l, yhi_r]
        quads.extend(open_by_right.values())
        open_by_right = new_open
    quads.extend(open_by_right.values())

    # minimal-vertex form: dissolve the tiling into boundary rings (round-2
    # upgrade; the trapezoid tiling remains the fallback if the boundary
    # graph fails to close on a degenerate input)
    from sedona_db_spark.geometry.dissolve import quads_to_polygons
    try:
        return quads_to_polygons(quads)
    except ValueError:
        pass

    polys = []
    for xl, xr, ylo_l, ylo_r, yhi_l, yhi_r in quads:
        pts = [(xl, ylo_l), (xr, ylo_r), (xr, yhi_r), (xl, yhi_l)]
        # drop duplicate consecutive points (triangle slivers at slab ends)
        ring = [pts[0]]
        for p in pts[1:]:
            if p != ring[-1]:
                ring.append(p)
        if len(ring) < 3:
            continue
        arr = np.array(ring + [ring[0]], dtype=np.float64)
        if abs(K._ring_area2(arr)) < 1e-24:
            continue
        polys.append([arr])
    if not polys:
        return ("GeometryCollection", [])
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def union_all(geoms: list):
    """N-way union: single decomposition pass over the concatenated rings
    (even-odd parity counts EACH geometry separately via or-fold)."""
    acc = None
    for g in geoms:
        if g is None:
            continue
        acc = g if acc is None else boolean_op(acc, g, "union")
    return acc if acc is not None else ("GeometryCollection", [])


def intersection_all(geoms: list):
    acc = None
    for g in geoms:
        if g is None:
            continue
        acc = g if acc is None else boolean_op(acc, g, "intersection")
        if acc[0] == "GeometryCollection" and not acc[1]:
            return acc
    return acc if acc is not None else ("GeometryCollection", [])
