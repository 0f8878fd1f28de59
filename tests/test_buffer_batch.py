"""Batched generic-buffer tier: the one-sided offset-curve decomposition
(`buffer._ring_offset_curve` + `buffer._rings_cross_info`) and the
flattened cross-row winding sweep
(`winding_batch.union_polygons_batch`) must reproduce the per-row
part-soup union EXACTLY — region-identical for the decomposition (same
nonzero-winding region through the same band merge), byte-identical for
the batch sweep (same slab grid, ordering, merges, dissolve).

Round-5 VERDICT item #1: the concave/generic ST_Buffer path was the one
surface >2x the reference's published number
(/root/reference/benchmarks/README.md:70-85)."""

import math

import numpy as np
import pandas as pd
import pytest

from sedona_db_spark.geometry import buffer as B
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.geometry.kernels import geom_area
from sedona_db_spark.geometry.overlay import (cancel_opposite_edges,
                                              union_edges, union_polygons)
from sedona_db_spark.geometry.winding_batch import union_polygons_batch


def rand_star(rng, n, cx=20.0, cy=20.0, rlo=2.0, rhi=8.0):
    """Random star-shaped (generically concave) SIMPLE ring, closed.

    Angles are cumulative positive gaps normalized to 2π, so the ring
    winds exactly once around (cx, cy) — a radial fan, simple by
    construction.  (Plain sorted-uniform angles can cluster in a narrow
    arc, leaving the center outside and the closing chord crossing the
    inner edges: a self-intersecting ring, where part-soup union and
    offset-curve winding legitimately differ.)"""
    gaps = rng.uniform(0.2, 1.0, n)
    th = 2 * np.pi * np.cumsum(gaps) / gaps.sum()
    r = rng.uniform(rlo, rhi, n)
    ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
    return np.vstack([ring, ring[:1]])


def _dist_center_to_ring(ring, cx=20.0, cy=20.0):
    a = ring[:-1]
    b = ring[1:]
    ab = b - a
    ln2 = (ab ** 2).sum(1)
    t = np.clip(((cx - a[:, 0]) * ab[:, 0]
                 + (cy - a[:, 1]) * ab[:, 1]) / ln2, 0, 1)
    px = a[:, 0] + t * ab[:, 0]
    py = a[:, 1] + t * ab[:, 1]
    return float(np.hypot(px - cx, py - cy).min())


def rand_concave_poly(rng, with_hole=False):
    shell = rand_star(rng, int(rng.integers(5, 14)))
    rings = [shell]
    if with_hole:
        # VALID polygon: hole must sit strictly inside the shell (a star
        # shell's chords cut inside its min vertex radius, so bound the
        # hole by the center-to-boundary distance, not by rlo)
        room = _dist_center_to_ring(shell)
        if room > 0.6:
            hole = rand_star(rng, int(rng.integers(4, 8)),
                             rlo=0.25 * room, rhi=0.7 * room)[::-1].copy()
            rings.append(hole)
    return ("Polygon", rings)


STYLES = (None, "join=mitre", "join=bevel", "quad_segs=3",
          "join=mitre mitre_limit=1.05")


def _double_sided_soup(poly, d, params):
    """The classic round-4 decomposition: polygon + both-sided ring
    bands (rects + wedges) — the semantic reference for the region."""
    name, payload = poly
    rings_sets = [payload] if name == "Polygon" else payload
    parts = [poly]
    for rings in rings_sets:
        for ring in rings:
            ring = B._dedupe_consecutive(np.asarray(ring, dtype=np.float64))
            if len(ring) < 3:
                continue
            closed = ring[:-1] if np.all(ring[0] == ring[-1]) else ring
            parts.extend(B._polyline_parts(closed, d, params, True))
    return parts


def test_band_edges_region_matches_double_sided_soup():
    rng = np.random.default_rng(42)
    for style in STYLES:
        p = B.parse_buffer_params(style)
        for k in range(8):
            poly = rand_concave_poly(rng, with_hole=(k % 3 == 0))
            d = float(rng.uniform(0.2, 1.5))
            route = B.buffer_route(poly, d, p)
            tag, val = route
            if tag == "geom":        # closed-form draw — covered below
                fast = val
            else:
                assert tag == "edges", f"expected edges route, got {tag}"
                e, xs = val
                fast = union_edges(e, cross_xs=xs)
            slow = union_polygons(_double_sided_soup(poly, d, p))
            assert geom_area(fast) == pytest.approx(geom_area(slow),
                                                    rel=0, abs=1e-9)


def test_band_edges_u_turn_spike_falls_back():
    """A ring with an exact U-turn spike is not one-sided-expressible;
    the router must fall back to the double-sided part soup."""
    ring = np.array([(0, 0), (10, 0), (5, 5), (10, 10), (0, 10),
                     (0, 0)], dtype=float)
    spike = np.array([(0, 0), (10, 0), (10, 10), (5, 5), (10, 10),
                      (0, 10), (0, 0)], dtype=float)
    p = B.parse_buffer_params(None)
    tag, _ = B.buffer_route(("Polygon", [ring]), 0.5, p)
    assert tag == "edges"
    tag2, _ = B.buffer_route(("Polygon", [spike]), 0.5, p)
    assert tag2 == "parts"
    # and the fallback still produces the right region
    res = B.geom_buffer_styled(("Polygon", [spike]), 0.5, None)
    assert geom_area(res) > geom_area(("Polygon", [ring]))


def test_union_polygons_batch_byte_identical_to_per_row():
    """The flattened cross-row sweep is the SAME computation as the
    per-row union — encoded output must be byte-equal, parts and edge
    rows mixed in one batch."""
    rng = np.random.default_rng(7)
    rows = []
    for k in range(30):
        poly = rand_concave_poly(rng, with_hole=(k % 4 == 0))
        d = float(rng.uniform(0.2, 1.5))
        p = B.parse_buffer_params(STYLES[k % len(STYLES)])
        tag, val = B.buffer_route(poly, d, p)
        if tag == "geom":
            continue
        rows.append(val)
        # also a raw part-soup row (line buffers exercise list rows)
        line = rng.uniform(0, 40, (int(rng.integers(3, 7)), 2))
        rows.append(B._polyline_parts(line, d, p, False))
    batch = union_polygons_batch(rows)
    for row, got in zip(rows, batch):
        if isinstance(row, tuple):
            want = union_edges(row[0], cross_xs=row[1])
        elif isinstance(row, np.ndarray):
            want = union_edges(row)
        else:
            want = union_polygons(row)
        assert W.encode(got) == W.encode(want)


def test_cancel_opposite_edges_winding_invariant():
    rng = np.random.default_rng(3)
    for _ in range(6):
        poly = rand_concave_poly(rng)
        d = float(rng.uniform(0.3, 1.0))
        p = B.parse_buffer_params(None)
        soup = _double_sided_soup(poly, d, p)
        from sedona_db_spark.geometry.overlay import _directed_edges_of
        e = _directed_edges_of(soup)
        kept = cancel_opposite_edges(e)
        assert len(kept) <= len(e)
        a1 = geom_area(union_edges(e))
        a2 = geom_area(union_edges(kept))
        assert a2 == pytest.approx(a1, rel=0, abs=1e-9)


def test_st_buffer_impl_batch_matches_per_row(monkeypatch):
    """End-to-end UDF parity: with the crossing-split tracer disabled,
    the batched _st_buffer_impl output must be byte-equal to per-row
    geom_buffer_styled for every row of a mixed batch (points, lines,
    convex, concave, holes, multis, nulls).  The tracer tier emits the
    same REGION in a different vertex order — its own differential gate
    lives in tests/test_ring_union.py and
    test_st_buffer_impl_tracer_region_parity below."""
    from sedona_db_spark.geometry import ring_union as RU
    monkeypatch.setattr(RU, "ENABLED", False)
    rng = np.random.default_rng(11)
    geoms, dists, styles = [], [], []

    def add(g, d, s=None):
        geoms.append(None if g is None else W.encode(g))
        dists.append(d)
        styles.append(s)

    add(None, 1.0)
    add(("Point", (3.0, 4.0)), 2.0)
    add(("Point", (3.0, 4.0)), 1.0, "endcap=square")
    add(("LineString", np.array([(0, 0), (5, 1), (3, 6)], float)), 0.7)
    for k in range(12):
        poly = rand_concave_poly(rng, with_hole=(k % 3 == 0))
        add(poly, float(rng.uniform(0.2, 1.2)), STYLES[k % len(STYLES)])
    mp = ("MultiPolygon", [rand_concave_poly(rng)[1],
                           rand_concave_poly(rng)[1]])
    add(mp, 0.5)
    add(("GeometryCollection",
         [("Point", (1.0, 1.0)),
          rand_concave_poly(rng)]), 0.6)

    from sedona_db_spark.functions.scalar import _st_buffer_impl
    got = _st_buffer_impl(pd.Series(geoms, dtype=object),
                          pd.Series(dists),
                          pd.Series(styles, dtype=object))
    for i, (gb, d, s) in enumerate(zip(geoms, dists, styles)):
        if gb is None:
            assert got[i] is None
            continue
        want = B.geom_buffer_styled(W.decode(gb), d, s)
        assert got[i] == W.encode(want), f"row {i} mismatch"


def test_st_buffer_impl_tracer_region_parity():
    """The crossing-split tracer tier (ring_union, round 7) must produce
    the SAME REGION as the winding sweep on the identical mixed batch —
    compared by area (the vertex order legitimately differs)."""
    from sedona_db_spark.geometry import ring_union as RU
    rng = np.random.default_rng(11)
    geoms, dists, styles = [], [], []

    def add(g, d, s=None):
        geoms.append(None if g is None else W.encode(g))
        dists.append(d)
        styles.append(s)

    add(("LineString", np.array([(0, 0), (5, 1), (3, 6)], float)), 0.7)
    for k in range(12):
        poly = rand_concave_poly(rng, with_hole=(k % 3 == 0))
        add(poly, float(rng.uniform(0.2, 1.2)), STYLES[k % len(STYLES)])
    add(("MultiPolygon", [rand_concave_poly(rng)[1],
                          rand_concave_poly(rng)[1]]), 0.5)
    add(("GeometryCollection",
         [("Point", (1.0, 1.0)),
          ("LineString", np.array([(0, 0), (2, 0.5), (1, 2)], float)),
          rand_concave_poly(rng)]), 0.6)

    from sedona_db_spark.functions.scalar import _st_buffer_impl
    f = getattr(_st_buffer_impl, "__wrapped__", _st_buffer_impl)
    old = RU.ENABLED
    try:
        RU.ENABLED = True
        on = f(pd.Series(geoms, dtype=object), pd.Series(dists),
               pd.Series(styles, dtype=object))
        RU.ENABLED = False
        off = f(pd.Series(geoms, dtype=object), pd.Series(dists),
                pd.Series(styles, dtype=object))
    finally:
        RU.ENABLED = old
    for i, (a, c) in enumerate(zip(on, off)):
        assert (a is None) == (c is None), f"row {i} null mismatch"
        if a is None:
            continue
        aa = geom_area(W.decode(bytes(a)))
        ac = geom_area(W.decode(bytes(c)))
        assert aa == pytest.approx(ac, rel=1e-9, abs=1e-9), f"row {i}"


def test_batch_convex_offset_matches_per_row():
    """Round-6 convex batch tier: cross-row flat trace must match the
    per-row geom_buffer_styled region (area parity; vertex order may
    rotate — the batch path emits the offset-curve trace)."""
    from sedona_db_spark.functions.scalar import _st_buffer_impl
    rng = np.random.default_rng(11)
    geoms, dists = [], []
    shapes = []
    for i in range(40):
        k = int(rng.integers(3, 12))
        # reference polygons_simple shape: regular k-gon, random start
        th0 = rng.uniform(0, 2 * np.pi)
        half = rng.uniform(0.5, 7.5)
        cx, cy = rng.uniform(0, 80), rng.uniform(0, 100)
        ang = th0 + np.arange(k) * (2 * np.pi / k)
        ring = np.column_stack([np.cos(ang) * half + cx,
                                np.sin(ang) * half + cy])
        if i % 3 == 0:
            ring = ring[::-1]          # CW input must be accepted too
        g = ("Polygon", [np.vstack([ring, ring[:1]])])
        shapes.append(g)
        geoms.append(W.encode(g))
        dists.append(float(rng.uniform(0.1, 4.0)))
    got = _st_buffer_impl(pd.Series(geoms, dtype=object), pd.Series(dists))
    for i, g in enumerate(shapes):
        res = W.decode(got[i])
        assert res[0] == "Polygon" and len(res[1]) == 1
        ring = res[1][0]
        assert np.all(ring[0] == ring[-1])          # closed WKB ring
        want = B.geom_buffer_styled(g, dists[i], None)
        assert geom_area(res) == pytest.approx(geom_area(want),
                                               rel=0, abs=1e-9)


def test_batch_convex_screen_rejections():
    """The strict screen must reject everything that is not a valid
    strictly convex simple ring — including a pentagram vertex order
    (all-left turns but total turning 4pi)."""
    p = B.parse_buffer_params(None)
    k = 5
    ang = np.arange(k) * (2 * np.pi / k)
    penta = np.column_stack([np.cos(ang), np.sin(ang)])
    star = penta[[0, 2, 4, 1, 3]]                    # winds twice
    cases = []
    cases.append(np.vstack([star, star[:1]]))
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    cases.append(np.vstack([sq, sq[1:2]]))           # not closed
    dup = np.array([[0, 0], [1, 0], [1, 0], [1, 1], [0, 1]], float)
    cases.append(np.vstack([dup, dup[:1]]))          # duplicate vertex
    nanring = np.array([[0, 0], [1, np.nan], [1, 1], [0, 1]], float)
    cases.append(np.vstack([nanring, nanring[:1]]))
    concave = np.array([[0, 0], [4, 0], [2, 1], [4, 4], [0, 4]], float)
    cases.append(np.vstack([concave, concave[:1]]))
    kmax = max(len(c) for c in cases)
    for c in cases:
        coords = np.full((1, len(c), 2), 0.0)
        coords[0] = c
        ok, pts, rs, rc, _clean = B.batch_convex_offset_rings(
            coords, np.array([0.5]), p)
        assert not ok[0], f"screen accepted invalid ring {c[:3]}"
    # and the pentagram ring end-to-end still yields the per-row result
    from sedona_db_spark.functions.scalar import _st_buffer_impl
    g = ("Polygon", [np.vstack([star, star[:1]])])
    got = _st_buffer_impl(pd.Series([W.encode(g)], dtype=object),
                          pd.Series([0.5]))
    want = B.geom_buffer_styled(g, 0.5, None)
    assert geom_area(W.decode(got[0])) == pytest.approx(
        geom_area(want), rel=0, abs=1e-9)


def test_polyline_offset_curve_matches_part_soup():
    """Round-6 open-polyline offset curve (GEOS getLineCurve shape): the
    curve's winding region must equal the rect+wedge soup union for
    every join/cap style, including self-overlapping random walks."""
    rng = np.random.default_rng(9)
    line_styles = STYLES + ("endcap=square", "endcap=flat")
    tested = 0
    for trial in range(120):
        nv = int(rng.integers(3, 11))
        hw = rng.uniform(0.3, 8.0)
        pts = np.column_stack([rng.uniform(0, hw, nv),
                               rng.uniform(0, hw, nv)])
        keepm = np.ones(len(pts), bool)
        keepm[1:] = (pts[1:] != pts[:-1]).any(axis=1)
        pts = pts[keepm]
        if len(pts) < 3:
            continue
        d = float(rng.uniform(0.2, 3.0))
        p = B.parse_buffer_params(line_styles[trial % len(line_styles)])
        c = B._polyline_offset_curve(pts, d, p)
        if c is None:
            continue
        tested += 1
        e, xs, simple = B._rings_cross_info([c])
        fast = union_edges(e, cross_xs=xs)
        slow = union_polygons(B._polyline_parts(pts, d, p, False))
        assert geom_area(fast) == pytest.approx(geom_area(slow),
                                                rel=0, abs=1e-9)
    assert tested > 80


def test_quad_merge_right_key_collision_keeps_both_quads():
    """Round-6 bug find: two bands converging to an identical right-edge
    signature (a bevel wedge riding a rect end edge, both collapsing to
    the same corner) used to OVERWRITE each other in the open-quad dict,
    silently dropping ~1.0 of area.  Exact minimal repro."""
    from sedona_db_spark.geometry.overlay import _directed_edges_of
    P1 = ("Polygon", [np.array(
        [[4.070669452354112, 1.520867145721324],
         [2.828383051113704, 1.2478706640126342],
         [2.1776626196908424, 4.20901191354904],
         [3.419949020931251, 4.48200839525773],
         [4.070669452354112, 1.520867145721324]])])
    P2 = ("Polygon", [np.array(
        [[3.7453092366426817, 3.001437770489527],
         [3.5962704605127183, 4.509992074485236],
         [4.070669452354112, 1.520867145721324],
         [3.7453092366426817, 3.001437770489527]])])
    e = _directed_edges_of([P1, P2])
    got = geom_area(union_edges(e))
    assert got == pytest.approx(3.9913104547410203, rel=0, abs=1e-9)
    # batch path: same fix, same answer
    got_b = geom_area(union_polygons_batch([[P1, P2]])[0])
    assert got_b == pytest.approx(3.9913104547410203, rel=0, abs=1e-9)


def test_collection_buffer_pooled_union_matches_per_child():
    """Pooled-soup collection route: area parity with per-child
    geom_buffer_styled + union; disjoint closed-form children take the
    no-sweep MultiPolygon path."""
    rng = np.random.default_rng(21)
    for trial in range(25):
        children = []
        nparts = int(rng.integers(1, 4))
        for j in range(nparts):
            cx = 30.0 * j
            cy = float(rng.uniform(0, 10))
            kind = int(rng.integers(0, 3))
            if kind == 0:
                children.append(("Point", (cx, cy)))
            elif kind == 1:
                pts = np.column_stack([rng.uniform(cx, cx + 4, 6),
                                       rng.uniform(cy, cy + 4, 6)])
                children.append(("LineString", pts))
            else:
                ang = rng.uniform(0, 2 * np.pi) + np.arange(8) * (np.pi / 4)
                ring = np.column_stack([np.cos(ang) * 3 + cx,
                                        np.sin(ang) * 3 + cy])
                children.append(("Polygon", [np.vstack([ring, ring[:1]])]))
        g = ("GeometryCollection", children)
        d = float(rng.uniform(0.3, 2.0))
        got = B.geom_buffer_styled(g, d, None)
        slow_parts = [B.geom_buffer_styled(q, d, None) for q in children]
        want = union_polygons([q for q in slow_parts if q is not None])
        assert geom_area(got) == pytest.approx(geom_area(want),
                                               rel=0, abs=1e-9)


def test_far_origin_buffer_dissolves_to_minimal_rings():
    """Round-6 review finding: the dissolve-integrity gate must scale its
    tolerance with coordinate magnitude — at projected-meter offsets
    (~1e7) the raw-coordinate shoelace noise is O(1) m^2 and a fixed
    1e-9-relative gate spuriously degraded correct dissolves to the
    sliver-quad MultiPolygon fallback."""
    rng = np.random.default_rng(1)
    for k in range(12):
        shell = rand_star(rng, int(rng.integers(6, 12)), cx=1.5e7, cy=8e6,
                          rlo=200.0, rhi=800.0)
        g = B.geom_buffer_styled(("Polygon", [shell]), 300.0, None)
        if g[0] == "MultiPolygon":
            assert len(g[1]) <= 2, f"sliver fallback: {len(g[1])} parts"


def test_clipped_reflex_closed_form_matches_soup():
    """Round-6 clipped reflex corners: when the clip-variant curve is
    globally simple it is returned as the buffer directly — region
    parity with the double-sided part soup across styles, hole-ful
    shapes and distances, and the closed form must actually fire for a
    healthy share of concave inputs (the whole point)."""
    rng = np.random.default_rng(42)
    closed = total = 0
    for trial in range(150):
        poly = rand_concave_poly(rng, with_hole=(trial % 3 == 0))
        d = float(rng.uniform(0.05, 1.5))
        p = B.parse_buffer_params(STYLES[trial % len(STYLES)])
        total += 1
        route = B.buffer_route(poly, d, p)
        if route[0] == "geom":
            closed += 1
        got = B.geom_buffer_styled(poly, d, p)
        slow = union_polygons(_double_sided_soup(poly, d, p))
        assert geom_area(got) == pytest.approx(geom_area(slow),
                                               rel=0, abs=1e-9)
    assert closed / total > 0.5, f"clip fast path fired {closed}/{total}"


def test_clipped_reflex_rejects_deep_buffers():
    """When d exceeds the local feature size the reflex clip falls out
    of the segment bounds — the route must fall back (dip curve + sweep)
    and stay region-exact."""
    ring = np.array([[0, 0], [10, 0], [5.0, 4.0], [10, 10], [0, 10],
                     [0, 0]], float)
    poly = ("Polygon", [ring])
    p = B.parse_buffer_params(None)
    got = B.geom_buffer_styled(poly, 3.0, p)   # deep: notch collapses
    slow = union_polygons(_double_sided_soup(poly, 3.0, p))
    assert geom_area(got) == pytest.approx(geom_area(slow),
                                           rel=0, abs=1e-9)


def test_clip_gate_self_intersecting_ring_inputs():
    """The reflex clip is winding-safe only for SIMPLE input rings: a
    self-intersecting ring can produce a simple clipped curve bounding
    the WRONG region (53/4000 adversarial random-walk rings pre-gate).
    With the input-simplicity gate, every closed-form result must match
    the part-soup union — including invalid inputs."""
    rng = np.random.default_rng(99)
    p = B.parse_buffer_params(None)
    checked = 0
    for trial in range(400):
        nv = int(rng.integers(4, 9))
        pts = np.cumsum(rng.uniform(-1.2, 1.2, (nv, 2)), axis=0)
        ring = np.vstack([pts, pts[:1]])
        d = float(rng.uniform(0.2, 1.5))
        poly = ("Polygon", [ring])
        route = B.buffer_route(poly, d, p)
        if route[0] != "geom":
            continue
        checked += 1
        r2 = B._dedupe_consecutive(np.asarray(ring, dtype=np.float64))
        cl = r2[:-1] if np.all(r2[0] == r2[-1]) else r2
        want = geom_area(union_polygons(
            [poly] + B._polyline_parts(cl, d, p, True)))
        assert geom_area(route[1]) == pytest.approx(want, rel=0, abs=1e-9)
    assert checked > 30


def test_clip_gate_flat_cap_line_counterexample():
    """Exact counterexample found by the property hunt: a short-edge
    mild-reflex 3-point line at d > edge length with a FLAT cap — the
    clipped curve is simple but bounds the wrong region (the excised
    lens is rescued only by round/square caps), so flat caps must never
    take the clip path."""
    pts = np.array([[0.20737419816436492, 0.6755566687224575],
                    [0.581181513062014, 1.1396583822116704],
                    [1.7716637283874985, 1.1075876586751454]])
    d = 0.8636410736298107
    p = B.parse_buffer_params("endcap=flat")
    got = B.geom_buffer_styled(("LineString", pts), d, p)
    want = geom_area(union_polygons(B._polyline_parts(pts, d, p, False)))
    assert geom_area(got) == pytest.approx(want, rel=0, abs=1e-9)
    # round/square caps on the same geometry may clip — and must agree
    for style in (None, "endcap=square"):
        p2 = B.parse_buffer_params(style)
        got2 = B.geom_buffer_styled(("LineString", pts), d, p2)
        want2 = geom_area(union_polygons(
            B._polyline_parts(pts, d, p2, False)))
        assert geom_area(got2) == pytest.approx(want2, rel=0, abs=1e-9)


def test_union_polygons_batch_chunked_matches_unchunked(monkeypatch):
    """CHUNK_EDGES-bounded row chunking (round 7) must be invisible:
    byte-identical encoded output for the same batch with chunking
    forced on (tiny budget) and off (huge budget)."""
    import sedona_db_spark.geometry.winding_batch as WB
    rng = np.random.default_rng(31)
    rows = []
    for k in range(40):
        parts = [rand_concave_poly(rng, with_hole=(k % 3 == 0))
                 for _ in range(int(rng.integers(1, 4)))]
        rows.append(parts)
    monkeypatch.setattr(WB, "CHUNK_EDGES", 10 ** 9)
    want = [W.encode(g) for g in union_polygons_batch(rows)]
    monkeypatch.setattr(WB, "CHUNK_EDGES", 64)
    got = [W.encode(g) for g in union_polygons_batch(rows)]
    assert got == want


def test_union_polygons_batch_windowed_sweep_matches_single_pass(
        monkeypatch):
    """SWEEP_MAX_INCIDENCE slab-windowing (round 7) must be invisible:
    byte-identical output with the incidence cap forced to a tiny value
    (many windows) vs effectively infinite (one window)."""
    import sedona_db_spark.geometry.winding_batch as WB
    rng = np.random.default_rng(77)
    rows = []
    for k in range(25):
        parts = [rand_concave_poly(rng, with_hole=(k % 4 == 0))
                 for _ in range(int(rng.integers(1, 4)))]
        rows.append(parts)
    monkeypatch.setattr(WB, "SWEEP_MAX_INCIDENCE", 10 ** 12)
    want = [W.encode(g) for g in union_polygons_batch(rows)]
    monkeypatch.setattr(WB, "SWEEP_MAX_INCIDENCE", 37)
    got = [W.encode(g) for g in union_polygons_batch(rows)]
    assert got == want


def test_ring_union_chunked_matches_unchunked(monkeypatch):
    """ring_union.CHUNK_EDGES chunking must be invisible (rows are
    independent): identical traced outputs and identical refusals."""
    from sedona_db_spark.geometry import ring_union as RU
    rng = np.random.default_rng(13)
    rows = []
    for k in range(40):
        rings = [np.asarray(rand_concave_poly(rng)[1][0][:-1], float)
                 for _ in range(int(rng.integers(1, 4)))]
        rows.append(rings)
    monkeypatch.setattr(RU, "CHUNK_EDGES", 10 ** 9)
    want = RU.union_rings_batch(rows)
    monkeypatch.setattr(RU, "CHUNK_EDGES", 32)
    got = RU.union_rings_batch(rows)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g is None) == (w is None)
        if g is not None:
            assert W.encode(g) == W.encode(w)


def _fuzz_ring(rng, cx, cy, scale):
    kind = int(rng.integers(0, 3))
    k = int(rng.integers(3, 10))
    if kind == 0:
        th = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = np.full(k, rng.uniform(0.4, 1.0) * scale)
    elif kind == 1:
        th = np.linspace(0, 2 * np.pi, k, endpoint=False)
        rad = np.where(np.arange(k) % 2 == 0, scale,
                       rng.uniform(0.25, 0.6) * scale)
    else:
        th = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.3, 1.2, k) * scale
    r = np.column_stack([np.cos(th) * rad + cx, np.sin(th) * rad + cy])
    return np.vstack([r, r[:1]])


def _fuzz_child(rng, cx, cy, scale):
    t = int(rng.integers(0, 6))
    if t == 0:
        return ("Point", (cx + rng.uniform(-scale, scale),
                          cy + rng.uniform(-scale, scale)))
    if t == 1:
        k = int(rng.integers(2, 8))
        pts = np.cumsum(rng.uniform(-scale, scale, (k, 2)), axis=0) \
            + [cx, cy]
        return ("LineString", pts)
    if t == 2:
        return ("Polygon", [_fuzz_ring(rng, cx, cy, scale)])
    if t == 3:
        m = int(rng.integers(2, 5))
        return ("MultiPoint", rng.uniform(-scale, scale, (m, 2))
                + [cx, cy])
    if t == 4:
        return ("MultiLineString",
                [np.cumsum(rng.uniform(-scale, scale,
                                       (int(rng.integers(2, 6)), 2)),
                           axis=0) + [cx + dx, cy]
                 for dx in (0.0, scale * 0.5)])
    return ("MultiPolygon",
            [[_fuzz_ring(rng, cx + dx, cy, scale * 0.7)]
             for dx in (0.0, scale * 0.6)])


def _translate(g, dx, dy):
    name, payload = g
    if name == "Point":
        return (name, (payload[0] + dx, payload[1] + dy))
    if name in ("LineString", "MultiPoint"):
        return (name, np.asarray(payload, float) + [dx, dy])
    if name in ("Polygon", "MultiLineString"):
        return (name, [np.asarray(r, float) + [dx, dy] for r in payload])
    if name == "MultiPolygon":
        return (name, [[np.asarray(r, float) + [dx, dy] for r in rings]
                       for rings in payload])
    return (name, [_translate(q, dx, dy) for q in payload])


def _first_vertex(g):
    name, payload = g
    if name == "Point":
        return np.asarray(payload, float)
    if name in ("LineString", "MultiPoint"):
        return np.asarray(payload, float)[0]
    if name in ("Polygon", "MultiLineString"):
        return np.asarray(payload[0], float)[0]
    if name == "MultiPolygon":
        return np.asarray(payload[0][0], float)[0]
    return _first_vertex(payload[0])


def test_fuzz_collections_touching_overlapping_children():
    """Round-7 standing fuzz (5,000 trials): mixed GeometryCollections
    whose children deliberately OVERLAP, exactly COINCIDE, mirror, or
    TOUCH at shared vertices — the pooled-collection buffer route's
    newest path.  The crossing-split tracer tiers must produce the same
    REGION as the winding-exact sweep (area parity on every row, point
    membership on a subsample).  The round-4 quad-merge bug class hid in
    exactly this kind of input for two rounds."""
    from sedona_db_spark.geometry import ring_union as RU
    from sedona_db_spark.functions.scalar import _st_buffer_impl
    f = getattr(_st_buffer_impl, "__wrapped__", _st_buffer_impl)
    rng = np.random.default_rng(20260818)
    N = 5_000
    geoms, dists = [], []
    for _ in range(N):
        cx, cy = rng.uniform(-5, 5, 2)
        scale = float(rng.uniform(0.4, 2.5))
        nk = int(rng.integers(1, 5))
        kids = []
        for _k in range(nk):
            # shared center => overlapping children are the COMMON case
            kid = _fuzz_child(rng, cx + rng.uniform(-scale, scale) * 0.5,
                              cy + rng.uniform(-scale, scale) * 0.5,
                              scale)
            kids.append(kid)
            roll = rng.random()
            if roll < 0.15:
                kids.append(kid)                    # exact duplicate
            elif roll < 0.30:
                kids.append(_translate(kid, 0.0, 0.0))  # coincident copy
            elif roll < 0.45 and len(kids) >= 2:
                # snap-translate: move so first vertices exactly touch
                v0 = _first_vertex(kids[0])
                v1 = _first_vertex(kid)
                kids.append(_translate(kid, float(v0[0] - v1[0]),
                                       float(v0[1] - v1[1])))
        geoms.append(W.encode(("GeometryCollection", kids)))
        dists.append(float(rng.choice([0.3, 1.0, 2.5])))
    b = pd.Series(geoms, dtype=object)
    d = pd.Series(dists)
    old = RU.ENABLED
    try:
        RU.ENABLED = True
        on = f(b, d)
        RU.ENABLED = False
        off = f(b, d)
    finally:
        RU.ENABLED = old
    mism = []
    probe_rng = np.random.default_rng(5)
    for i in range(N):
        a, c = on.iloc[i], off.iloc[i]
        assert (a is None) == (c is None), f"row {i} null"
        if a is None:
            continue
        ga, gc = W.decode(bytes(a)), W.decode(bytes(c))
        aa, ac = geom_area(ga), geom_area(gc)
        if not np.isclose(aa, ac, rtol=1e-9, atol=1e-9):
            mism.append((i, aa, ac))
            continue
        if i % 50 == 0:
            from tests.test_ring_union import geom_rings, membership
            rr = geom_rings(gc)
            if rr:
                allp = np.vstack(rr)
                pts = probe_rng.uniform(allp.min(0) - 0.5,
                                        allp.max(0) + 0.5, (12, 2))
                if not (membership(ga, pts) == membership(gc, pts)).all():
                    mism.append((i, "membership", None))
    assert not mism, f"{len(mism)} region mismatches: {mism[:5]}"


def test_buffer_input_simplify_idempotent_and_gated():
    """The clip gates pre-simplify and re-simplify inside the builders —
    sound only if simplification is idempotent; and inputs at or below
    the 64-vertex floor must pass through bit-identical."""
    rng = np.random.default_rng(23)
    for closed in (False, True):
        for co in (False, True):
            for _ in range(40):
                k = int(rng.integers(65, 160))
                th = np.sort(rng.uniform(0, 2 * np.pi, k))
                rad = 2.0 + rng.uniform(-0.15, 0.15, k)
                pts = np.column_stack([np.cos(th) * rad,
                                       np.sin(th) * rad])
                s1 = B.buffer_input_simplify(pts, 0.01, closed=closed,
                                             concave_only=co)
                s2 = B.buffer_input_simplify(s1, 0.01, closed=closed,
                                             concave_only=co)
                assert np.array_equal(s1, s2)
    small = np.array([[0, 0], [1, 0.001], [2, 0], [2, 2], [0, 2]],
                     dtype=float)
    assert B.buffer_input_simplify(small, 10.0) is small


def test_dense_simplified_buffer_matches_exact_soup_of_same_input():
    """Dense (>64-vertex) wiggly rings and lines route through the
    d/100 input simplification; the buffer output must equal the
    winding-EXACT union of the part soup built from the SAME simplified
    vertices (validates the clip/trace machinery on simplified inputs —
    the gates now test simplicity of the simplified geometry, which
    concave-shallow deletion can pinch into a self-crossing)."""
    rng = np.random.default_rng(41)
    p = B.parse_buffer_params(None)
    for trial in range(10):
        k = int(rng.integers(70, 110))
        th = np.linspace(0, 2 * np.pi, k, endpoint=False)
        rad = 2.0 + np.cumsum(rng.uniform(-0.08, 0.08, k))
        ring = np.column_stack([np.cos(th) * rad, np.sin(th) * rad])
        d = float(rng.uniform(0.3, 0.9))
        simp = B.buffer_input_simplify(ring, d / B._SIMPLIFY_FACTOR,
                                       closed=True, concave_only=True)
        got = B.geom_buffer_styled(
            ("Polygon", [np.vstack([ring, ring[:1]])]), d, p)
        want = union_polygons(
            [("Polygon", [np.vstack([simp, simp[:1]])])]
            + B._polyline_parts(simp, d, p, True))
        assert geom_area(got) == pytest.approx(geom_area(want),
                                               rel=0, abs=1e-9), trial
    for trial in range(10):
        k = int(rng.integers(70, 100))
        pts = np.cumsum(rng.uniform(-0.35, 0.35, (k, 2)), axis=0)
        d = float(rng.uniform(0.3, 0.9))
        simp = B.buffer_input_simplify(pts, d / B._SIMPLIFY_FACTOR)
        got = B.geom_buffer_styled(("LineString", pts), d, p)
        want = union_polygons(B._polyline_parts(simp, d, p, False))
        assert geom_area(got) == pytest.approx(geom_area(want),
                                               rel=0, abs=1e-9), trial


def _rand_collection(rng):
    """Random mixed GeometryCollection in the benchmark generator's
    style (1-4 children of every type incl. multis, overlapping)."""
    children = []
    for j in range(int(rng.integers(2, 5))):
        cx = float(rng.uniform(0, 30))
        cy = float(rng.uniform(0, 30))
        kind = int(rng.integers(0, 6))
        if kind == 0:
            children.append(("Point", (cx, cy)))
        elif kind == 1:
            k = int(rng.integers(2, 9))
            children.append(("LineString", np.column_stack(
                [rng.uniform(cx, cx + 6, k), rng.uniform(cy, cy + 6, k)])))
        elif kind == 2:
            ring = rand_star(rng, int(rng.integers(4, 10)), cx, cy, 1, 4)
            children.append(("Polygon", [ring]))
        elif kind == 3:
            children.append(("MultiPoint", rng.uniform(cx, cx + 5, (3, 2))))
        elif kind == 4:
            lines = [np.column_stack([rng.uniform(cx + 5 * m, cx + 5 * m + 4,
                                                  int(rng.integers(2, 7))),
                                      rng.uniform(cy, cy + 4,
                                                  0)])
                     for m in range(0)]
            k1 = int(rng.integers(2, 7))
            k2 = int(rng.integers(2, 7))
            children.append(("MultiLineString", [
                np.column_stack([rng.uniform(cx, cx + 4, k1),
                                 rng.uniform(cy, cy + 4, k1)]),
                np.column_stack([rng.uniform(cx + 3, cx + 7, k2),
                                 rng.uniform(cy + 3, cy + 7, k2)])]))
        else:
            r1 = rand_star(rng, 6, cx, cy, 1, 3)
            r2 = rand_star(rng, 6, cx + 5, cy, 1, 3)
            children.append(("MultiPolygon", [[r1], [r2]]))
    return ("GeometryCollection", children)


def test_buffer_route_batch_matches_per_row_routes():
    """buffer_route_batch must yield ROUTE-equivalent output to the
    per-row dispatcher on random mixed collections: identical tags and
    byte-identical geometry/edge payloads (the batched offset-curve
    builders are bitwise twins of the per-row ones)."""
    rng = np.random.default_rng(33)
    rows = []
    for _ in range(120):
        rows.append((_rand_collection(rng), float(rng.uniform(0.2, 2.5)),
                     B.parse_buffer_params(None)))
    got = B.buffer_route_batch(rows)
    for (g, d, p), rb in zip(rows, got):
        ra = B.buffer_route(g, d, p)
        assert (ra is None) == (rb is None)
        if ra is None:
            continue
        assert ra[0] == rb[0], (ra[0], rb[0])
        if ra[0] == "edges":
            ea, eb = ra[1][0], rb[1][0]
            assert ea.shape == eb.shape and np.array_equal(ea, eb)
        elif ra[0] == "parts":
            assert len(ra[1]) == len(rb[1])
            for qa, qb in zip(ra[1], rb[1]):
                if isinstance(qa, np.ndarray):
                    assert isinstance(qb, np.ndarray)
                    assert np.array_equal(qa, qb)
                else:
                    assert W.encode(qa) == W.encode(qb)
        else:
            assert W.encode(ra[1]) == W.encode(rb[1])


def test_offset_batch_builders_bitwise_match_per_row():
    """batch_ring_curves / batch_polyline_curves are byte-identical to
    _ring_offset_curve / _polyline_offset_curve across random inputs
    and every endcap style (round-join)."""
    from sedona_db_spark.geometry.offset_batch import (batch_polyline_curves,
                                                       batch_ring_curves)
    rng = np.random.default_rng(5)
    rings, rd = [], []
    for _ in range(150):
        rings.append(rand_star(rng, int(rng.integers(3, 14)),
                               float(rng.uniform(-40, 40)),
                               float(rng.uniform(-40, 40)), 0.5, 5.0))
        rd.append(float(rng.uniform(0.1, 3.0)))
    rings = [r[:-1] for r in rings]       # open, oriented
    p = B.parse_buffer_params(None)
    for rr, d, got in zip(rings, rd, batch_ring_curves(rings, rd, p)):
        ref = B._ring_offset_curve(rr, d, p)
        assert (ref is None) == (got is None)
        if ref is not None:
            assert np.array_equal(ref, got)
    lines, ld = [], []
    for _ in range(150):
        k = int(rng.integers(2, 12))
        lines.append(B._dedupe_consecutive(rng.uniform(-40, 40, (k, 2))))
        ld.append(float(rng.uniform(0.1, 3.0)))
    for cap in ("round", "square", "flat"):
        pc = B.parse_buffer_params(f"endcap={cap}")
        for rr, d, got in zip(lines, ld,
                              batch_polyline_curves(lines, ld, pc)):
            ref = B._polyline_offset_curve(rr, d, pc)
            assert (ref is None) == (got is None)
            if ref is not None:
                assert np.array_equal(ref, got)


def test_buffer_route_batch_toplevel_lines_match_per_row():
    """Top-level LineString/MultiLineString rows batch their clipped and
    raw curve construction; routes (tags + payload bytes, xs multiset)
    must equal the per-row dispatcher."""
    rng = np.random.default_rng(55)
    p = B.parse_buffer_params(None)
    rows = []
    for i in range(150):
        k = int(rng.integers(2, 11))
        if i % 3 == 0:
            ang = rng.uniform(0, 2 * np.pi) \
                + (2 * np.pi / max(k, 3)) * np.arange(k)
            r = rng.uniform(1, 8)
            pts = np.column_stack([np.cos(ang) * r, np.sin(ang) * r]) \
                + rng.uniform(-40, 40, 2)
            g = ("LineString", pts)
        elif i % 3 == 1:
            g = ("LineString", rng.uniform(-50, 50, (k, 2)))
        else:
            k2 = int(rng.integers(2, 8))
            g = ("MultiLineString", [rng.uniform(-50, 50, (k, 2)),
                                     rng.uniform(-30, 60, (k2, 2))])
        rows.append((g, float(rng.uniform(0.2, 4.0)), p))
    got = B.buffer_route_batch(rows)
    for (g, d, pp), rb in zip(rows, got):
        ra = B.buffer_route(g, d, pp)
        assert (ra is None) == (rb is None) and ra[0] == rb[0]
        if ra[0] == "edges":
            assert np.array_equal(ra[1][0], rb[1][0])
            xa, xb = ra[1][1], rb[1][1]
            assert (xa is None) == (xb is None)
            if xa is not None:
                assert np.array_equal(np.sort(xa), np.sort(xb))
        elif ra[0] == "geom":
            assert W.encode(ra[1]) == W.encode(rb[1])
        else:
            for qa, qb in zip(ra[1], rb[1]):
                if isinstance(qa, np.ndarray):
                    assert np.array_equal(qa, qb)
                else:
                    assert W.encode(qa) == W.encode(qb)


def test_offset_batch_clipped_builder_bitwise_matches_per_row():
    """batch_polyline_curves(clip=True) is byte-identical to
    _polyline_offset_curve(clip=True) incl. refusal (invalid clip)
    parity, over random tracks and reflex-heavy circle arcs."""
    from sedona_db_spark.geometry.offset_batch import batch_polyline_curves
    rng = np.random.default_rng(77)
    p = B.parse_buffer_params(None)
    lines, dl = [], []
    for i in range(200):
        k = int(rng.integers(2, 12))
        lines.append(B._dedupe_consecutive(rng.uniform(-50, 50, (k, 2))))
        dl.append(float(rng.uniform(0.1, 4.0)))
    for i in range(100):
        k = int(rng.integers(3, 11))
        ang = rng.uniform(0, 2 * np.pi) + (2 * np.pi / k) * np.arange(k)
        r = rng.uniform(1, 8)
        lines.append(np.column_stack([np.cos(ang) * r,
                                      np.sin(ang) * r])
                     + rng.uniform(-40, 40, 2))
        dl.append(float(rng.uniform(0.1, 3.0)))
    got = batch_polyline_curves(lines, dl, p, clip=True)
    for rr, d, g in zip(lines, dl, got):
        ref = B._polyline_offset_curve(rr, d, p, clip=True)
        assert (ref is None) == (g is None)
        if ref is not None:
            assert np.array_equal(ref, g)


def test_simplify_subset_vectorization_matches_sequential():
    """The vectorized even-offset-per-run deletion subset equals the
    original sequential greedy ("skip i == last+1") bit for bit."""
    def reference(pts, tol, closed, concave_only):
        cur = np.asarray(pts, dtype=np.float64)
        while True:
            n = len(cur)
            if n < (4 if closed else 3):
                return cur
            if closed:
                a = np.roll(cur, 1, axis=0); b = cur
                c = np.roll(cur, -1, axis=0)
            else:
                a, b, c = cur[:-2], cur[1:-1], cur[2:]
            cross = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                     - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
            chord = np.hypot(c[:, 0] - a[:, 0], c[:, 1] - a[:, 1])
            ok = chord > 0.0
            dev = np.abs(cross) / np.where(ok, chord, 1.0)
            kill = ok & (dev < tol)
            if concave_only:
                kill &= cross < 0.0
            if not bool(kill.any()):
                return cur
            keep = np.ones(n, dtype=bool)
            last = -2
            for i in np.flatnonzero(kill).tolist():
                if i == last + 1:
                    continue
                keep[i if closed else i + 1] = False
                last = i
            if closed and not keep[0] and kill[n - 1] and last == n - 1:
                keep[n - 1] = True
            if closed:
                excess = 3 - int(keep.sum())
                if excess > 0:
                    keep[np.flatnonzero(~keep)[-excess:]] = True
            nxt = cur[keep]
            if len(nxt) == len(cur):
                return cur
            cur = nxt

    rng = np.random.default_rng(91)
    for closed in (False, True):
        for co in (False, True):
            for trial in range(60):
                k = int(rng.integers(65, 300))
                # near-collinear chains with jitter force dense kill runs
                t = np.sort(rng.uniform(0, 1, k))
                if closed:
                    th = t * 2 * np.pi
                    rad = 3.0 + rng.normal(0, 0.002, k)
                    pts = np.column_stack([np.cos(th) * rad,
                                           np.sin(th) * rad])
                else:
                    pts = np.column_stack(
                        [t * 10, rng.normal(0, 0.002, k)])
                tol = float(rng.choice([0.001, 0.01, 0.05]))
                got = B.buffer_input_simplify(pts, tol, closed=closed,
                                              concave_only=co)
                want = reference(pts, tol, closed, co)
                assert np.array_equal(got, want), (closed, co, trial)


def test_simplify_batch_matches_scalar():
    """buffer_input_simplify_batch is element-for-element identical to
    per-item buffer_input_simplify calls, including gated pass-through
    identity and mixed sizes/tolerances."""
    rng = np.random.default_rng(7)
    for closed in (False, True):
        for co in ((True,) if closed else (False,)):
            for trial in range(25):
                items, tols = [], []
                for _ in range(int(rng.integers(1, 10))):
                    k = int(rng.choice([3, 5, 64, 65, 80, 200, 500]))
                    if closed:
                        th = np.sort(rng.uniform(0, 2 * np.pi, k))
                        rad = 3.0 + rng.normal(0, 0.01, k)
                        pts = np.column_stack([np.cos(th) * rad,
                                               np.sin(th) * rad])
                    else:
                        t = np.sort(rng.uniform(0, 1, k))
                        pts = np.column_stack(
                            [t * 10, rng.normal(0, 0.01, k)])
                    items.append(pts)
                    tols.append(float(rng.choice([0.0, 0.005, 0.05])))
                got = B.buffer_input_simplify_batch(
                    items, tols, closed=closed, concave_only=co)
                for pts, tol, g in zip(items, tols, got):
                    want = B.buffer_input_simplify(
                        pts, tol, closed=closed, concave_only=co)
                    assert np.array_equal(g, want), (closed, co, trial)
                    if tol <= 0.0 or len(pts) <= 64:
                        assert g is pts      # gated identity
