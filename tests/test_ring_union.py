"""Differential gates for the crossing-split boundary tracer.

``geometry.ring_union`` re-derives each soup's nonzero-winding boundary
by noding + segment classification (the way native clippers do — see the
module docstring); the slab sweep (``overlay.union_polygons``) remains
the semantic reference.  Every test here compares the two on REGION
measures (area, point membership) — byte equality is not expected, the
tracer emits a different (equally valid) vertex order.

Reference behavior being matched: GEOS's buffer/union region semantics
as exercised by the reference's benchmark shapes
(/root/reference/benchmarks/test_bench_base.py datagen distributions).
"""

import numpy as np
import pandas as pd
import pytest

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sedona_db_spark.geometry import ring_union as RU
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.geometry.overlay import union_edges


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def geom_rings(g):
    if g is None:
        return []
    name, payload = g
    if name == "Polygon":
        rs_all = [payload]
    elif name == "MultiPolygon":
        rs_all = payload
    else:
        return []
    return [np.asarray(r, dtype=np.float64) for rs in rs_all for r in rs]


def geom_area(g):
    tot = 0.0
    for p in geom_rings(g):
        x, y = p[:, 0], p[:, 1]
        tot += 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return tot


def membership(g, pts):
    """Nonzero-winding membership of query points (odd/even-safe)."""
    w = np.zeros(len(pts))
    for p in geom_rings(g):
        x1, y1 = p[:, 0], p[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        dy = np.where(y2 == y1, 1.0, y2 - y1)
        for k, (qx, qy) in enumerate(pts):
            up = (y1 <= qy) & (qy < y2)
            dn = (y2 <= qy) & (qy < y1)
            xat = x1 + (qy - y1) * (x2 - x1) / dy
            w[k] += np.sum(up & (xat > qx)) - np.sum(dn & (xat > qx))
    return w != 0


def sweep_union(rings):
    """Orientation-preserving slab-sweep reference: nonzero winding of
    the raw directed ring soup (same contract the tracer gets)."""
    e = np.vstack([np.column_stack([r, np.roll(r, -1, axis=0)])
                   for r in rings])
    return union_edges(e)


def assert_region_equal(traced, rings, rng, label, pts_n=24):
    ref = sweep_union(rings)
    ta, ra = geom_area(traced), geom_area(ref)
    assert ta == pytest.approx(ra, rel=1e-9, abs=1e-9), \
        f"{label}: area {ta} vs sweep {ra}"
    allp = np.vstack(rings)
    lo, hi = allp.min(0), allp.max(0)
    pts = rng.uniform(lo - 0.5, hi + 0.5, size=(pts_n, 2))
    mt, mr = membership(traced, pts), membership(ref, pts)
    assert (mt == mr).all(), f"{label}: membership mismatch"


def _sq(x0, y0, w, h, ccw=True):
    r = np.array([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)],
                 dtype=np.float64)
    return r if ccw else r[::-1]


# ---------------------------------------------------------------------------
# hand-built degeneracy cases (the structural shapes that used to refuse)
# ---------------------------------------------------------------------------

def test_two_overlapping_squares():
    rng = np.random.default_rng(1)
    rows = [[_sq(0, 0, 2, 2), _sq(1, 1, 2, 2)]]
    res = RU.union_rings_batch(rows)
    assert res[0] is not None
    assert_region_equal(res[0], rows[0], rng, "overlap")
    assert geom_area(res[0]) == pytest.approx(7.0)


def test_identical_squares_merge_weight2():
    """Exactly coincident same-direction rings: the winding doubles but
    the region boundary is emitted once (weighted cancellation)."""
    rows = [[_sq(0, 0, 1, 1), _sq(0, 0, 1, 1)]]
    res = RU.union_rings_batch(rows)
    assert res[0] is not None
    assert geom_area(res[0]) == pytest.approx(1.0)


def test_opposite_squares_cancel_to_empty():
    """A ring plus its exact reverse: zero winding everywhere."""
    rows = [[_sq(0, 0, 1, 1), _sq(0, 0, 1, 1, ccw=False)]]
    res = RU.union_rings_batch(rows)
    assert res[0] is None or geom_area(res[0]) == pytest.approx(0.0)


def test_shared_wall_squares():
    """Two squares sharing a wall: the anti-parallel coincident edges
    cancel and the walk crosses the gap — one rectangle."""
    rng = np.random.default_rng(2)
    rows = [[_sq(0, 0, 1, 1), _sq(1, 0, 1, 1)]]
    res = RU.union_rings_batch(rows)
    assert res[0] is not None
    assert geom_area(res[0]) == pytest.approx(2.0)
    assert_region_equal(res[0], rows[0], rng, "shared-wall")


def test_partial_shared_wall():
    rng = np.random.default_rng(3)
    rows = [[_sq(0, 0, 1, 1), _sq(1, 0.25, 1, 0.5)]]
    res = RU.union_rings_batch(rows)
    assert res[0] is not None
    assert geom_area(res[0]) == pytest.approx(1.5)
    assert_region_equal(res[0], rows[0], rng, "partial-wall")


def test_corner_touching_squares():
    rng = np.random.default_rng(4)
    rows = [[_sq(0, 0, 1, 1), _sq(1, 1, 1, 1)]]
    res = RU.union_rings_batch(rows)
    if res[0] is not None:         # vertex-vertex pinch: accept or refuse
        assert geom_area(res[0]) == pytest.approx(2.0)
        assert_region_equal(res[0], rows[0], rng, "corner-touch")


def test_vertex_on_edge_touch():
    """A triangle whose apex lies exactly interior to a square's wall:
    the touch snaps to the vertex and splits the wall there."""
    rng = np.random.default_rng(5)
    tri = np.array([(1.0, 0.5), (2.0, 0.0), (2.0, 1.0)])
    rows = [[_sq(0, 0, 1, 1), tri]]
    res = RU.union_rings_batch(rows)
    if res[0] is not None:
        assert_region_equal(res[0], rows[0], rng, "vertex-on-edge")


def test_hole_via_cw_ring():
    rng = np.random.default_rng(6)
    rows = [[_sq(0, 0, 4, 4), _sq(1, 1, 1, 1, ccw=False)]]
    res = RU.union_rings_batch(rows)
    assert res[0] is not None
    assert geom_area(res[0]) == pytest.approx(15.0)
    assert_region_equal(res[0], rows[0], rng, "hole")


def test_work_cap_refuses_not_crashes(monkeypatch):
    monkeypatch.setattr(RU, "MAX_ROW_WORK", 10)
    rng = np.random.default_rng(7)
    ang = rng.uniform(0, 2 * np.pi, 40)
    rings = []
    for k in range(12):
        th = ang + 0.1 * k
        rings.append(np.column_stack([np.cos(th) * (1 + 0.05 * k),
                                      np.sin(th) * (1 + 0.05 * k)]))
    res = RU.union_rings_batch([rings])
    assert res[0] is None          # refused, no allocation explosion


def test_rings_from_edges_roundtrip():
    r1 = _sq(0, 0, 1, 1)
    r2 = _sq(3, 3, 2, 1)
    e = []
    for r in (r1, r2):
        q = np.roll(r, -1, axis=0)
        e.append(np.column_stack([r, q]))
    got = RU.rings_from_edges(np.vstack(e))
    assert got is not None and len(got) == 2
    assert np.array_equal(got[0], r1)
    assert np.array_equal(got[1], r2)


# ---------------------------------------------------------------------------
# benchmark-distribution differential (the shapes that drove the design)
# ---------------------------------------------------------------------------

def _bench_rows(shape, n, dist, seed):
    """Run the full batched buffer UDF twice (tracer on / off) and return
    paired WKB results."""
    import importlib
    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools_dir)
    bbs = importlib.import_module("bench_buffer_shapes")
    from sedona_db_spark.functions.scalar import _st_buffer_impl
    f = getattr(_st_buffer_impl, "__wrapped__", _st_buffer_impl)
    wkbs = bbs.make_table(shape, n, seed=seed)
    b = pd.Series(wkbs, dtype=object)
    d = pd.Series([dist] * n)
    old = RU.ENABLED
    try:
        RU.ENABLED = True
        on = f(b, d)
        RU.ENABLED = False
        off = f(b, d)
    finally:
        RU.ENABLED = old
    return on, off


def _wkb_area(wb):
    return geom_area(W.decode(wb)) if wb is not None else None


@pytest.mark.parametrize("shape,dist", [
    ("collections_simple", 2.0),
    ("collections_simple", 0.5),
    ("segments_large", 2.0),
])
def test_traced_buffer_matches_sweep(shape, dist):
    n = 150
    on, off = _bench_rows(shape, n, dist, seed=int(dist * 1000) + 11)
    rng = np.random.default_rng(17)
    for i, (a, c) in enumerate(zip(on, off)):
        aa, ac = _wkb_area(a), _wkb_area(c)
        assert aa == pytest.approx(ac, rel=1e-9, abs=1e-9), f"row {i}"
        if i % 10 == 0:
            rr = geom_rings(W.decode(c))
            if not rr:
                continue
            allp = np.vstack(rr)
            pts = rng.uniform(allp.min(0) - 0.5, allp.max(0) + 0.5,
                              size=(16, 2))
            ma = membership(W.decode(a), pts)
            mc = membership(W.decode(c), pts)
            assert (ma == mc).all(), f"row {i} membership"


def test_collection_acceptance_rate():
    """The structural-degeneracy recovery must hold: the tracer accepts
    (= traces without sweep fallback) essentially every benchmark
    collections_simple soup.  Guards remain legal for genuinely
    ambiguous rows, so allow a small slack."""
    import importlib
    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools_dir)
    bbs = importlib.import_module("bench_buffer_shapes")
    from sedona_db_spark.functions import scalar as S
    f = getattr(S._st_buffer_impl, "__wrapped__", S._st_buffer_impl)
    wkbs = bbs.make_table("collections_simple", 250, seed=42)
    calls = {"n": 0, "rej": 0}
    orig = RU.union_rings_batch

    def spy(rows):
        res = orig(rows)
        calls["n"] += len(rows)
        calls["rej"] += sum(1 for r in res if r is None)
        return res

    RU.union_rings_batch = spy
    try:
        f(pd.Series(wkbs, dtype=object), pd.Series([2.0] * 250))
    finally:
        RU.union_rings_batch = orig
    assert calls["n"] > 0
    assert calls["rej"] <= 0.05 * calls["n"], \
        f"tracer rejected {calls['rej']}/{calls['n']}"


# ---------------------------------------------------------------------------
# randomized differential fuzz (seeded)
# ---------------------------------------------------------------------------

def _rand_ring(rng):
    kind = rng.integers(0, 3)
    k = int(rng.integers(3, 14))
    cx, cy = rng.uniform(-3, 3, 2)
    if kind == 0:                              # convex
        th = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.5, 2.0)
    elif kind == 1:                            # star (self-simple, concave)
        th = np.linspace(0, 2 * np.pi, k, endpoint=False)
        rad = np.where(np.arange(k) % 2 == 0, 2.0, rng.uniform(0.3, 1.0))
    else:                                      # jittered irregular
        th = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.3, 2.5, k)
    ring = np.column_stack([np.cos(th) * rad + cx, np.sin(th) * rad + cy])
    if rng.random() < 0.3:
        ring = ring[::-1]
    return ring


def test_fuzz_random_soups():
    rng = np.random.default_rng(20260818)
    rows = []
    for _ in range(300):
        rows.append([_rand_ring(rng) for _ in range(int(rng.integers(1, 5)))])
    res = RU.union_rings_batch(rows)
    checked = 0
    for i, r in enumerate(res):
        if r is None:
            continue                       # guard refusal is always legal
        assert_region_equal(r, rows[i], rng, f"fuzz row {i}", pts_n=12)
        checked += 1
    assert checked >= 250                  # vast majority must trace


def test_shared_vertex_crossing_circles():
    """Round-7 wrong-answer regression (caught by the reference harvest
    replay, test_st_buffer-12): two translated 32-gon 'circles' that
    intersect EXACTLY at two shared vertices have zero transversal
    crossings, yet their union boundary crosses at those vertices — the
    whole-ring-as-one-segment classification silently dropped the
    second circle.  The tracer must now either trace the true union or
    refuse to the sweep; both are compared against the winding-exact
    sweep region."""
    from sedona_db_spark.geometry.buffer import circle_template
    t = circle_template(8)
    rng = np.random.default_rng(2)
    for dxy in ((1.0, 1.0), (-1.0, 1.0), (1.0, -1.0)):
        rows = [[t * 1.0, t * 1.0 + list(dxy)]]
        res = RU.union_rings_batch(rows)
        if res[0] is not None:
            assert_region_equal(res[0], rows[0], rng, f"circles {dxy}")
        # end-to-end: the UDF must return the sweep-exact region
        from sedona_db_spark.functions.scalar import _st_buffer_impl
        f = getattr(_st_buffer_impl, "__wrapped__", _st_buffer_impl)
        g = ("MultiPoint", np.array([[0.0, 0.0], list(dxy)]))
        got = f(pd.Series([W.encode(g)], dtype=object), pd.Series([1.0]))
        from tests.test_ring_union import geom_area as GA
        ref = sweep_union(rows[0])
        assert GA(W.decode(bytes(got.iloc[0]))) == pytest.approx(
            GA(ref), rel=0, abs=1e-9)


def test_shared_vertex_crossing_squares():
    """Squares meeting at one exact corner in a bowtie (crossing) and in
    a kiss (touching) configuration — the vertex-node break must handle
    both; region parity with the sweep either way."""
    rng = np.random.default_rng(9)
    bow = [[_sq(0, 0, 2, 2), _sq(2, 2, 2, 2)],          # kiss at (2,2)
           [_sq(0, 0, 2, 2), _sq(2, 0, 2, 2)],          # shared edge ends
           [_sq(0, 0, 2, 2)[::-1].copy(), _sq(2, 2, 2, 2)]]
    res = RU.union_rings_batch(bow)
    for i, r in enumerate(res):
        if r is not None:
            assert_region_equal(r, bow[i], rng, f"squares {i}")


def _lattice_ring(rng, grid=0.5):
    k = int(rng.integers(3, 9))
    for _ in range(40):
        th = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.5, 2.5, k)
        cx, cy = rng.integers(-4, 5, 2) * grid
        r = np.column_stack([np.cos(th) * rad + cx, np.sin(th) * rad + cy])
        r = np.round(r / grid) * grid
        keep = np.r_[True, np.any(np.diff(r, axis=0) != 0, axis=1)]
        r = r[keep]
        if len(r) >= 3 and (r[0] != r[-1]).any():
            return r
    return None


def test_fuzz_lattice_snapped_soups():
    """Round-7 standing hunt: rings snapped to a 0.5 lattice make exact
    shared vertices, collinear overlaps, and vertex-on-edge contacts the
    COMMON case — the degenerate paths where the shared-vertex node bug
    hid.  4,000 seeded trials (the discovery run was 30k, zero
    mismatches, ~89% traced): every traced row must match the
    winding-exact sweep on area, membership sampled."""
    rng = np.random.default_rng(20260818)
    mism = []
    checked = 0
    for s in range(0, 4000, 500):
        rows = []
        for _ in range(500):
            rings = [x for x in (_lattice_ring(rng)
                                 for _ in range(int(rng.integers(1, 4))))
                     if x is not None]
            rows.append(rings if rings else None)
        res = RU.union_rings_batch(rows)
        for i, r in enumerate(res):
            if r is None or rows[i] is None:
                continue
            checked += 1
            ref = sweep_union(rows[i])
            if not np.isclose(geom_area(r), geom_area(ref),
                              rtol=1e-9, atol=1e-9):
                mism.append((s + i, geom_area(r), geom_area(ref)))
                continue
            if (s + i) % 9 == 0:
                allp = np.vstack(rows[i])
                pts = rng.uniform(allp.min(0) - 0.5, allp.max(0) + 0.5,
                                  (10, 2))
                if not (membership(r, pts) == membership(ref, pts)).all():
                    mism.append((s + i, "membership", None))
    assert checked >= 3000
    assert not mism, f"{len(mism)} mismatches: {mism[:5]}"


def test_propagation_lattice_rect_arrangements_fuzz():
    """Round-8 adversarial fuzz for WINDING PROPAGATION: arrangements of
    axis-aligned integer-lattice rectangles maximize exact coincidences —
    shared support lines (collinear cancellation), crossings at exact
    lattice points shared by 3+ edges (the node3 multi-pass class that
    must break propagation), shared corners, and weight-stacked identical
    rings.  The tracer must match the slab sweep's region or refuse; a
    silently mispropagated winding would flip whole faces, which the
    area + membership gate catches immediately."""
    rng = np.random.default_rng(81)
    refused = 0
    for trial in range(400):
        n = int(rng.integers(2, 7))
        rings = []
        for _ in range(n):
            x0, y0 = int(rng.integers(0, 6)), int(rng.integers(0, 6))
            w, h = int(rng.integers(1, 6)), int(rng.integers(1, 6))
            rings.append(_sq(float(x0), float(y0), float(w), float(h),
                             ccw=bool(rng.random() < 0.85)))
        if rng.random() < 0.3:
            rings.append(rings[0].copy())       # exact duplicate (weight)
        got = RU.union_rings_batch([rings])[0]
        if got is None:
            refused += 1
            continue
        assert_region_equal(got, rings, rng, f"lattice trial {trial}")
    # the point of the tracer is to ACCEPT most of these; refusing
    # everything would be trivially 'correct'
    assert refused <= 160, refused


def test_propagation_translated_circle_pairs_fuzz():
    """Translated copies of one circle template share bit-identical edge
    directions (exactly parallel non-adjacent edges at arbitrary offsets
    — the benchmark MultiPoint shape that drives the near-parallel
    capture).  Region parity with the sweep across random overlaps,
    exact tangencies and concentric nests."""
    from sedona_db_spark.geometry.buffer import circle_template
    rng = np.random.default_rng(82)
    tmpl = circle_template(8)[:-1]              # open ring
    refused = 0
    for trial in range(300):
        rings = []
        for _ in range(int(rng.integers(2, 6))):
            r = float(rng.uniform(0.5, 3.0))
            c = rng.uniform(0, 6, 2)
            if rng.random() < 0.2:
                c = np.round(c)                  # exact lattice centers
            rings.append(tmpl * r + c)
        got = RU.union_rings_batch([rings])[0]
        if got is None:
            refused += 1
            continue
        assert_region_equal(got, rings, rng, f"circles trial {trial}")
    assert refused <= 60, refused
