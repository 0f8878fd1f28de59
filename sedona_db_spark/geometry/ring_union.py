"""Batched nonzero-winding boundary extraction by crossing-splitting.

The slab-sweep union (``overlay.union_polygons`` and its batched twin
``winding_batch.union_polygons_batch``) is exact for ANY edge soup but
pays O(slabs x bands) with per-row Python merge/dissolve loops — for the
reference benchmark's collection shapes (2-3 overlapping ~90-vertex
buffered children per row) that is ~8 ms/row, the round-6 VERDICT's one
remaining perf-weak tier (/root/reference/benchmarks/README.md:70-85).

This module computes the same region boundary the way native clippers do
(GEOS/Vatti-style noding, re-expressed batch-vectorized, not ported):

1. split every ring edge at its transversal crossings (one exact crossing
   coordinate shared by both edges, so chain connectivity is exact by
   construction);
2. group sub-edges into SEGMENTS — maximal chain runs between crossings.
   The winding number of the regions flanking a run is constant along it
   (w can only change across a crossing), so each segment needs ONE
   classification, evaluated at its longest sub-edge's midpoint:
   ``w_rest`` from a y-binned vectorized ray cast plus a closed-form self
   term, ``w_left = w_right + 1`` always;
3. keep exactly the segments bordering the zero-winding region (forward
   when the nonzero side is on the left, reversed otherwise — holes come
   out CW automatically);
4. chain kept segments on exact endpoint equality with the
   sharpest-left-turn rule at multi-way crossings (~2x crossings steps
   per row, each emitting a whole vertex-slice), then assign CW rings as
   holes of their containing shell.

Everything except the final per-row segment walk is flat numpy over the
WHOLE batch.  The tracer REFUSES any row outside generic position —
endpoint touches, collinear overlaps, coincident crossings, midpoints on
foreign edges, chain failures, area bounds — by returning None for that
row; callers fall back to the winding-exact slab sweep, which remains
the semantic reference (differential property tests in
tests/test_ring_union.py).
"""

from __future__ import annotations

import math
import os
import time

import numpy as np

__all__ = ["union_rings_batch", "rings_of_parts", "rings_from_edges",
           "ENABLED"]

# env-gated phase wall-time accumulator (SD_RU_PROFILE=1): zero overhead
# when off; tools/bench_buffer_shapes.py prints it after a profiled run
PROFILE = os.environ.get("SD_RU_PROFILE", "") == "1"
PHASE_T: dict = {}
PHASE_N: dict = {}


def _count(name: str, v: int) -> None:
    PHASE_N[name] = PHASE_N.get(name, 0) + int(v)


def _tick(t0: float, name: str) -> float:
    t1 = time.perf_counter()
    PHASE_T[name] = PHASE_T.get(name, 0.0) + (t1 - t0)
    return t1

# kill switch for A/B and for the byte-parity tests of the slab sweep
# (tests/test_buffer_batch.py flips it off to pin batch==per-row bytes)
ENABLED = True

# per-row work ceiling (candidate pairs / bin occupancy / ray-cast
# volume): rows above it fall back to the winding-exact slab sweep
# instead of allocating quadratic temporaries
MAX_ROW_WORK = 4_000_000

# seed ray casts: rows whose full-scan volume (seeds x subs) is at or
# under this take the one-shot full-row scan instead of building
# quantile stab bins (see the routing comment in phase 4)
FULLSCAN_WORK = 8_192

# batch chunking budget, in input edges: rows are processed in
# consecutive chunks of at most this many edges so every phase's
# temporaries stay small enough for malloc free-list reuse (fresh
# mmap-backed pages first-touch-fault at ~200 MB/s on this host class —
# see _malloc.py) and peak executor memory stays flat no matter how
# large an Arrow batch Spark hands the UDF
CHUNK_EDGES = 32_000


def rings_from_edges(e) -> list | None:
    """Recover the closed-ring decomposition of an ORDERED directed edge
    array (the offset-curve and pooled-collection soups emit each curve's
    edges consecutively in chain order).  Returns ``None`` when any chain
    is shorter than 3 edges or fails to close — including the
    pathological case of one ring's last end coinciding exactly with the
    next ring's first start, which would mis-merge the chains (the
    closure check then fails and the caller falls back to the sweep)."""
    e = np.asarray(e, dtype=np.float64)
    if e.ndim != 2 or e.shape[1] < 4 or len(e) < 3:
        return None
    brk = (e[:-1, 2] != e[1:, 0]) | (e[:-1, 3] != e[1:, 1])
    rings: list = []
    start = 0
    for end in list(np.flatnonzero(brk) + 1) + [len(e)]:
        c = e[start:end]
        start = end
        if len(c) < 3:
            return None
        if c[-1, 2] != c[0, 0] or c[-1, 3] != c[0, 1]:
            return None
        rings.append(np.ascontiguousarray(c[:, :2]))
    return rings


def rings_of_parts(parts: list) -> list | None:
    """Extract the closed-ring decomposition of a polygonal part soup in
    the SAME orientation convention as ``winding_batch._edges_of_parts``
    (shells CCW, holes CW, duplicate closing point stripped, zero-length
    edges dropped).  Returns ``None`` when a part is not decomposable to
    rings."""
    rings: list = []

    def add_ring(ring, want_ccw: bool) -> None:
        r = np.asarray(ring, dtype=np.float64)[:, :2]
        if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
            r = r[:-1]
        if len(r) < 3:
            return
        x, y = r[:, 0], r[:, 1]
        # rolled arrays via explicit slicing+concat: value-identical to
        # np.roll(a, -1) but without its ~10 µs Python overhead (this
        # runs per ring of every batch row)
        keep = np.empty(len(r), dtype=bool)
        keep[:-1] = (x[:-1] != x[1:]) | (y[:-1] != y[1:])
        keep[-1] = (x[-1] != x[0]) | (y[-1] != y[0])
        if not keep.all():
            r = r[keep]
            if len(r) < 3:
                return
            x, y = r[:, 0], r[:, 1]
        # same np.dot float path as winding_batch._edges_of_parts: the
        # concatenated arrays are element-identical to np.roll(·, -1)
        yr = np.concatenate([y[1:], y[:1]])
        xr = np.concatenate([x[1:], x[:1]])
        ccw = float(np.dot(x, yr) - np.dot(y, xr)) > 0
        rings.append(r if ccw == want_ccw else r[::-1])

    ok = True

    def add_part(g) -> None:
        nonlocal ok
        if g is None or not ok:
            return
        if isinstance(g, np.ndarray):
            # ordered directed edges (pooled offset curves) keep their
            # ring structure — recover it or refuse the row
            rr = rings_from_edges(g)
            if rr is None:
                ok = False
            else:
                rings.extend(rr)
            return
        name, payload = g
        if name == "Polygon":
            for k, ring in enumerate(payload):
                add_ring(ring, want_ccw=(k == 0))
        elif name == "MultiPolygon":
            for rr in payload:
                for k, ring in enumerate(rr):
                    add_ring(ring, want_ccw=(k == 0))
        elif name == "GeometryCollection":
            for q in payload:
                add_part(q)
        else:
            ok = False

    for g in parts:
        add_part(g)
    return rings if ok else None


_EMPTY = ("Polygon", [])


def _cancel_collinear(oi, oj, X1, Y1, X2, Y2, EROW, ERING, EPOS, ELEN,
                      EW, bad, canc_row):
    """Cancel exactly-collinear overlapping edge groups (same row, same
    support line) by 1-D interval arithmetic: project each group onto its
    longest edge's direction, split at every EXACT endpoint coordinate,
    and emit one directed edge per elementary interval carrying the net
    signed multiplicity as an integer WEIGHT (0 cancels entirely;
    same-direction coincident runs merge into a weight-m edge — the
    winding ray casts count it m-fold while the boundary walk sees the
    stretch exactly once).  The net directed current is unchanged, so
    winding is exact, and every emitted endpoint reuses an exact original
    coordinate, so downstream exact-equality chaining still closes (∂ of
    the 1-chain is preserved).  Mutates ``bad``/``canc_row``; returns the
    rebuilt edge table or None when no group survived."""
    E = len(X1)
    parent: dict = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(oi.tolist(), oj.tolist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict = {}
    for a in parent:
        groups.setdefault(find(a), []).append(a)

    # flat interval arithmetic across ALL groups at once (the former
    # per-group python loops dominated the cancellation cost on soups
    # where half the rows carry structural collinear overlaps).  Group
    # and interval order match the sequential emitter exactly, so the
    # rebuilt edge table is byte-identical for every non-refused row.
    drop = np.zeros(E, dtype=bool)
    glist = list(groups.values())
    ng = len(glist)
    gsizes = np.array([len(g) for g in glist], dtype=np.int64)
    ge = np.concatenate([np.asarray(g, dtype=np.int64) for g in glist])
    gid = np.repeat(np.arange(ng), gsizes)
    goff = np.concatenate([[0], np.cumsum(gsizes)[:-1]])
    grow = EROW[ge[goff]]
    galive = ~bad[grow]
    dx = X2[ge] - X1[ge]
    dy = Y2[ge] - Y1[ge]
    ln = np.hypot(dx, dy)
    lnmax = np.maximum.reduceat(ln, goff)
    is_best = ln == lnmax[gid]
    bestidx = np.zeros(ng, dtype=np.int64)
    bi = np.flatnonzero(is_best)[::-1]    # last write = FIRST argmax
    bestidx[gid[bi]] = bi
    gux = dx[bestidx] / ln[bestidx]
    guy = dy[bestidx] / ln[bestidx]
    # breakpoints: both endpoints of every edge, deduped per group on
    # exact coordinates, ordered by (projection, (x, y)) like the
    # sequential sorted() key
    epx = np.concatenate([X1[ge], X2[ge]])
    epy = np.concatenate([Y1[ge], Y2[ge]])
    egid = np.concatenate([gid, gid])
    tproj = epx * gux[egid] + epy * guy[egid]
    o = np.lexsort((epy, epx, tproj, egid))
    so_g, so_x, so_y = egid[o], epx[o], epy[o]
    new = np.empty(len(o), dtype=bool)
    new[0] = True
    new[1:] = (so_g[1:] != so_g[:-1]) | (so_x[1:] != so_x[:-1]) \
        | (so_y[1:] != so_y[:-1])
    bpid_sorted = np.cumsum(new) - 1
    ep_bp = np.empty(len(o), dtype=np.int64)
    ep_bp[o] = bpid_sorted
    nbp = int(bpid_sorted[-1]) + 1
    bpx = so_x[new]
    bpy = so_y[new]
    bp_g = so_g[new]
    nb_per_g = np.bincount(bp_g, minlength=ng)
    bp_off = np.concatenate([[0], np.cumsum(nb_per_g)[:-1]])
    nEg = len(ge)
    i0 = ep_bp[:nEg]
    i1 = ep_bp[nEg:]
    degen = i0 == i1                      # zero-extent edge on the line
    if bool(degen.any()):
        bad[np.unique(EROW[ge[degen]])] = True
        galive &= ~bad[grow]
    alive_e = galive[gid]
    s = np.where(i0 < i1, EW[ge], -EW[ge])
    lo = np.minimum(i0, i1)
    hi_ = np.maximum(i0, i1)
    delta = np.zeros(nbp, dtype=np.int64)
    np.add.at(delta, lo[alive_e], s[alive_e])
    np.add.at(delta, hi_[alive_e], -s[alive_e])
    c = np.cumsum(delta)
    base = np.zeros(ng, dtype=np.int64)
    base[1:] = c[bp_off[1:] - 1]
    wv = c - base[bp_g]                   # net multiplicity per interval
    is_last_bp = np.arange(nbp) == (bp_off + nb_per_g - 1)[bp_g]
    emitm = ~is_last_bp & (wv != 0) & galive[bp_g]
    ei = np.flatnonzero(emitm)
    pos = wv[ei] > 0
    ax1 = np.where(pos, bpx[ei], bpx[ei + 1])
    ay1 = np.where(pos, bpy[ei], bpy[ei + 1])
    ax2 = np.where(pos, bpx[ei + 1], bpx[ei])
    ay2 = np.where(pos, bpy[ei + 1], bpy[ei])
    arow = grow[bp_g[ei]]
    aw = np.abs(wv[ei])
    if not bool(galive.any()):
        return None
    canc_row[grow[galive]] = True
    drop[ge[alive_e]] = True
    keep = ~drop
    na = len(ax1)
    emap = np.full(E, -1, dtype=np.int64)
    emap[keep] = np.arange(int(keep.sum()), dtype=np.int64)
    next_ring = int(ERING.max()) + 1 if len(ERING) else 0
    return (emap,
            np.concatenate([X1[keep], np.asarray(ax1, dtype=np.float64)]),
            np.concatenate([Y1[keep], np.asarray(ay1, dtype=np.float64)]),
            np.concatenate([X2[keep], np.asarray(ax2, dtype=np.float64)]),
            np.concatenate([Y2[keep], np.asarray(ay2, dtype=np.float64)]),
            np.concatenate([EROW[keep],
                            np.asarray(arow, dtype=np.int64)]),
            np.concatenate([ERING[keep],
                            next_ring + np.arange(na, dtype=np.int64)]),
            np.concatenate([EPOS[keep], np.zeros(na, dtype=np.int64)]),
            np.concatenate([ELEN[keep], np.full(na, 3, dtype=np.int64)]),
            np.concatenate([EW[keep], np.asarray(aw, dtype=np.int64)]))


def union_rings_batch(rows: list) -> list:
    """Union each row's closed-ring soup by crossing-split boundary
    tracing.  ``rows[i]`` is a list of open (n,2) float64 rings (implicit
    closure, consecutive duplicates removed) or ``None``.  Returns one
    geometry tuple per row, or ``None`` where the row is ineligible /
    degenerate (caller falls back to the slab sweep).

    Large batches are processed in CHUNK_EDGES-bounded row chunks (rows
    are independent, so the result is identical); a single row larger
    than the budget still runs alone, bounded by MAX_ROW_WORK."""
    sizes = [sum(len(rg) for rg in r) if r else 0 for r in rows]
    if sum(sizes) > CHUNK_EDGES and len(rows) > 1:
        out: list = []
        start, acc = 0, 0
        for i, s in enumerate(sizes):
            if i > start and acc + s > CHUNK_EDGES:
                out.extend(_union_rings_chunk(rows[start:i]))
                start, acc = i, 0
            acc += s
        out.extend(_union_rings_chunk(rows[start:]))
        return out
    return _union_rings_chunk(rows)


def _union_rings_chunk(rows: list) -> list:
    n_rows = len(rows)
    out: list = [None] * n_rows
    bad = np.zeros(n_rows, dtype=bool)
    _pt = time.perf_counter() if PROFILE else 0.0

    # ---- phase 0: flatten rings -> edge table ---------------------------
    # one flat pass over the concatenated vertex soup of the chunk (the
    # per-ring loop was ~50 µs of numpy call overhead per ring): collapse
    # sub-epsilon vertices (the offset-curve tiers emit round-arc k=0
    # points ~1e-15 from the chain vertex; left in place they make edges
    # 12/14 pseudo-adjacent through a tiny edge 13 and every chain joint
    # reads as an endpoint touch — region perturbation <= perimeter *
    # 1e-9 * scale, orders below every downstream tolerance), drop rings
    # that collapse below 3 vertices, refuse rows with malformed rings
    # or surviving zero-length edges.
    ring_arrs: list = []
    ring_rowid: list = []
    row_has = np.zeros(n_rows, dtype=bool)
    for r, rings in enumerate(rows):
        if not rings:
            continue
        okr = True
        for ring in rings:
            p = np.asarray(ring, dtype=np.float64)
            if p.ndim != 2 or p.shape[1] != 2 or len(p) < 3:
                okr = False
                break
            ring_arrs.append(p)
            ring_rowid.append(r)
        if not okr:
            bad[r] = True
        else:
            row_has[r] = True
    if not ring_arrs:
        return out
    lens0 = np.array([len(p) for p in ring_arrs], dtype=np.int64)
    VR = np.concatenate(ring_arrs)
    NR = len(VR)
    nring0 = len(ring_arrs)
    rid0 = np.repeat(np.arange(nring0), lens0)
    rrow0 = np.asarray(ring_rowid, dtype=np.int64)
    finite_ring = np.ones(nring0, dtype=bool)
    vfin = np.isfinite(VR).all(axis=1)
    if not bool(vfin.all()):
        finite_ring[rid0[~vfin]] = False
        bad[rrow0[~finite_ring]] = True
    off0 = np.concatenate([[0], np.cumsum(lens0)[:-1]])
    last0 = off0 + lens0 - 1
    idx0 = np.arange(NR)
    nxt0 = idx0 + 1
    nxt0[last0] = off0
    sc = np.maximum(1.0, np.maximum(
        np.maximum.reduceat(np.abs(VR[:, 0]), off0),
        np.maximum.reduceat(np.abs(VR[:, 1]), off0)))
    ddv = np.hypot(VR[:, 0] - VR[nxt0, 0], VR[:, 1] - VR[nxt0, 1])
    tiny = ddv < 1e-9 * sc[rid0]
    dropv = np.zeros(NR, dtype=bool)
    dropv[nxt0[tiny]] = True
    lens1 = lens0 - np.bincount(rid0[dropv], minlength=nring0)
    ring_dead = (lens1 < 3) | ~finite_ring
    keep_v = ~dropv & ~ring_dead[rid0] & ~bad[rrow0[rid0]]
    V2 = VR[keep_v]
    rid1 = rid0[keep_v]
    if not len(rid1):
        return out
    # renumber surviving rings consecutively (dropped rings consume no id,
    # matching the per-ring emitter)
    ring_keep = np.zeros(nring0, dtype=bool)
    ring_keep[rid1] = True
    rmap = np.cumsum(ring_keep) - 1
    rid1 = rmap[rid1]
    lens2 = np.bincount(rid1)
    off2 = np.concatenate([[0], np.cumsum(lens2)[:-1]])
    last2 = off2 + lens2 - 1
    N2 = len(V2)
    idx2 = np.arange(N2)
    nxt2 = idx2 + 1
    nxt2[last2] = off2
    X1 = np.ascontiguousarray(V2[:, 0])
    Y1 = np.ascontiguousarray(V2[:, 1])
    X2 = X1[nxt2]
    Y2 = Y1[nxt2]
    EROW = rrow0[np.flatnonzero(ring_keep)][rid1]
    ERING = rid1
    EPOS = idx2 - off2[rid1]
    ELEN = lens2[rid1]
    # zero-length edges surviving the collapse refuse the row
    zlen = (X1 == X2) & (Y1 == Y2)
    if bool(zlen.any()):
        bad[np.unique(EROW[zlen])] = True
    keep = ~bad[EROW]
    if not keep.all():
        X1, Y1, X2, Y2 = X1[keep], Y1[keep], X2[keep], Y2[keep]
        EROW, ERING = EROW[keep], ERING[keep]
        EPOS, ELEN = EPOS[keep], ELEN[keep]
    E = len(X1)
    if E == 0:
        return out
    # integer edge weights: collinear cancellation merges same-direction
    # coincident runs into ONE edge of weight m (the winding function
    # needs the full current; the boundary walk must see the stretch once)
    EW = np.ones(E, dtype=np.int64)

    scale = np.ones(n_rows)
    np.maximum.at(scale, EROW, np.abs(X1))
    np.maximum.at(scale, EROW, np.abs(Y1))
    eps_row = 1e-9 * scale                        # coordinate tolerance

    xmin = np.minimum(X1, X2); xmax = np.maximum(X1, X2)
    ymin = np.minimum(Y1, Y2); ymax = np.maximum(Y1, Y2)
    if PROFILE:
        _pt = _tick(_pt, "p0_flatten")

    # ---- phase 1+2: candidate pairs -> transversal crossings -------------
    # Runs up to twice.  Exactly-collinear overlapping edge runs — the
    # offset-curve "spoke" dips of symmetric inputs share support lines BY
    # CONSTRUCTION (the benchmark's circular generators put opposite
    # vertices' radial spokes on one diameter), so they are structural,
    # not numerical noise — are CANCELLED by 1-D interval arithmetic on
    # the shared line (winding-preserving: the net directed current is
    # unchanged and every emitted endpoint reuses an exact original
    # coordinate, so ray casts and chain closure stay exact) and the pair
    # scan restarts once over the rebuilt soup.  Rows still overlapping
    # after a cancellation pass, or with |net multiplicity| >= 2, are
    # refused to the slab sweep.
    canc_row = np.zeros(n_rows, dtype=bool)
    fin_I = np.empty(0, dtype=np.int64)   # pairs carried across passes
    fin_J = np.empty(0, dtype=np.int64)
    redo = np.zeros(n_rows, dtype=bool)
    for attempt in range(2):
        if PROFILE:
            _pt = _tick(_pt, "p12_pre")
        xmin = np.minimum(X1, X2); xmax = np.maximum(X1, X2)
        ymin = np.minimum(Y1, Y2); ymax = np.maximum(Y1, Y2)
        if attempt == 0:
            eidx = np.arange(E)
        else:
            # only cancelled rows were rebuilt — every other row kept
            # its first-pass pairs (remapped below), so rescan JUST the
            # rebuilt rows' edges instead of the whole chunk
            eidx = np.flatnonzero(redo[EROW])
        sxmin = xmin[eidx]
        serow = EROW[eidx]
        Es = len(eidx)
        order_s = np.lexsort((sxmin, serow))
        sx_min = sxmin[order_s]
        srow = serow[order_s]
        row_first = np.searchsorted(srow, np.arange(n_rows + 1))
        hi = np.empty(Es, dtype=np.int64)
        for r in np.flatnonzero(np.diff(row_first) > 0):
            a, b = int(row_first[r]), int(row_first[r + 1])
            hi[a:b] = a + np.searchsorted(sx_min[a:b],
                                          xmax[eidx[order_s[a:b]]],
                                          side="right")
        base = np.arange(Es) + 1
        cnt = np.maximum(hi - base, 0)
        # per-row work cap: a densely self-crossing soup (the complex
        # benchmark's 500-gon inner offsets) can generate quadratic
        # candidate volume — refuse such rows to the sweep BEFORE
        # allocating the pair table rather than OOMing the executor
        pr_row = np.zeros(n_rows, dtype=np.int64)
        np.add.at(pr_row, srow, cnt)
        over = pr_row > MAX_ROW_WORK
        if bool(over.any()):
            bad |= over
            cnt = np.where(bad[srow], 0, cnt)
        P = int(cnt.sum())
        if PROFILE:
            _pt = _tick(_pt, "p12_sweep")
        pi = np.repeat(np.arange(Es), cnt)
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pj = np.arange(P) - np.repeat(starts, cnt) + np.repeat(base, cnt)
        gI = eidx[order_s[pi]]
        gJ = eidx[order_s[pj]]
        if PROFILE:
            _pt = _tick(_pt, "p12_expand")
        m = (ymin[gI] <= ymax[gJ]) & (ymin[gJ] <= ymax[gI])
        gI, gJ = gI[m], gJ[m]
        if PROFILE:
            _count("pairs_x", P)
            _count("pairs_xy", len(gI))
            _pt = _tick(_pt, "p12_ymask")
        samering = ERING[gI] == ERING[gJ]
        dpos = np.abs(EPOS[gI] - EPOS[gJ])
        adj = samering & ((dpos == 1) | (dpos == ELEN[gI] - 1))
        gI, gJ = gI[~adj], gJ[~adj]
        if PROFILE:
            _pt = _tick(_pt, "p12_adj")

        d1x = X2[gI] - X1[gI]; d1y = Y2[gI] - Y1[gI]
        d2x = X2[gJ] - X1[gJ]; d2y = Y2[gJ] - Y1[gJ]
        wx = X1[gJ] - X1[gI]; wy = Y1[gJ] - Y1[gI]
        den = d1x * d2y - d1y * d2x
        L1 = np.hypot(d1x, d1y)
        L2 = np.hypot(d2x, d2y)
        eps_p = eps_row[EROW[gI]]
        # NEAR-parallel capture (angle <= 1e-9 rad): exact spoke dips AND
        # almost-coincident pairs whose point "crossings" would be
        # numerically meaningless (they generate eps-separated ambiguous
        # splits on any edge crossing both).  Cancelling them as 1-D
        # intervals perturbs the region only inside an eps-tube of the
        # shared line — the same bound the snap band already accepts.
        par = np.abs(den) <= 1e-9 * L1 * L2
        ov = np.zeros(len(gI), dtype=bool)
        if bool(par.any()):
            cw = np.abs(wx * d1y - wy * d1x) <= eps_p * L1
            # STRICT extent overlap along the shared line, by at least an
            # eps margin — collinear edges that merely abut end-to-start
            # (cancellation emits these) are regular chain joints, not
            # overlaps.  Projections are taken directly from endpoint
            # differences so an exactly-shared endpoint projects to
            # exactly 0 / len².
            t0j = wx * d1x + wy * d1y
            t1j = (X2[gJ] - X1[gI]) * d1x + (Y2[gJ] - Y1[gI]) * d1y
            lo = np.minimum(t0j, t1j)
            hi_s = np.maximum(t0j, t1j)
            ov = par & cw & (np.maximum(lo, 0.0) + eps_p * L1
                             < np.minimum(hi_s, d1x * d1x + d1y * d1y))
        if PROFILE:
            _pt = _tick(_pt, "p12_ovdetect")
        if not bool(ov.any()):
            fin_I = np.concatenate([fin_I, gI])
            fin_J = np.concatenate([fin_J, gJ])
            break
        if attempt == 1:
            bad[np.unique(EROW[gI[ov]])] = True
            fin_I = np.concatenate([fin_I, gI])
            fin_J = np.concatenate([fin_J, gJ])
            break
        pre_canc = canc_row.copy()
        res = _cancel_collinear(gI[ov], gJ[ov], X1, Y1, X2, Y2, EROW,
                                ERING, EPOS, ELEN, EW, bad, canc_row)
        if res is None:                   # every overlap row refused
            fin_I, fin_J = gI, gJ
            break
        redo = canc_row & ~pre_canc
        # carry forward the pairs of rows that were NOT rebuilt (their
        # edges all survive: cancellation only drops edges of cancelled
        # rows), remapped to the rebuilt edge table
        emap_c = res[0]
        kp = ~redo[EROW[gI]]
        fin_I = emap_c[gI[kp]]
        fin_J = emap_c[gJ[kp]]
        X1, Y1, X2, Y2, EROW, ERING, EPOS, ELEN, EW = res[1:]
        E = len(X1)
        if E == 0:
            return out
    I, J = fin_I, fin_J
    if PROFILE:
        _pt = _tick(_pt, "p12_pairs_cross")

    # ---- chain re-stitch of cancelled rows ------------------------------
    # Cancellation replaces collinear bundles with net-current interval
    # edges, so a cancelled row's 1-current no longer decomposes along its
    # input rings: surviving chains break at every consumed stretch and
    # every emitted interval lands as a singleton ring — and phase 4 must
    # ray-cast-seed every ring first and chain break (on the benchmark
    # collection soups these were ~70% of all seeds, ~17 emitted
    # singletons per row).  Re-chain those rows' edges along exact shared
    # coordinates: a joint where exactly ONE edge ends and exactly ONE
    # starts, with EQUAL weight, is winding-transparent — the bundle
    # current through the joint is unchanged, so by conservation of the
    # (divergence-free) boundary current any external attachment there
    # has zero net flow, and a nonzero gross outflow would mean another
    # edge STARTS at the joint, contradicting uniqueness (phase 4's
    # start-coordinate node detection independently re-checks multi-start
    # coordinates, including split continuations, and re-seeds them).
    # Unequal weight can hide inflow-only attachment (invisible to start
    # detection), so those joints stay chain breaks.  Stitching freely
    # crosses input-ring identity: when two rings' coincident spokes
    # cancel, the union boundary genuinely weaves from one ring's kept
    # arc onto the other's, and the stitched chain follows it.
    if bool(canc_row.any()):
        sel = (canc_row & ~bad)[EROW]
        si = np.flatnonzero(sel)
        ns_ = len(si)
        if ns_:
            kx = np.concatenate([X1[si], X2[si]])
            ky = np.concatenate([Y1[si], Y2[si]])
            kr = np.concatenate([EROW[si], EROW[si]])
            o2 = np.lexsort((ky, kx, kr))
            nk = np.concatenate([[True], (kr[o2][1:] != kr[o2][:-1])
                                 | (kx[o2][1:] != kx[o2][:-1])
                                 | (ky[o2][1:] != ky[o2][:-1])])
            gid2 = np.cumsum(nk) - 1
            ng2 = int(gid2[-1]) + 1
            pgid = np.empty(2 * ns_, dtype=np.int64)
            pgid[o2] = gid2
            sgid = pgid[:ns_]             # group of each edge's START
            egid = pgid[ns_:]             # group of each edge's END
            cnt_s = np.bincount(sgid, minlength=ng2)
            cnt_e = np.bincount(egid, minlength=ng2)
            one = (cnt_s == 1) & (cnt_e == 1)
            g_start = np.zeros(ng2, dtype=np.int64)
            g_start[sgid] = np.arange(ns_)    # valid where cnt_s == 1
            succ = np.full(ns_, -1, dtype=np.int64)
            cand = np.flatnonzero(one[egid])
            tgt = g_start[egid[cand]]
            wok = EW[si[tgt]] == EW[si[cand]]
            succ[cand[wok]] = tgt[wok]
            pred = np.full(ns_, -1, dtype=np.int64)
            vs = np.flatnonzero(succ >= 0)
            pred[succ[vs]] = vs           # unique by cnt_e == 1
            # pointer-doubling walk to each chain's head; pure cycles
            # (intact rings, or loops stitched across cancelled rings)
            # never reach a head — detect them, break each at its
            # minimal-index edge, and resolve with a second pass
            rounds = max(2, int(np.ceil(np.log2(ns_ + 1))) + 1)

            def _heads(pr):
                P = pr.copy()
                D = np.where(P >= 0, 1, 0).astype(np.int64)
                # once P[e] reaches a head it never moves again, so the
                # active set only shrinks — keep narrowing it instead of
                # re-scanning the whole array every round
                act = np.flatnonzero(P >= 0)
                for _ in range(rounds):
                    act = act[P[P[act]] >= 0]
                    if not len(act):
                        break
                    D[act] += D[P[act]]
                    P[act] = P[P[act]]
                return P, D

            P1, dist = _heads(pred)
            act = np.flatnonzero(P1 >= 0)
            cyc = act[P1[P1[act]] >= 0]
            if len(cyc):
                M = np.full(ns_, np.iinfo(np.int64).max, dtype=np.int64)
                M[cyc] = cyc
                Pc = np.full(ns_, -1, dtype=np.int64)
                Pc[cyc] = pred[cyc]       # cycle preds stay in-cycle
                a3 = np.flatnonzero(Pc >= 0)
                for _ in range(rounds):
                    if not len(a3):
                        break
                    Mn = np.minimum(M[a3], M[Pc[a3]])
                    # stable M means every window already holds its
                    # cycle's min — further doubling is a no-op
                    if bool(np.array_equal(Mn, M[a3])):
                        break
                    M[a3] = Mn
                    Pc[a3] = Pc[Pc[a3]]
                pred[np.unique(M[cyc])] = -1
                P1, dist = _heads(pred)
            head = np.where(P1 >= 0, P1, np.arange(ns_))
            o3 = np.lexsort((dist, head))
            ch = head[o3]
            nb = np.concatenate([[True], ch[1:] != ch[:-1]])
            rid_new = np.cumsum(nb) - 1
            clen = np.bincount(rid_new)
            base_r = int(ERING.max()) + 1 if len(ERING) else 0
            perm = np.concatenate([np.flatnonzero(~sel), si[o3]])
            imap = np.empty(E, dtype=np.int64)
            imap[perm] = np.arange(E)
            X1, Y1, X2, Y2 = X1[perm], Y1[perm], X2[perm], Y2[perm]
            EROW, EW = EROW[perm], EW[perm]
            nsel = E - ns_
            ERING = np.concatenate([ERING[~sel], base_r + rid_new])
            EPOS = np.concatenate([EPOS[~sel], dist[o3]])
            ELEN = np.concatenate([ELEN[~sel], clen[rid_new]])
            if len(I):
                I, J = imap[I], imap[J]
    if PROFILE:
        _pt = _tick(_pt, "p2b_restitch_only")

    d1x = X2[I] - X1[I]; d1y = Y2[I] - Y1[I]
    d2x = X2[J] - X1[J]; d2y = Y2[J] - Y1[J]
    wx = X1[J] - X1[I]; wy = Y1[J] - Y1[I]
    den = d1x * d2y - d1y * d2x
    L1 = np.hypot(d1x, d1y)
    L2 = np.hypot(d2x, d2y)
    eps_p = eps_row[EROW[I]]
    par = np.abs(den) <= 1e-9 * L1 * L2
    den_s = np.where(par, 1.0, den)
    t = (wx * d2y - wy * d2x) / den_s
    u = (wx * d1y - wy * d1x) / den_s
    # capped: near-duplicate chain vertices (the round-arc k=0 emission)
    # make L ~ 1e-15 and an uncapped eps/L would snap EVERY crossing to an
    # endpoint; a tiny edge's own crossings are sub-eps events the bbox
    # prefilter already starves, so a 0.25 cap keeps the snap band
    # meaningful exactly where it matters
    t_tol = np.minimum(eps_p / L1, 0.25)
    u_tol = np.minimum(eps_p / L2, 0.25)
    inside = (~par & (t > -t_tol) & (t < 1 + t_tol)
              & (u > -u_tol) & (u < 1 + u_tol))
    # endpoint contacts are SNAPPED, not refused: a crossing within tol of
    # an edge endpoint splits only the edge it is interior to, exactly AT
    # the other edge's vertex coordinate (so the node keeps exact
    # coordinate identity and the multi-way chain walk resolves it);
    # vertex-vertex contacts need no split — but they ARE nodes, and the
    # segment classification must break there (see the is_node pass in
    # phase 4), and a both-snapped pair whose two vertices are NOT the
    # exact same coordinate is an eps-ambiguous near-contact we refuse
    sn_t = inside & ((np.abs(t) < t_tol) | (np.abs(t - 1) < t_tol))
    sn_u = inside & ((np.abs(u) < u_tol) | (np.abs(u - 1) < u_tol))
    vv = np.flatnonzero(sn_t & sn_u)
    if len(vv):
        t1v = (np.abs(t - 1) < t_tol)[sn_t & sn_u]
        u1v = (np.abs(u - 1) < u_tol)[sn_t & sn_u]
        vvax = np.where(t1v, X2[I[vv]], X1[I[vv]])
        vvay = np.where(t1v, Y2[I[vv]], Y1[I[vv]])
        vvbx = np.where(u1v, X2[J[vv]], X1[J[vv]])
        vvby = np.where(u1v, Y2[J[vv]], Y1[J[vv]])
        vv_mism = (vvax != vvbx) | (vvay != vvby)
        if bool(vv_mism.any()):
            bad[np.unique(EROW[I[vv[vv_mism]]])] = True
    hit = inside & ~sn_t & ~sn_u
    if PROFILE:
        _count("pairs_fin", len(I))
        _count("hits", int(hit.sum()))
    Ih, Jh = I[hit], J[hit]
    th, uh = t[hit], u[hit]
    px = X1[Ih] + th * d1x[hit]
    py = Y1[Ih] + th * d1y[hit]
    vj = sn_t & ~sn_u                     # I's vertex interior to J
    vi = sn_u & ~sn_t                     # J's vertex interior to I
    Jv = J[vj]
    t1side = (np.abs(t - 1) < t_tol)[vj]
    vjx = np.where(t1side, X2[I[vj]], X1[I[vj]])
    vjy = np.where(t1side, Y2[I[vj]], Y1[I[vj]])
    Iv = I[vi]
    Jvi = J[vi]
    u1side = (np.abs(u - 1) < u_tol)[vi]
    vix = np.where(u1side, X2[Jvi], X1[Jvi])
    viy = np.where(u1side, Y2[Jvi], Y1[Jvi])
    # rows whose rings self-intersect: signed input areas no longer bound
    # the union area (figure-eight decompositions) — relax that guard
    selfx_row = canc_row.copy()           # cancelled rows self-overlapped
    sx_pairs = inside & (ERING[I] == ERING[J])
    if bool(sx_pairs.any()):
        selfx_row[np.unique(EROW[I[sx_pairs]])] = True
    if PROFILE:
        _pt = _tick(_pt, "p2b_restitch")

    # ---- phase 3: split edges at crossings ------------------------------
    ce = np.concatenate([Ih, Jh, Jv, Iv])
    ct = np.concatenate([th, uh, u[vj], t[vi]])
    cx = np.concatenate([px, px, vjx, vix])
    cy = np.concatenate([py, py, vjy, viy])
    # winding-propagation payload (phase 4): walking a directed edge
    # through a TRANSVERSAL crossing with directed edge K changes the
    # winding of the flanking regions by -sign(cross(d_walk, d_K))·EW[K]
    # (crossing K from its left side to its right side lowers w by its
    # weight).  Snapped splits (a vertex of one chain ON the interior of
    # a foreign edge) are multi-edge events with no single-crossing
    # delta — they stay propagation BREAKS (cvalid False -> the next
    # segment is re-seeded by a fresh ray cast).
    denh = np.sign(den[hit])
    cdelta = np.concatenate([-denh * EW[Jh], denh * EW[Ih],
                             np.zeros(len(Jv)), np.zeros(len(Iv))])
    cvalid = np.concatenate([np.ones(2 * len(Ih), dtype=bool),
                             np.zeros(len(Jv) + len(Iv), dtype=bool)])
    o = np.lexsort((ct, ce))
    ce, ct, cx, cy = ce[o], ct[o], cx[o], cy[o]
    cdelta, cvalid = cdelta[o], cvalid[o]
    if len(ce):
        # snapped splits can legitimately coincide (both chain edges at a
        # node snap the same foreign edge to the same vertex): dedupe
        # exact-coordinate duplicates, then refuse only genuinely
        # ambiguous near-duplicates (distinct coordinates within tol)
        same = (ce[1:] == ce[:-1]) & (np.abs(ct[1:] - ct[:-1])
                                      < (eps_row[EROW[ce[1:]]]
                                         / np.hypot(X2[ce[1:]] - X1[ce[1:]],
                                                    Y2[ce[1:]] - Y1[ce[1:]])))
        if bool(same.any()):
            exact = same & (cx[1:] == cx[:-1]) & (cy[1:] == cy[:-1])
            dup = same & ~exact
            if bool(dup.any()):
                bad[np.unique(EROW[ce[1:][dup]])] = True
            if bool(exact.any()):
                # a merged duplicate keeps the survivor's delta only when
                # the pair agree on it — a (transversal, snapped) clash at
                # one exact coordinate must stay a propagation break
                agree = exact & (cvalid[1:] == cvalid[:-1]) \
                    & (cdelta[1:] == cdelta[:-1])
                clash = exact & ~agree
                if bool(clash.any()):
                    cvalid[1:][clash] = False
                    cvalid[:-1][clash] = False
                keep_c = np.concatenate([[True], ~exact])
                ce, ct = ce[keep_c], ct[keep_c]
                cx, cy = cx[keep_c], cy[keep_c]
                cdelta, cvalid = cdelta[keep_c], cvalid[keep_c]
    # early reject: every phase-2/3 guard has fired by now, and for the
    # benchmark's collection soups (raw offset curves with exactly
    # collinear spokes) a large fraction of rows IS degenerate — drop
    # their edges before the expensive winding classification instead of
    # classifying segments the emitter will never read
    if bool(bad.any()):
        ekeep = ~bad[EROW]
        if not ekeep.all():
            if not ekeep.any():
                return out
            emap = np.cumsum(ekeep) - 1
            X1, Y1, X2, Y2 = X1[ekeep], Y1[ekeep], X2[ekeep], Y2[ekeep]
            EROW, ERING, EW = EROW[ekeep], ERING[ekeep], EW[ekeep]
            E = len(X1)
            if len(ce):
                ckeep = ekeep[ce]
                ce, ct = emap[ce[ckeep]], ct[ckeep]
                cx, cy = cx[ckeep], cy[ckeep]
                cdelta, cvalid = cdelta[ckeep], cvalid[ckeep]
    c_per = np.bincount(ce, minlength=E)
    sub_per = c_per + 1
    S = int(sub_per.sum())
    sub_base = np.concatenate([[0], np.cumsum(sub_per)[:-1]])
    sx1 = np.empty(S); sy1 = np.empty(S)
    sx2 = np.empty(S); sy2 = np.empty(S)
    sx1[sub_base] = X1; sy1[sub_base] = Y1
    last = sub_base + sub_per - 1
    sx2[last] = X2; sy2[last] = Y2
    # per-sub propagation payload: the sub that STARTS at split k (slot+1)
    # inherits that split's winding delta; slot-0 subs start at a plain
    # chain vertex (no split -> no delta, not propagatable)
    sub_bdelta = np.zeros(S)
    sub_bvalid = np.zeros(S, dtype=bool)
    if len(ce):
        gstart = np.concatenate([[True], ce[1:] != ce[:-1]])
        first_idx = np.flatnonzero(gstart)
        grp = np.cumsum(gstart) - 1
        rank = np.arange(len(ce)) - first_idx[grp]
        slot = sub_base[ce] + rank
        sx1[slot + 1] = cx; sy1[slot + 1] = cy
        sx2[slot] = cx; sy2[slot] = cy
        sub_bdelta[slot + 1] = cdelta
        sub_bvalid[slot + 1] = cvalid
    sparent = np.repeat(np.arange(E), sub_per)
    srow_s = EROW[sparent]
    sring = ERING[sparent]
    sw = EW[sparent]
    if PROFILE:
        _pt = _tick(_pt, "p3_split")

    # ---- phase 4: segments (maximal runs between crossings) -------------
    # sub-edges are in chain order within each ring (edges by ring pos,
    # sub-edges by t).  A segment starts at a crossing start (slot >= 1)
    # or at the ring's first sub-edge.
    is_slot0 = np.zeros(S, dtype=bool)
    is_slot0[sub_base] = True
    ring_first_sub = np.concatenate(
        [[True], sring[1:] != sring[:-1]])
    # a cancellation rebuild can leave a ring's surviving edges
    # non-contiguous — a segment must also break where consecutive
    # sub-edges don't share an exact endpoint, or emission would bridge
    # the gap with a phantom edge
    chain_brk = np.concatenate(
        [[True], (sx1[1:] != sx2[:-1]) | (sy1[1:] != sy2[:-1])])
    # NODES: an exact coordinate where MULTIPLE chain passes meet (two
    # rings sharing a vertex, a ring touching itself, or a snapped
    # split) — winding can change across such a vertex even though no
    # edge was split, so segments must break there.  Counterexample that
    # forced this: two translated 32-gon circles intersecting EXACTLY at
    # two shared vertices have zero transversal crossings, yet their
    # union boundary crosses at those vertices (each whole ring is NOT
    # one constant-winding segment).
    ovx = np.lexsort((sy1, sx1, srow_s))
    same_pt = ((srow_s[ovx][1:] == srow_s[ovx][:-1])
               & (sx1[ovx][1:] == sx1[ovx][:-1])
               & (sy1[ovx][1:] == sy1[ovx][:-1]))
    dup_sorted = np.zeros(S, dtype=bool)
    dup_sorted[1:] |= same_pt
    dup_sorted[:-1] |= same_pt
    is_node = np.zeros(S, dtype=bool)
    is_node[ovx[dup_sorted]] = True
    seg_start = (~is_slot0) | ring_first_sub | chain_brk | is_node
    seg_id = np.cumsum(seg_start) - 1
    NSEG = int(seg_id[-1]) + 1
    seg_first = np.flatnonzero(seg_start)         # first sub of each seg
    seg_last = np.append(seg_first[1:] - 1, S - 1)

    # SEEDS vs PROPAGATED segments: a segment whose start boundary is a
    # single transversal crossing inherits its winding from the previous
    # segment of the chain (w_right += the crossing's delta) — only ring
    # starts, chain breaks, true multi-pass nodes and snapped splits need
    # a fresh ray cast.  On crossing-dense soups this cuts the stab
    # volume from one query per segment (~2x crossings) to ~one per ring.
    #
    # is_node above is deliberately coarse (every split point is shared
    # by BOTH crossing edges' continuation subs, so ordinary transversal
    # crossings are marked too — the chain walk needs that).  For
    # propagation, refine it: a start coordinate shared by EXACTLY two
    # split-continuation subs is an ordinary two-edge crossing with a
    # known delta; >= 3 passes, or any slot-0 (plain vertex) share, is a
    # genuine node the single-crossing delta cannot describe.
    key_change = np.concatenate([[True], ~same_pt])
    gid = np.cumsum(key_change) - 1
    gsz = np.bincount(gid)
    g_has0 = np.zeros(len(gsz), dtype=bool)
    np.logical_or.at(g_has0, gid, is_slot0[ovx])
    sub_gsz = np.empty(S, dtype=np.int64)
    sub_gsz[ovx] = gsz[gid]
    sub_has0 = np.empty(S, dtype=bool)
    sub_has0[ovx] = g_has0[gid]
    node3 = (sub_gsz > 2) | ((sub_gsz == 2) & sub_has0)
    fsub = seg_first
    prop_ok = sub_bvalid[fsub] & ~ring_first_sub[fsub] \
        & ~chain_brk[fsub] & ~node3[fsub]
    seed = ~prop_ok
    seed_idx = np.flatnonzero(seed)
    if PROFILE:
        _count("seed_ring_first", int(ring_first_sub[fsub][seed].sum()))
        _count("seed_chain_brk", int((chain_brk[fsub] & ~ring_first_sub[fsub])[seed].sum()))
        _count("seed_node3", int((node3[fsub] & ~chain_brk[fsub]
                                  & ~ring_first_sub[fsub])[seed].sum()))
        _count("seed_invalid", int((~sub_bvalid[fsub] & ~node3[fsub]
                                    & ~chain_brk[fsub]
                                    & ~ring_first_sub[fsub])[seed].sum()))
        _count("segs_total", NSEG)
        _pt = _tick(_pt, "p4a_segs")

    # representative sub-edge per segment: the longest NON-horizontal one
    # (any sub-edge of the run works — winding is constant along it — and
    # a non-horizontal rep takes the cheap y-binned vertical-ray path;
    # only segments that are horizontal END TO END fall to the
    # full-row transposed scan below)
    slen2 = (sx2 - sx1) ** 2 + (sy2 - sy1) ** 2
    rep_metric = np.where(sy2 == sy1, slen2 - (slen2.max() + 1.0), slen2)
    rep = np.empty(NSEG, dtype=np.int64)
    # segments are contiguous sub runs, so a reduceat max replaces the
    # former lexsort; ties resolve to the highest sub index (identical
    # to the stable lexsort's last-write winner)
    best_m = np.maximum.reduceat(rep_metric, seg_first)
    cand = rep_metric == best_m[seg_id]
    rep[seg_id[cand]] = np.flatnonzero(cand)

    rx1, ry1 = sx1[rep], sy1[rep]
    rx2, ry2 = sx2[rep], sy2[rep]
    rrow = srow_s[rep]
    mx = 0.5 * (rx1 + rx2)
    my = 0.5 * (ry1 + ry2)
    rdx = rx2 - rx1
    rdy = ry2 - ry1
    rhoriz = rdy == 0.0

    # y-binned stabbing over SUB-edges, queried only at representatives
    sylo = np.minimum(sy1, sy2)
    syhi = np.maximum(sy1, sy2)
    dy_s = sy2 - sy1
    dx_s = sx2 - sx1
    shoriz = dy_s == 0.0
    ylo_row = np.full(n_rows, np.inf)
    yhi_row = np.full(n_rows, -np.inf)
    np.minimum.at(ylo_row, srow_s, sylo)
    np.maximum.at(yhi_row, srow_s, syhi)
    subs_in_row = np.bincount(srow_s, minlength=n_rows)
    # bin height ~ the row's mean sub-edge |dy| so a typical sub-edge
    # occupies ~1-2 bins (bins sized by COUNT alone overbin arc-dense
    # soups ~14x, and occupancy cost is linear in bins-per-edge)
    span_row = yhi_row - ylo_row
    dy_sum = np.zeros(n_rows)
    np.add.at(dy_sum, srow_s, syhi - sylo)
    mean_dy = dy_sum / np.maximum(subs_in_row, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        want = 2.0 * span_row / np.maximum(mean_dy, 1e-300)
    want = np.where(np.isfinite(want), want, 1.0)
    # 2x the mean-dy estimate and a 32k cap: crossing-dense soups (the
    # complex collection shapes) split edges into ~6x more sub-edges
    # than the input, and underbinning there made the stabbing volume
    # ~20x the occupancy (48M candidate reads for 150 rows)
    nbins = np.clip(want.astype(np.int64), 1,
                    np.clip(subs_in_row, 1, 32768))
    flat = (span_row <= 0) & (subs_in_row > 0)
    if bool(flat.any()):
        bad |= flat
    bin_base = np.concatenate([[0], np.cumsum(nbins)[:-1]])

    # equal-occupancy (quantile) cuts per row: a LINEAR y-grid crowds at
    # arc extremes (the boundary's y-density diverges where a curve
    # turns horizontal), so on circle-heavy soups hot bins carried
    # ~10-20x the mean stab volume; quantile cuts hold ~equal sub-edge
    # centers per bin by construction
    yc = 0.5 * (sylo + syhi)
    # a cancellation rebuild appends emitted edges after the kept ones,
    # so srow_s is NOT row-sorted in general — group via stable argsort
    sub_ord = np.argsort(srow_s, kind="stable")
    row_sub = np.searchsorted(srow_s[sub_ord], np.arange(n_rows + 1))
    if PROFILE:
        _pt = _tick(_pt, "p4b_binsetup")

    def _vert_stab(q_rep, q_cand, own):
        """Vertical-ray classification of (query rep, candidate sub)
        pairs -> partial w_rest bincount (shared by the binned big-row
        path and the full-row small-row path)."""
        sel = q_cand != own
        q_rep, q_cand = q_rep[sel], q_cand[sel]
        qy = my[q_rep]
        up = (sy1[q_cand] <= qy) & (qy < sy2[q_cand])
        dn = (sy2[q_cand] <= qy) & (qy < sy1[q_cand])
        strad = up | dn
        q_rep, q_cand = q_rep[strad], q_cand[strad]
        qy = qy[strad]
        sgn = np.where(up[strad], 1.0, -1.0) * sw[q_cand]
        x_at = sx1[q_cand] + (qy - sy1[q_cand]) \
            * (dx_s[q_cand] / dy_s[q_cand])
        on_edge = np.abs(x_at - mx[q_rep]) < eps_row[rrow[q_rep]]
        if bool(on_edge.any()):
            bad[np.unique(rrow[q_rep[on_edge]])] = True
        hs = x_at > mx[q_rep]
        return np.bincount(q_rep[hs], weights=sgn[hs], minlength=NSEG)

    qv = np.flatnonzero(~rhoriz & seed)   # vertical-ray SEED reps only
    # Routing between the two stab tiers is WORK-based: a full-row scan
    # costs seeds_r x subs_r straddle tests, while the binned path pays
    # at least one global sort share + occupancy insertion per sub-edge
    # (O(subs_r log subs_r)) before the first query is answered.  Rows
    # with few seeds — the 500-vertex complex collections run ~3 seeds
    # over ~1.5k subs — are strictly cheaper to full-scan, and tiny rows
    # always are (the whole sub-edge list is a few cache lines).  Only
    # rows where the scan volume exceeds FULLSCAN_WORK (seed-dense AND
    # sub-dense, e.g. the simple collections' ~15 x ~500) amortize the
    # bin build.
    seed_per_row = np.bincount(rrow[qv], minlength=n_rows)
    small_row = ((subs_in_row <= 64)
                 | (seed_per_row * subs_in_row <= FULLSCAN_WORK))
    q_small = qv[small_row[rrow[qv]]]
    q_big = qv[~small_row[rrow[qv]]]
    w_rest = np.zeros(NSEG)
    if len(q_small):
        scnt = subs_in_row[rrow[q_small]]
        sp_row = np.zeros(n_rows, dtype=np.int64)
        np.add.at(sp_row, rrow[q_small], scnt)
        if bool((sp_row > MAX_ROW_WORK).any()):
            bad |= sp_row > MAX_ROW_WORK
            qm = ~bad[rrow[q_small]]
            q_small, scnt = q_small[qm], scnt[qm]
        SP = int(scnt.sum())
        s_rep = np.repeat(q_small, scnt)
        sstart = np.concatenate([[0], np.cumsum(scnt)[:-1]])
        s_cand = sub_ord[np.arange(SP) - np.repeat(sstart, scnt)
                         + np.repeat(row_sub[rrow[q_small]], scnt)]
        w_rest += _vert_stab(s_rep, s_cand,
                             np.repeat(rep[q_small], scnt))
    if PROFILE:
        _pt = _tick(_pt, "p4c_smallstab")
    if len(q_big):
        # quantile cuts + needed-bin occupancy, built ONLY over the rows
        # that actually carry a big-row query
        need_row = np.zeros(n_rows, dtype=bool)
        need_row[rrow[q_big]] = True
        cut_cnt = np.where(need_row, np.maximum(nbins - 1, 0), 0)
        cut_base = np.concatenate([[0], np.cumsum(cut_cnt)[:-1]])
        # quantile cut VALUES via one global (row, yc) sort — positional
        # selection from each row's sorted slice, identical values to the
        # former per-row np.sort loop (same multiset, same indices)
        K_tot = int(cut_cnt.sum())
        o_glob = np.lexsort((yc, srow_s))
        ys_sorted = yc[o_glob]
        rrep_c = np.repeat(np.arange(n_rows), cut_cnt)
        jq = np.arange(K_tot) - np.repeat(cut_base, cut_cnt) + 1
        cnt_r = (row_sub[rrep_c + 1] - row_sub[rrep_c])
        CUTS = ys_sorted[row_sub[rrep_c]
                         + np.minimum((jq * cnt_r) // (cut_cnt[rrep_c] + 1),
                                      cnt_r - 1)]

        def _row_bins(sub_rows, *yvals_list):
            """Bin index of each y value within its row's quantile cuts —
            accepts several y arrays over the SAME rows so one grouping
            sort serves all of them (the sub-edge lo/hi occupancy
            pair).  (A merge-count lexsort formulation was measured ~10%
            SLOWER end-to-end: the rows are small, so the per-row
            searchsorted loop beats a global 3-key sort.)"""
            res_list = [np.zeros(len(yv), dtype=np.int64)
                        for yv in yvals_list]
            o = np.argsort(sub_rows, kind="stable")
            bnd = np.searchsorted(sub_rows[o], np.arange(n_rows + 1))
            for r in np.flatnonzero(np.diff(bnd) > 0):
                a, z = int(bnd[r]), int(bnd[r + 1])
                cb, k = int(cut_base[r]), int(cut_cnt[r])
                if k:
                    sel = o[a:z]
                    for res, yv in zip(res_list, yvals_list):
                        res[sel] = np.searchsorted(CUTS[cb:cb + k],
                                                   yv[sel])
            return res_list[0] if len(res_list) == 1 else res_list

        nbins_tot = int(bin_base[-1] + nbins[-1])
        qbin = _row_bins(rrow[q_big], my[q_big]) + bin_base[rrow[q_big]]
        needed_b = np.zeros(nbins_tot, dtype=bool)
        needed_b[qbin] = True
        ncum = np.concatenate([[0], np.cumsum(needed_b)])
        nh = np.flatnonzero(~shoriz & need_row[srow_s])
        b0, b1 = _row_bins(srow_s[nh], sylo[nh], syhi[nh])
        gb = bin_base[srow_s[nh]]
        b0 += gb
        b1 += gb
        nspan = ncum[b1 + 1] - ncum[b0]   # NEEDED bins per edge span
        hit_need = nspan > 0
        nh, b0, b1, nspan = nh[hit_need], b0[hit_need], b1[hit_need], \
            nspan[hit_need]
        # work guard stays on the FULL bin span (not just needed bins) so
        # the refusal set is identical to the pre-compression formulation
        span = b1 - b0 + 1
        occ_row = np.zeros(n_rows, dtype=np.int64)
        np.add.at(occ_row, srow_s[nh], span)
        if bool((occ_row > MAX_ROW_WORK).any()):
            bad |= occ_row > MAX_ROW_WORK
            nh_keep = ~bad[srow_s[nh]]
            nh, b0, nspan = nh[nh_keep], b0[nh_keep], nspan[nh_keep]
            span = span[nh_keep]
        # expand each edge DIRECTLY over its needed bins: positions
        # ncum[b0]..ncum[b1+1] index the compressed needed-bin list, so
        # the dead-bin entries the old full-span expansion masked away
        # (~60% on the benchmark collections) are never materialized
        nb_list = np.flatnonzero(needed_b)
        occ_edge = np.repeat(nh, nspan)
        ostart = np.concatenate([[0], np.cumsum(nspan)[:-1]])
        occ_bin = nb_list[np.arange(int(nspan.sum()))
                          - np.repeat(ostart, nspan)
                          + np.repeat(ncum[b0], nspan)]
        if PROFILE:
            _count("occ_raw", int(span.sum()))
            _count("occ_needed", len(occ_bin))
        oo = np.argsort(occ_bin, kind="stable")
        occ_edge = occ_edge[oo]
        occ_bin = occ_bin[oo]
        bin_cnt = np.bincount(occ_bin, minlength=nbins_tot)
        bin_off = np.concatenate([[0], np.cumsum(bin_cnt)[:-1]])

        qcnt = bin_cnt[qbin]
        qp_row = np.zeros(n_rows, dtype=np.int64)
        np.add.at(qp_row, rrow[q_big], qcnt)
        if bool((qp_row > MAX_ROW_WORK).any()):
            bad |= qp_row > MAX_ROW_WORK
            qm = ~bad[rrow[q_big]]
            q_big, qbin, qcnt = q_big[qm], qbin[qm], qcnt[qm]
        QP = int(qcnt.sum()) if len(q_big) else 0
        if PROFILE:
            _count("stab_qp", QP)
            _count("seeds_big", len(q_big))
            _count("seeds_small", len(q_small))
        if QP:
            q_rep = np.repeat(q_big, qcnt)
            qstart = np.concatenate([[0], np.cumsum(qcnt)[:-1]])
            q_cand = occ_edge[np.arange(QP) - np.repeat(qstart, qcnt)
                              + np.repeat(bin_off[qbin], qcnt)]
            w_rest += _vert_stab(q_rep, q_cand,
                                 np.repeat(rep[q_big], qcnt))
    if PROFILE:
        _pt = _tick(_pt, "p4d_bigstab")

    # horizontal representatives: transposed (+y ray) full-row scan
    hz = np.flatnonzero(rhoriz & seed)
    if len(hz):
        rs = np.argsort(srow_s, kind="stable")
        rfirst = np.searchsorted(srow_s[rs], np.arange(n_rows + 1))
        hr = rrow[hz]
        hcnt = rfirst[hr + 1] - rfirst[hr]
        hp_row = np.zeros(n_rows, dtype=np.int64)
        np.add.at(hp_row, hr, hcnt)
        if bool((hp_row > MAX_ROW_WORK).any()):
            bad |= hp_row > MAX_ROW_WORK
            hkeep = ~bad[hr]
            hz, hr, hcnt = hz[hkeep], hr[hkeep], hcnt[hkeep]
        HP = int(hcnt.sum()) if len(hz) else 0
        h_rep = np.repeat(hz, hcnt) if HP else np.empty(0, dtype=np.int64)
        if HP:
            hstart = np.concatenate([[0], np.cumsum(hcnt)[:-1]])
            h_cand = rs[np.arange(HP) - np.repeat(hstart, hcnt)
                        + np.repeat(rfirst[hr], hcnt)]
        else:
            h_cand = np.empty(0, dtype=np.int64)
        hm = h_cand != np.repeat(rep[hz], hcnt)
        h_rep, h_cand = h_rep[hm], h_cand[hm]
        hx = mx[h_rep]
        rgt = (sx1[h_cand] <= hx) & (hx < sx2[h_cand])
        lft = (sx2[h_cand] <= hx) & (hx < sx1[h_cand])
        hstrad = rgt | lft
        h_rep, h_cand = h_rep[hstrad], h_cand[hstrad]
        hx = hx[hstrad]
        hsgn = np.where(rgt[hstrad], -1.0, 1.0) * sw[h_cand]
        vert_c = dx_s[h_cand] == 0
        y_at = sy1[h_cand] + (hx - sx1[h_cand]) \
            * (dy_s[h_cand] / np.where(vert_c, 1.0, dx_s[h_cand]))
        good_h = ~vert_c
        on_h = good_h & (np.abs(y_at - my[h_rep]) < eps_row[rrow[h_rep]])
        if bool(on_h.any()):
            bad[np.unique(rrow[h_rep[on_h]])] = True
        selh = good_h & (y_at > my[h_rep])
        wh = np.bincount(h_rep[selh], weights=hsgn[selh], minlength=NSEG)
        w_rest[hz] = wh[hz]

    rw = sw[rep]                          # weight of the segment itself
    self_r = np.where(rhoriz, np.where(rdx > 0, -1.0, 0.0),
                      np.where(rdy < 0, -1.0, 0.0)) * rw
    w_cast = np.rint(w_rest + self_r).astype(np.int64)  # valid at seeds

    # propagate w_right from each seed through the transversal crossings:
    # groups are the maximal seed-headed segment runs (a group can never
    # cross a ring boundary — ring firsts are always seeds)
    delta = np.where(prop_ok, sub_bdelta[fsub], 0.0)
    cumd = np.cumsum(delta)
    sgrp = np.cumsum(seed) - 1
    base = w_cast[seed_idx].astype(np.float64) - cumd[seed_idx]
    w_right = np.rint(base[sgrp] + cumd).astype(np.int64)

    # ring-closure validation (free with propagation): a group covering a
    # WHOLE contiguous ring whose wrap boundary is a plain chain vertex
    # must have net winding delta 0 around the loop — a nonzero sum means
    # a crossing was missed or double-counted, so refuse the row to the
    # winding-exact sweep rather than emit a wrong boundary
    g_last = np.append(seed_idx[1:] - 1, NSEG - 1)
    f0 = fsub[seed_idx]
    l1 = seg_last[g_last]
    whole = ring_first_sub[f0] & ~is_node[f0] \
        & (sring[l1] == sring[f0]) \
        & (sx2[l1] == sx1[f0]) & (sy2[l1] == sy1[f0])
    net = cumd[g_last] - cumd[seed_idx]
    bad_loop = whole & (np.rint(net) != 0)
    if bool(bad_loop.any()):
        bad[np.unique(srow_s[f0[bad_loop]])] = True
    w_left = w_right + rw

    keep_fwd = (w_right == 0) & (w_left != 0)
    keep_rev = (w_left == 0) & (w_right != 0)
    if bool(bad.any()):
        alive = ~bad[srow_s[fsub]]
        keep_fwd &= alive
        keep_rev &= alive
    if PROFILE:
        _pt = _tick(_pt, "p4_classify")

    # ---- phase 5/6: chain kept SEGMENTS per row -------------------------
    seg_row = srow_s[seg_first]
    kept_seg = np.flatnonzero(keep_fwd | keep_rev)
    if not len(kept_seg):
        for r in range(n_rows):
            if row_has[r] and not bad[r]:
                out[r] = _EMPTY
        return out
    krow = seg_row[kept_seg]
    ko = np.argsort(krow, kind="stable")
    kseg = kept_seg[ko]
    krow = krow[ko]
    kfirst = np.searchsorted(krow, np.arange(n_rows + 1))
    krev = keep_rev[kseg]
    # directed endpoints + end-direction (for left-turn tie breaks)
    a_sub = np.where(krev, seg_last[kseg], seg_first[kseg])
    z_sub = np.where(krev, seg_first[kseg], seg_last[kseg])
    ksx = np.where(krev, sx2[a_sub], sx1[a_sub])
    ksy = np.where(krev, sy2[a_sub], sy1[a_sub])
    kex = np.where(krev, sx1[z_sub], sx2[z_sub])
    key_ = np.where(krev, sy1[z_sub], sy2[z_sub])
    # direction entering the END point / leaving the START point
    s_dx = np.where(krev, sx1[a_sub] - sx2[a_sub], sx2[a_sub] - sx1[a_sub])
    s_dy = np.where(krev, sy1[a_sub] - sy2[a_sub], sy2[a_sub] - sy1[a_sub])
    e_dx = np.where(krev, sx1[z_sub] - sx2[z_sub], sx2[z_sub] - sx1[z_sub])
    e_dy = np.where(krev, sy1[z_sub] - sy2[z_sub], sy2[z_sub] - sy1[z_sub])

    ksxl, ksyl = ksx.tolist(), ksy.tolist()
    kexl, keyl = kex.tolist(), key_.tolist()
    sdxl, sdyl = s_dx.tolist(), s_dy.tolist()
    edxl, edyl = e_dx.tolist(), e_dy.tolist()
    ksegl = kseg.tolist()
    krevl = krev.tolist()

    for r in range(n_rows):
        if not row_has[r] or bad[r]:
            continue
        a, b = int(kfirst[r]), int(kfirst[r + 1])
        if a == b:
            out[r] = _EMPTY
            continue
        by_start: dict = {}
        for k in range(a, b):
            key = (ksxl[k], ksyl[k])
            cur = by_start.get(key)
            if cur is None:
                by_start[key] = k
            elif isinstance(cur, list):
                cur.append(k)
            else:
                by_start[key] = [cur, k]
        used = [False] * (b - a)
        ring_chains: list = []
        failed = False
        for k0 in range(a, b):
            if used[k0 - a]:
                continue
            chain = [k0]
            used[k0 - a] = True
            start_key = (ksxl[k0], ksyl[k0])
            k = k0
            limit = b - a + 1
            while True:
                endp = (kexl[k], keyl[k])
                if endp == start_key:
                    break
                nxt = by_start.get(endp)
                if nxt is None:
                    failed = True
                    break
                if isinstance(nxt, list):
                    ux, uy = edxl[k], edyl[k]
                    best = None
                    best_ang = None
                    for c in nxt:
                        if used[c - a]:
                            continue
                        vx, vy = sdxl[c], sdyl[c]
                        ang = math.atan2(ux * vy - uy * vx,
                                         ux * vx + uy * vy)
                        if best is None or ang > best_ang:
                            best, best_ang = c, ang
                    if best is None:
                        failed = True
                        break
                    nxt = best
                elif used[nxt - a]:
                    failed = True
                    break
                chain.append(nxt)
                used[nxt - a] = True
                k = nxt
                if len(chain) > limit:
                    failed = True
                    break
            if failed:
                break
            ring_chains.append(chain)
        if failed or not all(used):
            continue                       # leave None -> caller falls back
        # emit vertex arrays: per segment, slice the sub-edge run
        rings_out: list = []
        ok_row = True
        for chain in ring_chains:
            pieces = []
            for k in chain:
                sg = ksegl[k]
                f, l = int(seg_first[sg]), int(seg_last[sg])
                # each sub-edge contributes its start point; the segment's
                # final endpoint is the next piece's first point
                arr = np.empty((l - f + 1, 2))
                if krevl[k]:
                    arr[:, 0] = sx2[f:l + 1][::-1]
                    arr[:, 1] = sy2[f:l + 1][::-1]
                else:
                    arr[:, 0] = sx1[f:l + 1]
                    arr[:, 1] = sy1[f:l + 1]
                pieces.append(arr)
            ring = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
            if len(ring) >= 3:
                rings_out.append(ring)
            elif len(ring) > 0:
                ok_row = False
                break
        if not ok_row:
            continue
        out[r] = _assemble(rings_out, rows[r],
                           float(eps_row[r]) * float(scale[r]),
                           bool(selfx_row[r]))
    if PROFILE:
        _tick(_pt, "p56_chain")
    return out


def _assemble(rings: list, in_rings: list, eps_area: float,
              selfx: bool):
    """Shell/hole assembly + area sanity vs the input soup."""
    if not rings:
        return _EMPTY
    areas = [_shoelace(p) for p in rings]
    shells = [(abs(a), i) for i, a in enumerate(areas) if a > 0]
    holes = [i for i, a in enumerate(areas) if a < 0]
    if not shells:
        return None
    in_areas = [_shoelace(np.asarray(p)) for p in in_rings]
    net = sum(areas)
    tol = max(eps_area, 1e-9) * max(1.0, sum(abs(a) for a in in_areas))
    if not selfx:
        # union area bounds: at most the sum of the input shells; at
        # least the largest shell minus everything the input holes could
        # carve out of it.  A negative ring is a HOLE only when it sits
        # inside a positive ring — a standalone CW ring is a winding -1
        # region, counted positively by {w != 0} on both engines.
        # (Signed input areas do not bound the union once a ring
        # self-intersects — skipped for those rows.)
        pos_in = [a for a in in_areas if a > 0]
        neg_hole = 0.0
        for i, a in enumerate(in_areas):
            if a >= 0:
                continue
            p0 = np.asarray(in_rings[i])[0]
            if any(aj > 0 and _pt_in_ring(p0[0], p0[1],
                                          np.asarray(in_rings[j]))
                   for j, aj in enumerate(in_areas)):
                neg_hole += -a
            else:
                pos_in.append(-a)
        if pos_in and (net < max(pos_in) - neg_hole - tol
                       or net > sum(pos_in) + tol):
            return None
    polys: list = [[_close(rings[i])] for _, i in sorted(shells,
                                                         reverse=True)]
    shell_order = [i for _, i in sorted(shells, reverse=True)]
    for hidx in holes:
        hp = rings[hidx][0]
        owner = None
        for si in range(len(shell_order) - 1, -1, -1):
            if _pt_in_ring(hp[0], hp[1], rings[shell_order[si]]):
                owner = si
                break
        if owner is None:
            return None
        polys[owner].append(_close(rings[hidx]))
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def _shoelace(p: np.ndarray) -> float:
    x, y = p[:, 0], p[:, 1]
    return 0.5 * (float(np.dot(x[:-1], y[1:]) - np.dot(y[:-1], x[1:]))
                  + float(x[-1] * y[0] - y[-1] * x[0]))


def _close(p: np.ndarray) -> np.ndarray:
    out = np.empty((len(p) + 1, 2))
    out[:-1] = p
    out[-1] = p[0]
    return out


def _pt_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    strad = (y <= py) != (y2 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x + (py - y) * (x2 - x) / np.where(y2 == y, 1.0, y2 - y)
    return bool((strad & (xi > px)).sum() % 2 == 1)
