"""Cross-row batched offset-curve construction for ST_Buffer.

The per-row builders (`buffer._ring_offset_curve`,
`buffer._polyline_offset_curve`) are already vectorized per geometry,
but a GeometryCollection batch spends most of its wall time in their
per-call numpy fixed overhead: the benchmark's collection rows carry
1-3 children of <= 10 vertices each, so a 2,000-row Arrow batch makes
~4,000 builder calls of ~50 numpy ops on length-10 arrays.

This module runs the SAME constructions over the concatenated vertex
soup of the whole batch — one flat pass for every ring / polyline in
the batch.  Bitwise parity with the per-row builders holds by
construction: every operation is an elementwise IEEE ufunc applied to
the same operand values in the same order (hypot / arctan2 / cos /
sin / mul / div), never a reduction whose association order could
differ, so slicing the flat result per geometry reproduces the
per-row bytes exactly (pinned by tests/test_buffer_batch.py and the
batch-vs-per-row differential fuzz).

Only the round-join construction is batched (the reference/GEOS
default and the only style the benchmark shapes exercise); mitre /
bevel joins fall back to the per-row builders at the call sites.

Reference parity target: the GEOS OffsetCurveBuilder semantics the
per-row builders replay (see buffer.py docstrings; reference rows in
/root/reference/python/sedonadb/tests/test_functions.py).
"""

from __future__ import annotations

import math

import numpy as np

from sedona_db_spark.geometry.buffer import (_SIMPLIFY_FACTOR,
                                             BufferParams,
                                             buffer_input_simplify_batch)

__all__ = ["batch_ring_curves", "batch_polyline_curves"]


def _corner_blocks(V: np.ndarray, nxt: np.ndarray, prv: np.ndarray,
                   first: np.ndarray, dd: np.ndarray, p: BufferParams,
                   synth: np.ndarray | None = None):
    """Flat corner-block construction shared by rings and open chains.

    ``V`` is the concatenated vertex table, ``nxt[i]``/``prv[i]`` the
    cyclic (rings) or clamped (chains) neighbor indices, ``first`` a
    bool mask of vertices that have NO corner block (chain endpoints;
    empty for rings), ``dd`` the per-vertex signed offset distance.

    Returns (bad_vertex_mask, block data) where block data mirrors the
    per-row builders' (p0, corner points, p1) layout: cnt per corner,
    p0/p1 coordinates, reflex mask, and the round-fillet arrays.
    """
    ax, ay = V[:, 0], V[:, 1]
    bx, by = V[nxt, 0], V[nxt, 1]
    ln = np.hypot(bx - ax, by - ay)
    if synth is not None:
        # synthetic self-edges (chain last vertices) have ln 0 — guard
        # the division; their ux/nx are masked from every consumer
        ln = np.where(synth, 1.0, ln)
    ux = (bx - ax) / ln
    uy = (by - ay) / ln
    nx = dd * uy
    ny = dd * (-ux)
    pux, puy = ux[prv], uy[prv]
    pnx, pny = nx[prv], ny[prv]
    crosses = pux * uy - puy * ux
    dots = pux * ux + puy * uy
    uturn = ~first & (crosses == 0.0) & (dots < 0.0)
    p0x = ax + pnx
    p0y = ay + pny
    p1x = ax + nx
    p1y = ay + ny
    left = ~first & (crosses > 0.0)
    refl = ~first & ~(crosses > 0.0) & ((pnx != nx) | (pny != ny))
    N = len(ax)
    m = np.zeros(N, dtype=np.int64)
    m[refl] = 1
    lj = np.flatnonzero(left)
    nsegs = a0 = inc = None
    if len(lj):
        theta = np.arctan2(np.abs(crosses[lj]), dots[lj])
        quantum = math.pi / 2.0 / p.quad_segs
        nsegs = (theta / quantum + 0.5).astype(np.int64)
        m[lj] = nsegs
        a0 = np.arctan2(-pux[lj], puy[lj])
        inc = np.where(nsegs > 0, theta / np.maximum(nsegs, 1), 0.0)
    return (uturn, ux, uy, nx, ny, p0x, p0y, p1x, p1y,
            refl, m, lj, nsegs, a0, inc, ln, crosses, pux, puy)


def _fill_blocks(starts, cnt, p0x, p0y, p1x, p1y, refl, vx, vy,
                 lj, nsegs, a0, inc, dd, tot):
    """Write the [p0, corner pts, p1] blocks into one flat point array
    (identical layout math to the per-row builders)."""
    px = np.empty(tot)
    py = np.empty(tot)
    ends = starts + cnt - 1
    px[starts] = p0x
    py[starts] = p0y
    px[ends] = p1x
    py[ends] = p1y
    rj = np.flatnonzero(refl)
    if len(rj):
        px[starts[rj] + 1] = vx[rj]
        py[starts[rj] + 1] = vy[rj]
    if nsegs is not None:
        tot_arc = int(nsegs.sum())
        if tot_arc:
            cid = np.repeat(np.arange(len(lj)), nsegs)
            base = np.concatenate([[0], np.cumsum(nsegs)[:-1]])
            k = np.arange(tot_arc) - base[cid]
            ang = a0[cid] + k * inc[cid]
            pos = starts[lj][cid] + 1 + k
            dl = dd[lj][cid]
            px[pos] = vx[lj][cid] + dl * np.cos(ang)
            py[pos] = vy[lj][cid] + dl * np.sin(ang)
    return px, py


def _dedup_rows(px, py, rstart, rcnt):
    """Per-geometry consecutive-duplicate mask over the flat points
    (each geometry's first point always kept) — the flat twin of the
    per-row ``(pts[1:] != pts[:-1]).any(axis=1)`` dedupe."""
    keep = np.empty(len(px), dtype=bool)
    keep[0] = True
    keep[1:] = (px[1:] != px[:-1]) | (py[1:] != py[:-1])
    keep[rstart] = True
    return keep


def batch_ring_curves(rings: list, dists, p: BufferParams) -> list:
    """`buffer._ring_offset_curve` for MANY oriented rings in one flat
    pass (round-join only).  ``rings`` is a list of (k, 2) float arrays
    (interior on the left), ``dists`` one signed distance per ring.
    Returns one open point array per ring, or None per ring on an
    exact U-turn spike / degenerate result (same refusal semantics)."""
    if p.join != "round":
        raise ValueError("batched builder is round-join only")
    R = len(rings)
    dists = np.asarray(dists, dtype=np.float64)
    simp = buffer_input_simplify_batch(
        rings, np.abs(dists) / _SIMPLIFY_FACTOR,
        closed=True, concave_only=True)
    lens = np.array([len(rr) for rr in simp], dtype=np.int64)
    if not len(lens) or int(lens.sum()) == 0:
        return [None] * R
    V = np.concatenate([np.asarray(rr, dtype=np.float64)[:, :2]
                        for rr in simp])
    N = len(V)
    rid = np.repeat(np.arange(R), lens)
    off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    last = off + lens - 1
    nxt = np.arange(N) + 1
    nxt[last] = off
    prv = np.arange(N) - 1
    prv[off] = last
    dd = dists[rid]
    first = np.zeros(N, dtype=bool)       # rings: every vertex corners
    (uturn, ux, uy, nx, ny, p0x, p0y, p1x, p1y,
     refl, m, lj, nsegs, a0, inc,
     _ln, _crs, _pux, _puy) = _corner_blocks(V, nxt, prv, first, dd, p)
    bad = np.zeros(R, dtype=bool)
    if bool(uturn.any()):
        bad[np.unique(rid[uturn])] = True
    cnt = m + 2
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    tot = int(cnt.sum())
    px, py = _fill_blocks(starts, cnt, p0x, p0y, p1x, p1y, refl,
                          V[:, 0], V[:, 1], lj, nsegs, a0, inc, dd, tot)
    rstart = starts[off]
    rtot = np.append(rstart[1:], tot) - rstart
    keep = _dedup_rows(px, py, rstart, rtot)
    out: list = []
    kcum = np.concatenate([[0], np.cumsum(keep)])
    pts_all = np.column_stack([px[keep], py[keep]])
    for r in range(R):
        if bad[r]:
            out.append(None)
            continue
        a = int(kcum[rstart[r]])
        b = int(kcum[rstart[r] + rtot[r]])
        pts = pts_all[a:b]
        if len(pts) > 1 and pts[0, 0] == pts[-1, 0] \
                and pts[0, 1] == pts[-1, 1]:
            pts = pts[:-1]
        out.append(pts if len(pts) >= 3 else None)
    return out


def _batch_chains(chains: list, dists, p: BufferParams,
                  clip: bool = False):
    """`buffer._open_offset_chain` (clip=False) for MANY open chains in
    one flat pass.  Returns (point array per chain or None,
    per-chain unit direction of first/last edge) — the directions feed
    the caps."""
    C = len(chains)
    lens = np.array([len(ch) for ch in chains], dtype=np.int64)
    V = np.concatenate(chains)
    N = len(V)
    cid = np.repeat(np.arange(C), lens)
    off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    last = off + lens - 1
    idx = np.arange(N)
    is_last = idx == last[cid]
    # outgoing edge of vertex i is (i -> i+1); the LAST vertex of each
    # chain has none — point it at itself and guard the division (its
    # ux/nx are never read: endpoints carry no corner block and the
    # chain start/end offsets index real edges)
    nxt = np.where(is_last, idx, idx + 1)
    prv = np.maximum(idx - 1, off[cid])
    dd = np.asarray(dists, dtype=np.float64)[cid]
    endpoint = (idx == off[cid]) | is_last
    (uturn, ux, uy, nx, ny, p0x, p0y, p1x, p1y,
     refl, m, lj, nsegs, a0, inc,
     ln, crosses, pux, puy) = _corner_blocks(V, nxt, prv, endpoint,
                                             dd, p, synth=is_last)
    bad = np.zeros(C, dtype=bool)
    if bool(uturn.any()):
        bad[np.unique(cid[uturn])] = True
    cxp = cyp = None
    if clip:
        # clipped-reflex variant (_open_offset_chain clip=True): each
        # reflex corner closes at the adjacent offset segments'
        # intersection when locally valid; any invalid clip refuses the
        # whole chain (caller falls back / uses the raw curve)
        rj0 = np.flatnonzero(refl)
        t_in = np.zeros(N)
        s_out = np.zeros(N)
        cxp = np.zeros(N)
        cyp = np.zeros(N)
        if len(rj0):
            den = crosses[rj0]
            zden = den == 0.0
            if bool(zden.any()):
                bad[np.unique(cid[rj0[zden]])] = True
            den_s = np.where(zden, 1.0, den)
            wx = p1x[rj0] - p0x[rj0]
            wy = p1y[rj0] - p0y[rj0]
            tt = (wx * uy[rj0] - wy * ux[rj0]) / den_s
            ss = (wx * puy[rj0] - wy * pux[rj0]) / den_s
            ln_in = ln[prv[rj0]]
            ln_out = ln[rj0]
            inval = (tt > 0.0) | (tt < -ln_in) | (ss < 0.0) | (ss > ln_out)
            if bool(inval.any()):
                bad[np.unique(cid[rj0[inval]])] = True
            t_in[rj0] = tt
            s_out[rj0] = ss
            cxp[rj0] = p0x[rj0] + tt * pux[rj0]
            cyp[rj0] = p0y[rj0] + tt * puy[rj0]
        # per-edge consistency across consecutive interior corners of
        # the same chain: the outgoing clip of corner v must not pass
        # the incoming clip of corner v+1 on the edge between them
        inter_m = ~endpoint
        pair = inter_m[:-1] & inter_m[1:] & (cid[:-1] == cid[1:])
        viol = pair & (s_out[:-1] > ln[:-1] + t_in[1:])
        if bool(viol.any()):
            bad[np.unique(cid[:-1][viol])] = True
    # chain layout: [start offset pt] + interior corner blocks + [end
    # offset pt]
    cnt = np.where(endpoint, 1,
                   np.where(refl, 1, m + 2) if clip else m + 2)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    tot = int(cnt.sum())
    inter = ~endpoint
    px = np.empty(tot)
    py = np.empty(tot)
    ends_b = starts + cnt - 1
    if clip:
        cvx = inter & ~refl
        px[starts[cvx]] = p0x[cvx]
        py[starts[cvx]] = p0y[cvx]
        px[ends_b[cvx]] = p1x[cvx]
        py[ends_b[cvx]] = p1y[cvx]
        rj = np.flatnonzero(refl & inter)
        if len(rj):
            px[starts[rj]] = cxp[rj]
            py[starts[rj]] = cyp[rj]
    else:
        px[starts[inter]] = p0x[inter]
        py[starts[inter]] = p0y[inter]
        px[ends_b[inter]] = p1x[inter]
        py[ends_b[inter]] = p1y[inter]
        rj = np.flatnonzero(refl & inter)
        if len(rj):
            px[starts[rj] + 1] = V[rj, 0]
            py[starts[rj] + 1] = V[rj, 1]
    if nsegs is not None and len(lj):
        tot_arc = int(nsegs.sum())
        if tot_arc:
            aid = np.repeat(np.arange(len(lj)), nsegs)
            base = np.concatenate([[0], np.cumsum(nsegs)[:-1]])
            k = np.arange(tot_arc) - base[aid]
            ang = a0[aid] + k * inc[aid]
            pos = starts[lj][aid] + 1 + k
            dl = dd[lj][aid]
            px[pos] = V[lj, 0][aid] + dl * np.cos(ang)
            py[pos] = V[lj, 1][aid] + dl * np.sin(ang)
    # chain endpoints: first = a0 + n(first edge), last = b + n(last
    # edge); first-edge index = off, last-edge start index = last-1
    fe = off
    le = last - 1
    px[starts[off]] = V[off, 0] + nx[fe]
    py[starts[off]] = V[off, 1] + ny[fe]
    px[starts[last]] = V[last, 0] + nx[le]
    py[starts[last]] = V[last, 1] + ny[le]
    cstart = starts[off]
    ctot = np.append(cstart[1:], tot) - cstart
    return px, py, cstart, ctot, bad


_CAP_NONE = 0


def batch_polyline_curves(lines: list, dists, p: BufferParams,
                          clip: bool = False) -> list:
    """`buffer._polyline_offset_curve` for MANY open
    polylines in one flat pass: right-side chain forward, end cap,
    right-side chain of the reversed line, start cap — the GEOS
    getLineCurve construction.  One closed CCW point array per line or
    None (U-turn corner / degenerate), byte-identical to the per-row
    builder."""
    if p.join != "round":
        raise ValueError("batched builder is round-join only")
    L = len(lines)
    dists = np.asarray(dists, dtype=np.float64)
    simp = buffer_input_simplify_batch(
        [np.asarray(l, dtype=np.float64) for l in lines],
        np.abs(dists) / _SIMPLIFY_FACTOR)
    ok0 = np.array([len(l) >= 2 for l in simp])
    work = np.flatnonzero(ok0)
    out: list = [None] * L
    if not len(work):
        return out
    chains: list = []
    cd: list = []
    for i in work:
        chains.append(simp[i])
        chains.append(simp[i][::-1])
        cd.append(dists[i])
        cd.append(dists[i])
    px, py, cstart, ctot, badc = _batch_chains(chains, cd, p, clip=clip)
    # caps per line: end cap (after fwd chain, direction = fwd's last
    # edge) and start cap (after rev chain, direction = rev's last edge)
    quantum = math.pi / 2.0 / p.quad_segs
    ncap = int(math.pi / quantum + 0.5) if p.endcap == "round" \
        else (2 if p.endcap == "square" else 0)
    W = len(work)
    # cap DIRECTIONS per line keep the per-row builder's scalar math
    # (math.hypot / math.atan2 — np.hypot can differ in the last ulp);
    # everything downstream — cap point arrays, the four-piece assembly,
    # consecutive-duplicate dedupe and the closing-point drop — runs as
    # ONE flat pass over all lines (the per-line loop was ~8 numpy calls
    # per 10-vertex line, pure call overhead).  np.cos/np.sin are
    # elementwise ufuncs, so the batched cap points are bitwise the
    # per-line buffer._cap_pts values.
    gw = np.array([w for w in range(W)
                   if not (badc[2 * w] or badc[2 * w + 1])],
                  dtype=np.int64)
    G = len(gw)
    if not G:
        return out
    dd = dists[work[gw]]
    ex = np.empty(G); ey = np.empty(G)      # end point / end direction
    eux = np.empty(G); euy = np.empty(G)
    sx = np.empty(G); sy = np.empty(G)      # start point / reversed dir
    sux = np.empty(G); suy = np.empty(G)
    for k2, w in enumerate(gw.tolist()):
        rr = simp[int(work[w])]
        lux = rr[-1, 0] - rr[-2, 0]
        luy = rr[-1, 1] - rr[-2, 1]
        lln = math.hypot(lux, luy)
        fux = rr[0, 0] - rr[1, 0]
        fuy = rr[0, 1] - rr[1, 1]
        fln = math.hypot(fux, fuy)
        ex[k2] = rr[-1, 0]; ey[k2] = rr[-1, 1]
        eux[k2] = lux / lln; euy[k2] = luy / lln
        sx[k2] = rr[0, 0]; sy[k2] = rr[0, 1]
        sux[k2] = fux / fln; suy[k2] = fuy / fln
    if p.endcap == "round":
        a0e = np.array([math.atan2(-u, v) for u, v
                        in zip(eux.tolist(), euy.tolist())])
        a0s = np.array([math.atan2(-u, v) for u, v
                        in zip(sux.tolist(), suy.tolist())])
        inc = math.pi / ncap
        kk = np.arange(ncap) * inc
        ang_e = a0e[:, None] + kk[None, :]
        ang_s = a0s[:, None] + kk[None, :]
        capex = ex[:, None] + dd[:, None] * np.cos(ang_e)
        capey = ey[:, None] + dd[:, None] * np.sin(ang_e)
        capsx = sx[:, None] + dd[:, None] * np.cos(ang_s)
        capsy = sy[:, None] + dd[:, None] * np.sin(ang_s)
    elif p.endcap == "square":
        capex = np.stack([ex + dd * euy + dd * eux,
                          ex - dd * euy + dd * eux], axis=1)
        capey = np.stack([ey - dd * eux + dd * euy,
                          ey + dd * eux + dd * euy], axis=1)
        capsx = np.stack([sx + dd * suy + dd * sux,
                          sx - dd * suy + dd * sux], axis=1)
        capsy = np.stack([sy - dd * sux + dd * suy,
                          sy + dd * sux + dd * suy], axis=1)
    else:                                    # flat: no cap points
        capex = capey = capsx = capsy = np.empty((G, 0))
    la = ctot[2 * gw].astype(np.int64)
    lc = ctot[2 * gw + 1].astype(np.int64)
    tot = la + lc + 2 * ncap
    O = np.concatenate([[0], np.cumsum(tot)[:-1]])
    N = int(tot.sum())

    def _ranges(starts, lens):
        n = int(lens.sum())
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        return (np.repeat(starts, lens)
                + np.arange(n) - np.repeat(off, lens))

    OX = np.empty(N); OY = np.empty(N)
    tA = _ranges(O, la)
    sA = _ranges(cstart[2 * gw], la)
    OX[tA] = px[sA]; OY[tA] = py[sA]
    tC = _ranges(O + la + ncap, lc)
    sC = _ranges(cstart[2 * gw + 1], lc)
    OX[tC] = px[sC]; OY[tC] = py[sC]
    if ncap:
        tB = ((O + la)[:, None] + np.arange(ncap)[None, :]).ravel()
        OX[tB] = capex.ravel(); OY[tB] = capey.ravel()
        tD = ((O + la + ncap + lc)[:, None]
              + np.arange(ncap)[None, :]).ravel()
        OX[tD] = capsx.ravel(); OY[tD] = capsy.ravel()
    keep = np.empty(N, dtype=bool)
    keep[0] = True
    keep[1:] = (OX[1:] != OX[:-1]) | (OY[1:] != OY[:-1])
    keep[O] = True                           # line firsts always kept
    kidx = np.flatnonzero(keep)
    kline = np.searchsorted(O, kidx, side="right") - 1
    kfirst = np.searchsorted(kline, np.arange(G + 1))
    kcnt = np.diff(kfirst)
    fi = kidx[kfirst[:-1]]
    li = kidx[kfirst[1:] - 1]
    dropl = (kcnt > 1) & (OX[fi] == OX[li]) & (OY[fi] == OY[li])
    PTS = np.column_stack([OX[kidx], OY[kidx]])
    for k2, w in enumerate(gw.tolist()):
        n2 = int(kcnt[k2]) - int(dropl[k2])
        if n2 >= 3:
            out[int(work[w])] = PTS[kfirst[k2]:kfirst[k2] + n2]
    return out


def batch_rings_cross_info(rows: list):
    """`buffer._rings_cross_info` for MANY rows of closed-curve sets in
    one flat pair scan: per-row x-interval sweep + y filter, pairs
    canonicalized to (lower, higher) original edge index so every hit's
    crossing x is computed from bitwise the same operands as the
    per-row scan.  Returns one (edges (n,4), cross_xs, simple) per row
    (xs order may differ from the sequential scan — consumers treat it
    as a multiset of slab cuts)."""
    nrows = len(rows)
    e_rows: list = []
    ering: list = []
    epos: list = []
    eclen: list = []
    erow: list = []
    ring_id = 0
    row_edge_base = np.zeros(nrows + 1, dtype=np.int64)
    for r, curves in enumerate(rows):
        for pts in curves:
            mm = len(pts)
            e = np.concatenate([pts, np.vstack([pts[1:], pts[:1]])],
                               axis=1)
            e_rows.append(e)
            ering.append(np.full(mm, ring_id, dtype=np.int64))
            epos.append(np.arange(mm, dtype=np.int64))
            eclen.append(np.full(mm, mm, dtype=np.int64))
            erow.append(np.full(mm, r, dtype=np.int64))
            ring_id += 1
        row_edge_base[r + 1] = row_edge_base[r] + sum(
            len(c) for c in curves)
    if not e_rows:
        return [(np.empty((0, 4)), np.empty(0), True)] * nrows
    E = np.concatenate(e_rows)
    RING = np.concatenate(ering)
    POS = np.concatenate(epos)
    CLEN = np.concatenate(eclen)
    ROW = np.concatenate(erow)
    NE = len(E)
    x1, y1, x2, y2 = E[:, 0], E[:, 1], E[:, 2], E[:, 3]
    bxmin = np.minimum(x1, x2)
    bxmax = np.maximum(x1, x2)
    bymin = np.minimum(y1, y2)
    bymax = np.maximum(y1, y2)
    order = np.lexsort((bxmin, ROW))
    sx_min = bxmin[order]
    srow = ROW[order]
    row_first = np.searchsorted(srow, np.arange(nrows + 1))
    hi = np.empty(NE, dtype=np.int64)
    for r in np.flatnonzero(np.diff(row_first) > 0):
        a, b = int(row_first[r]), int(row_first[r + 1])
        hi[a:b] = a + np.searchsorted(sx_min[a:b], bxmax[order[a:b]],
                                      side="right")
    base = np.arange(NE) + 1
    cnt = np.maximum(hi - base, 0)
    P = int(cnt.sum())
    pi = np.repeat(np.arange(NE), cnt)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    pj = np.arange(P) - np.repeat(starts, cnt) + np.repeat(base, cnt)
    gI = order[pi]
    gJ = order[pj]
    m = (bymin[gI] <= bymax[gJ]) & (bymin[gJ] <= bymax[gI])
    gI, gJ = gI[m], gJ[m]
    samering = RING[gI] == RING[gJ]
    dpos = np.abs(POS[gI] - POS[gJ])
    adj = samering & ((dpos == 1) | (dpos == CLEN[gI] - 1))
    gI, gJ = gI[~adj], gJ[~adj]
    # canonical (lower, higher) original index — per-row operand order
    swap = gI > gJ
    lo = np.where(swap, gJ, gI)
    hi2 = np.where(swap, gI, gJ)
    d1x = x2[lo] - x1[lo]
    d1y = y2[lo] - y1[lo]
    d2x = x2[hi2] - x1[hi2]
    d2y = y2[hi2] - y1[hi2]
    den = d1x * d2y - d1y * d2x
    ok = den != 0
    den_s = np.where(ok, den, 1.0)
    wx = x1[hi2] - x1[lo]
    wy = y1[hi2] - y1[lo]
    t = (wx * d2y - wy * d2x) / den_s
    u = (wx * d1y - wy * d1x) / den_s
    hit = ok & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    col = ~ok & (wx * d1y - wy * d1x == 0.0)
    bad_simple = np.zeros(nrows, dtype=bool)
    if bool(hit.any()):
        bad_simple[np.unique(ROW[lo[hit]])] = True
    if bool(col.any()):
        bad_simple[np.unique(ROW[lo[col]])] = True
    xs_all = (x1[lo] + t * d1x)[hit]
    xs_row = ROW[lo[hit]]
    xo = np.argsort(xs_row, kind="stable")
    xs_sorted = xs_all[xo]
    xrow_bounds = np.searchsorted(xs_row[xo], np.arange(nrows + 1))
    out: list = []
    for r in range(nrows):
        e_r = E[row_edge_base[r]:row_edge_base[r + 1]]
        xs_r = xs_sorted[xrow_bounds[r]:xrow_bounds[r + 1]]
        out.append((e_r, xs_r, not bool(bad_simple[r])))
    return out
