"""Batched N-way winding union: many rows' part soups in ONE numpy sweep.

``overlay.union_polygons`` is exact but Python-loop-heavy per shape: the
slab sweep walks slabs and active edges in interpreted code, and the
quad-merge keys go through ``round()`` one float at a time — ~7 ms for a
10-vertex concave buffer soup, which made the generic ``ST_Buffer`` tier
the one surface >2x the reference's published number
(/root/reference/benchmarks/README.md:70-85; round-5 VERDICT item #1).

This module reproduces the IDENTICAL computation — same slab x-grid, same
stable ordering, same winding bands, same vertical/horizontal merges, same
dissolve — but flattened across a whole Arrow batch of rows:

- per-row prep (edge extraction, pairwise intersection x's) stays small
  numpy per row;
- the sweep itself becomes one ``np.lexsort`` + segmented cumsum over the
  concatenated (row, slab, edge) incidence table — no Python loop over
  slabs or active edges;
- band→quad horizontal merging keeps the original sequential dict
  semantics but with all key rounding vectorized up front;
- the final quad→ring dissolve is the existing exact
  ``dissolve.quads_to_polygons`` per row.

Identity with the per-row path is property-tested (byte equality of the
encoded result) in tests/test_buffer_batch.py; the per-row path remains
the semantic reference.
"""

from __future__ import annotations

import numpy as np

from sedona_db_spark.geometry.overlay import (
    _pairwise_intersection_xs_vec,
)

_EMPTY = ("GeometryCollection", [])


def _edges_of_parts(parts: list) -> np.ndarray:
    """Vectorized twin of ``overlay._directed_edges_of``: same edges in the
    same order with the same orientation decisions (the shoelace sign uses
    the identical np.dot float path), but ring→segment expansion is numpy
    slicing instead of a per-vertex Python loop."""
    segs: list = []

    def add_ring(ring, want_ccw: bool):
        r = np.asarray(ring, dtype=np.float64)[:, :2]
        if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
            r = r[:-1]
        if len(r) < 3:
            return
        x = np.concatenate([r[:, 0], r[:1, 0]])
        y = np.concatenate([r[:, 1], r[:1, 1]])
        yr = np.concatenate([y[1:], y[:1]])
        xr = np.concatenate([x[1:], x[:1]])
        ccw = float(np.dot(x, yr) - np.dot(y, xr)) > 0
        if ccw != want_ccw:
            r = r[::-1]
        e = np.concatenate([r, np.concatenate([r[1:], r[:1]])], axis=1)
        keep = (e[:, 0] != e[:, 2]) | (e[:, 1] != e[:, 3])
        segs.append(e[keep] if not keep.all() else e)

    def add_part(g):
        if g is None:
            return
        if isinstance(g, np.ndarray):
            # pre-built directed edges (pooled offset curves from the
            # collection buffer route) — already winding-true, in order
            if len(g):
                segs.append(np.asarray(g, dtype=np.float64))
            return
        name, payload = g
        if name == "Polygon":
            for k, ring in enumerate(payload):
                add_ring(ring, want_ccw=(k == 0))
        elif name == "MultiPolygon":
            for rings in payload:
                for k, ring in enumerate(rings):
                    add_ring(ring, want_ccw=(k == 0))
        elif name == "GeometryCollection":
            for q in payload:
                add_part(q)

    for g in parts:
        add_part(g)
    if not segs:
        return np.empty((0, 4))
    return np.concatenate(segs) if len(segs) > 1 else segs[0]


# batch chunking budget in input edges — same rationale as
# ring_union.CHUNK_EDGES: bounded temporaries reuse warm heap pages
# (see _malloc.py) and executor peak memory stays flat for any batch
CHUNK_EDGES = 32_000

# incidence-table cap for one sweep pass (~80 bytes/entry of temporaries
# -> ~640 MB peak); denser chunks sweep the slab axis in windows
SWEEP_MAX_INCIDENCE = 8_000_000


class _SweepImbalance(RuntimeError):
    """A slab's winding did not return to zero (degenerate input)."""


def _row_edge_estimate(parts) -> int:
    if isinstance(parts, tuple):
        return len(parts[0])
    if isinstance(parts, np.ndarray):
        return len(parts)
    n = 0

    def walk(g):
        nonlocal n
        if g is None:
            return
        if isinstance(g, np.ndarray):
            n += len(g)
            return
        name, payload = g
        if name == "Polygon":
            n += sum(len(r) for r in payload)
        elif name == "MultiPolygon":
            n += sum(len(r) for rr in payload for r in rr)
        elif name == "GeometryCollection":
            for q in payload:
                walk(q)

    for g in parts:
        walk(g)
    return n


def union_polygons_batch(part_rows: list, cancel: bool = False) -> list:
    """Union each row's polygonal part list, pre-built directed edge
    array, or ``(edges, cross_xs)`` pair from the offset-curve route
    (buffer._rings_cross_info already ran the pairwise pass — reuse its
    crossing x's instead of re-scanning); returns one geometry tuple per
    row.  Equivalent to ``[union_polygons(p, cancel) for p in
    part_rows]`` (``union_edges`` for ndarray / pair rows).

    Rows are processed in CHUNK_EDGES-bounded consecutive chunks (rows
    are independent, so results are identical to the unchunked call)."""
    sizes = [_row_edge_estimate(p) for p in part_rows]
    if sum(sizes) > CHUNK_EDGES and len(part_rows) > 1:
        out: list = []
        start, acc = 0, 0
        for i, s in enumerate(sizes):
            if i > start and acc + s > CHUNK_EDGES:
                out.extend(_union_polygons_chunk(part_rows[start:i], cancel))
                start, acc = i, 0
            acc += s
        out.extend(_union_polygons_chunk(part_rows[start:], cancel))
        return out
    return _union_polygons_chunk(part_rows, cancel)


def _union_polygons_chunk(part_rows: list, cancel: bool = False) -> list:
    from sedona_db_spark.geometry.overlay import cancel_opposite_edges
    n_rows = len(part_rows)
    out: list = [None] * n_rows

    # ---- per-row prep: directed edges + slab x-grid ----------------------
    edge_rows: list = []           # (row, e, xs) for non-trivial rows
    for r, parts in enumerate(part_rows):
        pre_xs = None
        if isinstance(parts, tuple):
            e, pre_xs = parts
        elif isinstance(parts, np.ndarray):
            e = parts
        else:
            e = _edges_of_parts(parts)
        if cancel:
            e = cancel_opposite_edges(e)
            pre_xs = None               # edge set changed — x's stale
        if not len(e):
            out[r] = _EMPTY
            continue
        xs = np.unique(np.concatenate([
            e[:, 0], e[:, 2],
            _pairwise_intersection_xs_vec(e) if pre_xs is None
            else pre_xs]))
        if len(xs) < 2:
            out[r] = _EMPTY
            continue
        edge_rows.append((r, e, xs))
    if not edge_rows:
        return out

    # ---- flatten edges and slab grids across rows ------------------------
    E = np.concatenate([er[1] for er in edge_rows])          # (NE, 4)
    e_row = np.repeat(np.arange(len(edge_rows)),
                      [len(er[1]) for er in edge_rows])
    XS = np.concatenate([er[2] for er in edge_rows])
    xs_len = np.array([len(er[2]) for er in edge_rows])
    xs_base = np.concatenate([[0], np.cumsum(xs_len)[:-1]])
    slab_cnt = xs_len - 1
    slab_base = np.concatenate([[0], np.cumsum(slab_cnt)[:-1]])
    n_slabs = int(slab_cnt.sum())
    # global slab -> boundary x's (slab g of row r spans XS[pos], XS[pos+1])
    slab_row = np.repeat(np.arange(len(edge_rows)), slab_cnt)
    slab_local = np.arange(n_slabs) - slab_base[slab_row]
    slab_xpos = xs_base[slab_row] + slab_local
    slab_x0 = XS[slab_xpos]
    slab_x1 = XS[slab_xpos + 1]

    x1e, y1e, x2e, y2e = E[:, 0], E[:, 1], E[:, 2], E[:, 3]
    nonvert = x1e != x2e
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = np.where(nonvert, (y2e - y1e) / np.where(nonvert,
                                                         x2e - x1e, 1.0),
                         0.0)
    exmin = np.minimum(x1e, x2e)
    exmax = np.maximum(x1e, x2e)
    sign = np.where(x2e > x1e, 1, -1).astype(np.int64)

    # admission rank per row: (exmin, original index) — the per-row
    # sweep's active list keeps admission order, so equal-ym incidences
    # must tie-break exactly this way
    order_adm = np.lexsort((np.arange(len(E)), exmin, e_row))
    adm_rank = np.empty(len(E), dtype=np.int64)
    adm_rank[order_adm] = np.arange(len(E))

    # edge -> [lo, hi) local slab span (xs contains every endpoint exactly)
    nz = np.flatnonzero(nonvert)
    if not len(nz):
        for r, _, _ in edge_rows:
            out[r] = _EMPTY
        return out
    # per-row searchsorted (offset-key tricks are unsafe on arbitrary
    # floats; two searchsorted per row is cheap).  Edges of one row are
    # contiguous in E, so nz slices per row come from searchsorted too.
    lo = np.empty(len(nz), dtype=np.int64)
    hi = np.empty(len(nz), dtype=np.int64)
    edge_cnt = np.array([len(er[1]) for er in edge_rows])
    edge_bnd = np.concatenate([[0], np.cumsum(edge_cnt)])
    nz_lo = np.searchsorted(nz, edge_bnd[:-1])
    nz_hi = np.searchsorted(nz, edge_bnd[1:])
    for ri, (r, e, xs) in enumerate(edge_rows):
        a, b = int(nz_lo[ri]), int(nz_hi[ri])
        if b > a:
            sel = nz[a:b]
            lo[a:b] = np.searchsorted(xs, exmin[sel])
            hi[a:b] = np.searchsorted(xs, exmax[sel])
    counts = hi - lo
    good = counts > 0
    nzg = nz[good]
    counts = counts[good]
    lo = lo[good]
    M = int(counts.sum())
    if M == 0:
        for r, _, _ in edge_rows:
            out[r] = _EMPTY
        return out
    # global slab span per contributing edge
    lo_g = slab_base[e_row[nzg]] + lo
    hi_g = lo_g + counts

    def _sweep_bands(eids, lo_c, cnt_c):
        """Winding bands for one slab window: sort the window's
        (slab, ym, admission) incidences, segmented-cumsum the winding,
        extract band start/end sub-intervals.  Bands never span slabs
        and windows are whole-slab-aligned, so windowed band arrays
        concatenate to exactly the single-pass result."""
        Mw = int(cnt_c.sum())
        if Mw == 0:
            return None
        inc_edge = np.repeat(eids, cnt_c)                 # edge id
        starts = np.concatenate([[0], np.cumsum(cnt_c)[:-1]])
        inc_slab = (np.arange(Mw) - np.repeat(starts, cnt_c)
                    + np.repeat(lo_c, cnt_c))
        ix0 = slab_x0[inc_slab]
        ix1 = slab_x1[inc_slab]
        xm = (ix0 + ix1) / 2.0
        ym = y1e[inc_edge] + (xm - x1e[inc_edge]) * slope[inc_edge]
        ordr = np.lexsort((adm_rank[inc_edge], ym, inc_slab))
        s_edge = inc_edge[ordr]
        s_slab = inc_slab[ordr]
        s_x0 = ix0[ordr]
        s_x1 = ix1[ordr]
        w = np.cumsum(sign[s_edge])
        grp_start = np.empty(Mw, dtype=bool)
        grp_start[0] = True
        grp_start[1:] = s_slab[1:] != s_slab[:-1]
        # reset the cumulative winding at each slab-group start (each
        # slab's signs sum to 0 for closed rings, so base is usually 0 —
        # but the subtraction keeps degenerate inputs exact too)
        gidx = np.flatnonzero(grp_start)
        gsizes = np.diff(np.append(gidx, Mw))
        base = np.concatenate([[0], w[gidx[1:] - 1]])
        w = w - np.repeat(base, gsizes)
        inside = w != 0
        prev_inside = np.empty(Mw, dtype=bool)
        prev_inside[0] = False
        prev_inside[1:] = inside[:-1]
        prev_inside[grp_start] = False
        si = np.flatnonzero(inside & ~prev_inside)
        ei = np.flatnonzero(~inside & prev_inside)
        if len(si) != len(ei):
            raise _SweepImbalance

        def y_at(idx: np.ndarray, xq: np.ndarray) -> np.ndarray:
            ee = s_edge[idx]
            y = y1e[ee] + (xq - x1e[ee]) * slope[ee]
            y = np.where(xq == x1e[ee], y1e[ee], y)
            y = np.where(xq == x2e[ee], y2e[ee], y)
            return y

        return (s_slab[si],
                y_at(si, s_x0[si]), y_at(si, s_x1[si]),
                y_at(ei, s_x0[ei]), y_at(ei, s_x1[ei]),
                s_x0[si], s_x1[si])

    try:
        if M <= SWEEP_MAX_INCIDENCE:
            parts_b = [_sweep_bands(nzg, lo_g, counts)]
        else:
            # a dense row (self-overlapping curve soup) can make the
            # incidence table quadratic in its edge count — process the
            # global slab axis in incidence-bounded windows instead of
            # allocating it whole (each window's peak is capped; the
            # concatenated bands are exactly the single-pass bands)
            occ = np.zeros(n_slabs + 1, dtype=np.int64)
            np.add.at(occ, lo_g, 1)
            np.add.at(occ, hi_g, -1)
            pref = np.cumsum(np.cumsum(occ[:-1]))         # prefix M by slab
            bounds = [0]
            while bounds[-1] < n_slabs:
                nxt = int(np.searchsorted(
                    pref, (pref[bounds[-1] - 1] if bounds[-1] else 0)
                    + SWEEP_MAX_INCIDENCE, side="right"))
                bounds.append(max(nxt, bounds[-1] + 1))
            parts_b = []
            for w0, w1 in zip(bounds[:-1], bounds[1:]):
                m_sel = (lo_g < w1) & (hi_g > w0)
                if not m_sel.any():
                    continue
                lo_c = np.maximum(lo_g[m_sel], w0)
                cnt_c = np.minimum(hi_g[m_sel], w1) - lo_c
                parts_b.append(_sweep_bands(nzg[m_sel], lo_c, cnt_c))
    except _SweepImbalance:
        # should be impossible (winding returns to 0 per slab); fall back
        from sedona_db_spark.geometry.overlay import union_edges, union_polygons
        for r, _e, _xs in edge_rows:
            pr = part_rows[r]
            if isinstance(pr, tuple):
                out[r] = union_edges(pr[0], cancel,
                                     cross_xs=None if cancel else pr[1])
            elif isinstance(pr, np.ndarray):
                out[r] = union_edges(pr, cancel)
            else:
                out[r] = union_polygons(pr, cancel)
        return out
    parts_b = [p for p in parts_b if p is not None]
    if not parts_b:
        for r, _, _ in edge_rows:
            out[r] = _EMPTY
        return out
    if len(parts_b) == 1:
        band_slab, ylo_l, ylo_r, yhi_l, yhi_r, bx0, bx1 = parts_b[0]
    else:
        band_slab, ylo_l, ylo_r, yhi_l, yhi_r, bx0, bx1 = (
            np.concatenate([p[k] for p in parts_b]) for k in range(7))

    # ---- vertical merge (identical to the per-slab vbands pass) ---------
    nb = len(band_slab)
    if nb == 0:
        for r, _, _ in edge_rows:
            out[r] = _EMPTY
        return out
    touch = np.zeros(nb, dtype=bool)
    touch[1:] = ((band_slab[1:] == band_slab[:-1])
                 & (yhi_l[:-1] == ylo_l[1:]) & (yhi_r[:-1] == ylo_r[1:]))
    grp = np.cumsum(~touch) - 1
    n_grp = int(grp[-1]) + 1
    # groups are contiguous runs: first = run starts, last = next-start - 1
    first = np.flatnonzero(~touch)
    last = np.append(first[1:] - 1, nb - 1)
    band_slab = band_slab[first]
    bx0 = bx0[first]
    bx1 = bx1[first]
    m_ylo_l = ylo_l[first]
    m_ylo_r = ylo_r[first]
    m_yhi_l = yhi_l[last]
    m_yhi_r = yhi_r[last]

    # ---- per-row horizontal quad merge + dissolve ------------------------
    # vectorized rounding for the merge keys (the per-float round() calls
    # were ~30% of union_polygons' runtime)
    k_x0 = np.round(bx0, 12)
    k_x1 = np.round(bx1, 12)
    k_lo_l = np.round(m_ylo_l, 12)
    k_lo_r = np.round(m_ylo_r, 12)
    k_hi_l = np.round(m_yhi_l, 12)
    k_hi_r = np.round(m_yhi_r, 12)
    band_row = slab_row[band_slab]
    row_bounds = np.searchsorted(band_row, np.arange(len(edge_rows) + 1))
    for ri, (r, _, _) in enumerate(edge_rows):
        b0, b1 = int(row_bounds[ri]), int(row_bounds[ri + 1])
        if b0 == b1:
            out[r] = _EMPTY
            continue
        out[r] = _merge_and_dissolve(
            band_slab[b0:b1],
            bx0[b0:b1], bx1[b0:b1],
            m_ylo_l[b0:b1], m_ylo_r[b0:b1],
            m_yhi_l[b0:b1], m_yhi_r[b0:b1],
            k_x0[b0:b1], k_x1[b0:b1],
            k_lo_l[b0:b1], k_lo_r[b0:b1],
            k_hi_l[b0:b1], k_hi_r[b0:b1])
    return out


def _merge_and_dissolve(slab_id, x0, x1, ylo_l, ylo_r, yhi_l, yhi_r,
                        kx0, kx1, klo_l, klo_r, khi_l, khi_r):
    """Sequential greedy horizontal merge with pre-rounded keys — same
    semantics as overlay._slabs_to_geometry — then the exact dissolve.

    The loop indexes per band; python lists beat numpy scalar extraction
    ~5x here (same float values — tolist() round-trips doubles exactly)."""
    slab_id = slab_id.tolist()
    x0, x1 = x0.tolist(), x1.tolist()
    ylo_l, ylo_r = ylo_l.tolist(), ylo_r.tolist()
    yhi_l, yhi_r = yhi_l.tolist(), yhi_r.tolist()
    kx0, kx1 = kx0.tolist(), kx1.tolist()
    klo_l, klo_r = klo_l.tolist(), klo_r.tolist()
    khi_l, khi_r = khi_l.tolist(), khi_r.tolist()
    quads: list = []
    open_by_right: dict = {}
    nb = len(slab_id)
    i = 0

    def put(d, key, quad):
        # identical right-edge signatures (two bands collapsing to the
        # same corner) must FLUSH the incumbent, not overwrite it —
        # overwriting silently drops a quad (same fix as
        # overlay._slabs_to_geometry, round 6)
        old = d.get(key)
        if old is not None:
            quads.append(old)
        d[key] = quad

    while i < nb:
        s = slab_id[i]
        j = i
        new_open: dict = {}
        while j < nb and slab_id[j] == s:
            key = (kx0[j], klo_l[j], khi_l[j])
            prev = open_by_right.pop(key, None)
            xl, xr = x0[j], x1[j]
            if prev is not None:
                pxl, pxr, plo_l, plo_r, phi_l, phi_r = prev
                lo_slope_prev = (plo_r - plo_l) / (pxr - pxl)
                lo_slope_new = (ylo_r[j] - ylo_l[j]) / (xr - xl)
                hi_slope_prev = (phi_r - phi_l) / (pxr - pxl)
                hi_slope_new = (yhi_r[j] - yhi_l[j]) / (xr - xl)
                if (abs(lo_slope_prev - lo_slope_new) < 1e-12
                        and abs(hi_slope_prev - hi_slope_new) < 1e-12):
                    merged = [pxl, xr, plo_l, ylo_r[j], phi_l, yhi_r[j]]
                    put(new_open, (kx1[j], klo_r[j], khi_r[j]), merged)
                    j += 1
                    continue
                quads.append(prev)
            put(new_open, (kx1[j], klo_r[j], khi_r[j]),
                [xl, xr, ylo_l[j], ylo_r[j], yhi_l[j], yhi_r[j]])
            j += 1
        quads.extend(open_by_right.values())
        open_by_right = new_open
        i = j
    quads.extend(open_by_right.values())
    return _quads_final(quads)


def _boundary_edges_fast(quads) -> tuple:
    """Vectorized twin of ``dissolve._collect_boundary_edges``: same edges
    in the same order (bottom/top interleaved per quad, then verticals
    grouped by first-occurrence x, ascending y), but the per-x interval
    sweeps run as one segmented pass.  Returns (A, B) coordinate arrays."""
    q = np.asarray(quads, dtype=np.float64).reshape(-1, 6)
    xl, xr = q[:, 0], q[:, 1]
    ylo_l, ylo_r = q[:, 2], q[:, 3]
    yhi_l, yhi_r = q[:, 4], q[:, 5]
    live = ~(((yhi_l - ylo_l) <= 0) & ((yhi_r - ylo_r) <= 0))
    # bottom (l→r) and top (r→l), interleaved per quad like the original
    bot = np.stack([xl, ylo_l, xr, ylo_r], axis=1)
    top = np.stack([xr, yhi_r, xl, yhi_l], axis=1)
    pair = np.stack([bot, top], axis=1).reshape(-1, 4)     # (2n, 4)
    keep = np.repeat(live, 2) & ((pair[:, 0] != pair[:, 2])
                                 | (pair[:, 1] != pair[:, 3]))
    horiz = pair[keep]
    # verticals: right edge (+1) then left (-1) per quad, dict-ordered by
    # first occurrence of x
    rgood = live & (yhi_r > ylo_r)
    lgood = live & (yhi_l > ylo_l)
    vx_seq = np.stack([xr, xl], axis=1).reshape(-1)
    vgood = np.stack([rgood, lgood], axis=1).reshape(-1)
    vlo = np.stack([ylo_r, ylo_l], axis=1).reshape(-1)
    vhi = np.stack([yhi_r, yhi_l], axis=1).reshape(-1)
    vsign = np.tile(np.array([1.0, -1.0]), len(q))
    vx = vx_seq[vgood]
    if not len(vx):
        return horiz[:, :2], horiz[:, 2:]
    vlo, vhi, vsign = vlo[vgood], vhi[vgood], vsign[vgood]
    # first-occurrence rank per distinct x (reproduces dict key order)
    ux, first_idx = np.unique(vx, return_index=True)
    rank_of = np.empty(len(ux), dtype=np.int64)
    rank_of[np.argsort(first_idx, kind="stable")] = np.arange(len(ux))
    xid = rank_of[np.searchsorted(ux, vx)]
    # events: (xid, y, ±sign) at lo and (xid, y, ∓sign) at hi
    exid = np.concatenate([xid, xid])
    ey = np.concatenate([vlo, vhi])
    ed = np.concatenate([vsign, -vsign])
    o = np.lexsort((ey, exid))
    exid, ey, ed = exid[o], ey[o], ed[o]
    # combine events at equal (xid, y)
    newk = np.empty(len(ey), dtype=bool)
    newk[0] = True
    newk[1:] = (exid[1:] != exid[:-1]) | (ey[1:] != ey[:-1])
    kid = np.cumsum(newk) - 1
    net_at = np.zeros(int(kid[-1]) + 1)
    np.add.at(net_at, kid, ed)
    ky = ey[newk]
    kx = exid[newk]
    # running net per x-group; the interval [ky[i], ky[i+1]) within a
    # group carries net = cumsum up to and including ky[i]
    cs = np.cumsum(net_at)
    gstart = np.empty(len(ky), dtype=bool)
    gstart[0] = True
    gstart[1:] = kx[1:] != kx[:-1]
    gi = np.flatnonzero(gstart)
    gsz = np.diff(np.append(gi, len(ky)))
    gbase = np.concatenate([[0.0], cs[gi[1:] - 1]])
    net = cs - np.repeat(gbase, gsz)
    intra = np.empty(len(ky), dtype=bool)          # has a next y in group
    intra[:-1] = kx[:-1] == kx[1:]
    intra[-1] = False
    up = intra & (net > 0)
    dn = intra & (net < 0)
    n_up, n_dn = int(up.sum()), int(dn.sum())
    va = np.empty((n_up + n_dn, 2))
    vb = np.empty((n_up + n_dn, 2))
    xcoord = ux[np.argsort(rank_of)]               # rank -> x value
    # original emits per x in dict order, ascending y, ups and downs
    # interleaved by y position — build jointly then stable-sort by (x
    # rank, y index) to preserve that order
    sel = np.flatnonzero(up | dn)
    isup = up[sel]
    sx = xcoord[kx[sel]]
    y0 = ky[sel]
    y1 = ky[sel + 1]
    va[:, 0] = sx
    vb[:, 0] = sx
    va[:, 1] = np.where(isup, y0, y1)
    vb[:, 1] = np.where(isup, y1, y0)
    A = np.concatenate([horiz[:, :2], va])
    B = np.concatenate([horiz[:, 2:], vb])
    return A, B


def _trace_rings_fast(A: np.ndarray, B: np.ndarray) -> list:
    """Twin of ``dissolve._trace_rings`` over integer vertex ids: same
    starting-edge order, same sharpest-left-turn rule, same open-chain
    ValueError.  Returns rings as lists of (x, y) tuples."""
    import math
    m = len(A)
    allpts = np.concatenate([A, B])
    key = allpts[:, 0] + 1j * allpts[:, 1]
    uniq, inv = np.unique(key, return_inverse=True)
    a_id = inv[:m]
    b_id = inv[m:]
    coords = np.empty((len(uniq), 2))
    # one representative coordinate per id (any duplicate has equal value)
    coords[inv] = allpts
    # drop duplicate directed edges, keeping the first (the original's
    # used-set keyed by the vertex pair collapses them to one traversal)
    pairkey = a_id * len(uniq) + b_id
    _, fidx = np.unique(pairkey, return_index=True)
    fidx.sort()
    a_id, b_id = a_id[fidx], b_id[fidx]
    m = len(a_id)
    # python lists: the walk below indexes one element at a time, where
    # list access beats numpy scalar extraction ~5x (values identical)
    a_list = a_id.tolist()
    b_list = b_id.tolist()
    cx_l = coords[:, 0].tolist()
    cy_l = coords[:, 1].tolist()
    out_of: dict = {}
    for ei in range(m):
        out_of.setdefault(a_list[ei], []).append(ei)
    used = [False] * m
    rings = []
    for e0 in range(m):
        if used[e0]:
            continue
        start = a_list[e0]
        ring_ids = [start, b_list[e0]]
        used[e0] = True
        cur, prev = b_list[e0], start
        while cur != start:
            cands = [ei for ei in out_of.get(cur, ()) if not used[ei]]
            if not cands:
                raise ValueError("open boundary chain")
            if len(cands) == 1:
                nxt_e = cands[0]
            else:
                cx, cy = cx_l[cur], cy_l[cur]
                px, py = cx_l[prev], cy_l[prev]
                din = math.atan2(cy - py, cx - px)
                best_e, best_key = None, None
                for ei in cands:
                    tb = b_list[ei]
                    dout = math.atan2(cy_l[tb] - cy, cx_l[tb] - cx)
                    turn = (dout - din + math.pi) % (2 * math.pi)
                    if best_e is None or turn > best_key:
                        best_e, best_key = ei, turn
                nxt_e = best_e
            used[nxt_e] = True
            nxt = b_list[nxt_e]
            ring_ids.append(nxt)
            prev, cur = cur, nxt
        rings.append([(cx_l[i], cy_l[i]) for i in ring_ids])
    return rings


def _simplify_ring_fast(ring: list) -> np.ndarray | None:
    """Vectorized twin of ``dissolve._simplify_ring`` (same keep rule)."""
    pts = ring[:-1] if ring[0] == ring[-1] else ring
    p = np.asarray(pts, dtype=np.float64)
    n = len(p)
    if n == 0:
        return None
    a = np.roll(p, 1, axis=0)
    c = np.roll(p, -1, axis=0)
    cross = ((p[:, 0] - a[:, 0]) * (c[:, 1] - p[:, 1])
             - (p[:, 1] - a[:, 1]) * (c[:, 0] - p[:, 0]))
    dot = ((p[:, 0] - a[:, 0]) * (c[:, 0] - p[:, 0])
           + (p[:, 1] - a[:, 1]) * (c[:, 1] - p[:, 1]))
    keep = (cross != 0.0) | (dot < 0)
    kp = p[keep]
    if len(kp) < 3:
        return None
    return np.vstack([kp, kp[:1]])


def _point_in_ring_fast(px: float, py: float, arr: np.ndarray) -> bool:
    x1 = np.roll(arr[:-1], 1, axis=0)
    x2 = arr[:-1]
    c = (x1[:, 1] > py) != (x2[:, 1] > py)
    if not c.any():
        return False
    a, b = x1[c], x2[c]
    xint = (b[:, 0] - a[:, 0]) * (py - a[:, 1]) / (b[:, 1] - a[:, 1]) \
        + a[:, 0]
    return bool(np.count_nonzero(px < xint) % 2)


def _ring_area_fast(arr: np.ndarray) -> float:
    x, y = arr[:-1, 0], arr[:-1, 1]
    yr = np.concatenate([y[1:], y[:1]])
    xr = np.concatenate([x[1:], x[:1]])
    return 0.5 * float(np.dot(x, yr) - np.dot(y, xr))


def _quads_to_polygons_fast(quads):
    """Vectorized twin of ``dissolve.quads_to_polygons`` — identical
    output (same ring order, start vertices, hole assignment, errors)."""
    A, B = _boundary_edges_fast(quads)
    if not len(A):
        return _EMPTY
    rings = _trace_rings_fast(A, B)
    outers, holes = [], []
    for ring in rings:
        arr = _simplify_ring_fast(ring)
        if arr is None:
            continue
        a = _ring_area_fast(arr)
        if a == 0.0:
            continue
        (outers if a > 0 else holes).append(arr)
    if not outers:
        raise ValueError("dissolve produced no outer rings")
    polys = [[o] for o in outers]
    for h in holes:
        mid = ((h[0, 0] + h[1, 0]) / 2.0, (h[0, 1] + h[1, 1]) / 2.0)
        best_i, best_area = None, None
        for i, o in enumerate(outers):
            if _point_in_ring_fast(mid[0], mid[1], o):
                a = _ring_area_fast(o)
                if best_area is None or a < best_area:
                    best_i, best_area = i, a
        if best_i is None:
            raise ValueError("hole outside every outer ring")
        polys[best_i].append(h)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def _quads_final(quads):
    from sedona_db_spark.geometry.overlay import _dissolve_area_matches
    try:
        g = _quads_to_polygons_fast(quads)
        if _dissolve_area_matches(g, quads):
            return g
    except ValueError:
        pass
    # degenerate fallback: trapezoid tiling form (mirrors
    # overlay._slabs_to_geometry's fallback)
    from sedona_db_spark.geometry import kernels as K
    polys = []
    for xl, xr, ylo_l, ylo_r, yhi_l, yhi_r in quads:
        pts = [(xl, ylo_l), (xr, ylo_r), (xr, yhi_r), (xl, yhi_l)]
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
        return _EMPTY
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)
