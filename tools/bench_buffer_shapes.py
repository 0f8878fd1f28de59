#!/usr/bin/env python
"""Single-thread ST_Buffer throughput by reference-bench table shape.

Replicates the SHAPE DISTRIBUTIONS of the reference's benchmark datagen
(/root/reference/rust/sedona-testing/src/datagen.rs,
 /root/reference/benchmarks/test_bench_base.py: bounds [0,0,80,100],
size 1-15, circular vertices, collections = 1-3 children in
non-overlapping sub-rectangles with child type drawn from
point/line/polygon/multi*) with our own numpy RNG — distribution
parity, not a port — and times the batch UDF impl
(functions.scalar._st_buffer_impl) exactly as Spark's Arrow batches
invoke it.  Usage:

    python tools/bench_buffer_shapes.py [n_rows] [shape ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from sedona_db_spark.geometry import wkb as W  # noqa: E402

BOUNDS = (0.0, 0.0, 80.0, 100.0)
SIZE = (1.0, 15.0)


def _circle(rng, bounds=BOUNDS, size=SIZE):
    s = rng.uniform(*size)
    h = s / 2.0
    x0, y0, x1, y1 = bounds
    cx = rng.uniform(x0 + h, x1 - h) if x1 - x0 >= s else (x0 + x1) / 2
    cy = rng.uniform(y0 + h, y1 - h) if y1 - y0 >= s else (y0 + y1) / 2
    return cx, cy, h


def _circ_verts(angle, cx, cy, r, k, closed):
    dang = 2.0 * np.pi / max(k, 3)
    ang = angle + dang * np.arange(k)
    pts = np.column_stack([np.cos(ang) * r + cx, np.sin(ang) * r + cy])
    if closed:
        pts = np.vstack([pts, pts[:1]])
    return pts


def gen_point(rng, bounds=BOUNDS, size=SIZE):
    x0, y0, x1, y1 = bounds
    return ("Point", np.array([rng.uniform(x0, x1), rng.uniform(y0, y1)]))


def gen_line(rng, kr, bounds=BOUNDS, size=SIZE):
    cx, cy, h = _circle(rng, bounds, size)
    k = int(rng.integers(kr[0], kr[1] + 1))
    k = max(k, 2)
    return ("LineString",
            _circ_verts(rng.uniform(0, 2 * np.pi), cx, cy, h, k, False))


def gen_poly(rng, kr, bounds=BOUNDS, size=SIZE):
    cx, cy, h = _circle(rng, bounds, size)
    k = max(int(rng.integers(kr[0], kr[1] + 1)), 3)
    return ("Polygon",
            [_circ_verts(rng.uniform(0, 2 * np.pi), cx, cy, h, k, True)])


def _sub_rects(n, rect):
    # non-overlapping vertical slices (the reference subdivides the
    # feature rect; exact scheme differs but disjointness is what matters)
    x0, y0, x1, y1 = rect
    w = (x1 - x0) / n
    return [(x0 + i * w, y0, x0 + (i + 1) * w, y1) for i in range(n)]


def gen_collection(rng, kr):
    cx, cy, h = _circle(rng)
    rect = (cx - h, cy - h, cx + h, cy + h)
    n = int(rng.integers(1, 4))
    kids = []
    for b in _sub_rects(n, rect):
        csz = (min(b[2] - b[0], b[3] - b[1]) * 0.9,
               min(b[2] - b[0], b[3] - b[1]))
        t = int(rng.integers(0, 6))
        if t == 0:
            kids.append(gen_point(rng, b, csz))
        elif t == 1:
            kids.append(gen_line(rng, kr, b, csz))
        elif t == 2:
            kids.append(gen_poly(rng, kr, b, csz))
        else:
            m = int(rng.integers(1, 4))
            subs = _sub_rects(m, b)
            if t == 3:
                kids.append(("MultiPoint", np.array(
                    [gen_point(rng, sb, csz)[1] for sb in subs])))
            elif t == 4:
                kids.append(("MultiLineString",
                             [gen_line(rng, kr, sb,
                                       (min(sb[2] - sb[0], sb[3] - sb[1])
                                        * 0.9,
                                        min(sb[2] - sb[0], sb[3] - sb[1])))[1]
                              for sb in subs]))
            else:
                kids.append(("MultiPolygon",
                             [gen_poly(rng, kr, sb,
                                       (min(sb[2] - sb[0], sb[3] - sb[1])
                                        * 0.9,
                                        min(sb[2] - sb[0], sb[3] - sb[1])))[1]
                              for sb in subs]))
    return ("GeometryCollection", kids)


def make_table(shape: str, n: int, seed: int = 42) -> list[bytes]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        if shape == "points_simple":
            g = gen_point(rng)
        elif shape == "segments_large":
            g = gen_line(rng, (2, 10))
        elif shape == "polygons_simple":
            g = gen_poly(rng, (10, 10))
        elif shape == "polygons_complex":
            g = gen_poly(rng, (500, 500))
        elif shape == "collections_simple":
            g = gen_collection(rng, (10, 10))
        elif shape == "collections_complex":
            g = gen_collection(rng, (500, 500))
        else:
            raise ValueError(shape)
        out.append(W.encode(g))
    return out


def bench(shape: str, n: int, dist: float = 2.0, repeat: int = 3) -> float:
    from sedona_db_spark.functions.scalar import _st_buffer_impl
    wkbs = make_table(shape, n)
    b = pd.Series(wkbs, dtype=object)
    d = pd.Series([dist] * n)
    f = _st_buffer_impl.__wrapped__ if hasattr(_st_buffer_impl, "__wrapped__") \
        else _st_buffer_impl
    best = float("inf")
    res = None
    for _ in range(repeat):
        t0 = time.time()
        res = f(b, d)
        best = min(best, time.time() - t0)
    n_null = int(res.isna().sum())
    return n / best, n_null


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    shapes = sys.argv[2:] or ["points_simple", "segments_large",
                              "polygons_simple", "polygons_complex",
                              "collections_simple"]
    for s in shapes:
        tput, nn = bench(s, n)
        print(f"{s:22s} {tput:12,.0f} rows/s   (nulls={nn})")
