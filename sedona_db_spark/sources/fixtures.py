"""Deterministic synthetic geometry fixtures.

In-spirit re-implementation of the reference's ``sd_random_geometry`` table
function (/root/reference/rust/sedona/src/random_geometry_provider.rs:330+,
used by its join tests at
/root/reference/python/sedonadb/tests/test_sjoin.py:46-49): seeded numpy
generators for points / linestrings / polygons (vertex-count range,
hole_rate, size range), returned as pandas DataFrames of WKB for
``spark.createDataFrame`` — everything vectorized, nothing external.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sedona_db_spark.geometry import wkb as W


def random_points(n: int, seed: int = 42,
                  bounds=(-10.0, -10.0, 10.0, 10.0)) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    xmin, ymin, xmax, ymax = bounds
    x = rng.uniform(xmin, xmax, n)
    y = rng.uniform(ymin, ymax, n)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "dist": rng.uniform(0.0, 2.0, n),
        "geometry": W.points_to_wkb(x, y),
    })


def _star_ring(cx, cy, radii, angles):
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    ring = np.column_stack([xs, ys])
    return np.vstack([ring, ring[:1]])


def random_polygons(n: int, seed: int = 43, num_vertices=(3, 10),
                    hole_rate: float = 0.0, size=(0.5, 3.0),
                    bounds=(-10.0, -10.0, 10.0, 10.0)) -> pd.DataFrame:
    """Star-shaped (valid, possibly concave) polygons with optional holes."""
    rng = np.random.default_rng(seed)
    xmin, ymin, xmax, ymax = bounds
    rows = []
    for i in range(n):
        cx = rng.uniform(xmin, xmax)
        cy = rng.uniform(ymin, ymax)
        v = int(rng.integers(max(3, num_vertices[0]), num_vertices[1] + 1))
        base_r = rng.uniform(size[0], size[1])
        # jittered even sectors: consecutive angular gaps stay < π (a star
        # ring self-intersects when a gap exceeds π — the chord crosses the
        # far sectors), and no degenerate slivers
        angles = 2 * np.pi * (np.arange(v) + rng.uniform(0.3, 0.7, v)) / v
        radii = base_r * rng.uniform(0.5, 1.0, v)
        rings = [_star_ring(cx, cy, radii, angles)]
        if rng.uniform() < hole_rate:
            hv = int(rng.integers(3, 7))
            # CW hole with the same bounded-gap sector construction
            hang = (2 * np.pi * (np.arange(hv) + rng.uniform(0.3, 0.7, hv)) / hv)[::-1]
            scale = rng.uniform(0.2, 0.45, hv)
            # clustered shell angles make thin polygons that miss the center;
            # only carve a hole when the center is strictly interior, sized
            # by its clearance to the shell boundary (keeps polygons valid)
            from sedona_db_spark.geometry import kernels as _K
            shell = rings[0]
            inside = _K.points_in_polygon(
                np.array([cx]), np.array([cy]), [shell],
                boundary_counts=False)[0]
            if inside:
                clearance = float(_K.points_to_geom_distance(
                    np.array([cx]), np.array([cy]),
                    ("LineString", shell))[0])
                hr = clearance * scale
                if clearance > 1e-9:
                    rings.append(_star_ring(cx, cy, hr, hang))
        rows.append(W.encode(("Polygon", rings)))
    rng2 = np.random.default_rng(seed + 1)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "dist": rng2.uniform(0.0, 2.0, n),
        "geometry": rows,
    })


def random_linestrings(n: int, seed: int = 44, num_vertices=(2, 10),
                       size=(0.5, 3.0),
                       bounds=(-10.0, -10.0, 10.0, 10.0)) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    xmin, ymin, xmax, ymax = bounds
    rows = []
    for i in range(n):
        v = int(rng.integers(num_vertices[0], num_vertices[1] + 1))
        cx, cy = rng.uniform(xmin, xmax), rng.uniform(ymin, ymax)
        steps = rng.uniform(-1, 1, (v, 2)) * rng.uniform(size[0], size[1]) / v
        pts = np.cumsum(np.vstack([[cx, cy], steps[1:]]), axis=0)
        rows.append(W.encode(("LineString", pts)))
    return pd.DataFrame({"id": np.arange(n, dtype=np.int64), "geometry": rows})


def regions_grid(n_side: int = 8, bounds=(-120.0, 20.0, -60.0, 50.0),
                 metro_hotspots: int = 8, seed: int = 7) -> pd.DataFrame:
    """FIXTURES.md §5: convex-ish polygons tiling a lon/lat window, plus
    'dense metro' polygons overlapping point hot spots (skew exercise)."""
    xmin, ymin, xmax, ymax = bounds
    w = (xmax - xmin) / n_side
    h = (ymax - ymin) / n_side
    rng = np.random.default_rng(seed)
    rows = []
    rid = 0
    for i in range(n_side):
        for j in range(n_side):
            x0, y0 = xmin + i * w, ymin + j * h
            ring = np.array([
                [x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]])
            rows.append((rid, f"region_{i}_{j}", W.encode(("Polygon", [ring]))))
            rid += 1
    for m in range(metro_hotspots):
        cx = rng.uniform(xmin + w, xmax - w)
        cy = rng.uniform(ymin + h, ymax - h)
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        r = min(w, h) * 0.4
        ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        rows.append((rid, f"metro_{m}", W.encode(("Polygon", [ring]))))
        rid += 1
    return pd.DataFrame(rows, columns=["region_id", "name", "geom"])
