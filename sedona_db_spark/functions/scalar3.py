"""Third batch of ST_ scalar functions: Z/M dimensions, line merging,
precision, validity repair — completing the SURVEY.md §2.3 coordinate/
dimension surface (reference files: st_pointzm.rs, st_force_dim.rs,
st_xyzm_minmax.rs, GEOS linemerge/makevalid kernels)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, IntegerType

from sedona_db_spark.geometry import algos as A
from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.functions.scalar import _decode_series


@pandas_udf(BinaryType())
def st_pointzm(x: pd.Series, y: pd.Series, z: pd.Series, m: pd.Series) -> pd.Series:
    out = []
    for xi, yi, zi, mi in zip(x, y, z, m):
        if xi is None or yi is None:
            out.append(None)
        else:
            out.append(W.encode(("Point", np.array([xi, yi, zi or 0.0, mi or 0.0]))))
    return pd.Series(out)


@pandas_udf(BinaryType())
def st_pointm(x: pd.Series, y: pd.Series, m: pd.Series) -> pd.Series:
    """POINT M: 3 coordinates with the ISO M type flag (+2000)."""
    out = []
    for xi, yi, mi in zip(x, y, m):
        if xi is None or yi is None:
            out.append(None)
        else:
            out.append(W.encode(("Point", np.array([xi, yi, mi or 0.0])),
                                m_flag=True))
    return pd.Series(out)


def _force_dim(g, ndim: int, fill: float = 0.0):
    def fix(arr):
        cur = arr.shape[1]
        if cur == ndim:
            return arr.copy()
        if cur > ndim:
            return arr[:, :ndim].copy()
        padded = np.full((len(arr), ndim), fill)
        padded[:, :cur] = arr
        return padded
    from sedona_db_spark.functions.scalar import _map_coords
    return _map_coords(g, fix)


@pandas_udf(BinaryType())
def st_force3d(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else W.encode(_force_dim(g, 3))
                      for g in _decode_series(b)])


@pandas_udf(BinaryType())
def st_force3dm(b: pd.Series) -> pd.Series:
    """Append an M (measure) dimension: ISO WKB type + 2000, not +1000.
    Round 1 aliased this to st_force3d, which produced Z geometries."""
    return pd.Series([None if g is None else W.encode(_force_dim(g, 3), m_flag=True)
                      for g in _decode_series(b)])


@pandas_udf(BinaryType())
def st_force4d(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else W.encode(_force_dim(g, 4))
                      for g in _decode_series(b)])


@pandas_udf(IntegerType())
def st_zmflag(b: pd.Series) -> pd.Series:
    """0=2D, 1=M, 2=Z, 3=ZM (reference st_zmflag semantics), read from the
    top-level WKB type code (ISO +1000/+2000/+3000 or EWKB flags)."""
    def flag(buf):
        if buf is None:
            return None
        _, _, has_z, has_m, _, _ = W._read_header(bytes(buf), 0)
        return (2 if has_z else 0) | (1 if has_m else 0)
    return pd.Series([flag(v) for v in b], dtype="Int32")


def _coord_minmax(kind: str, want_max: bool):
    """Z/M min-max honoring the header flags: ST_ZMin of an M-only geometry
    is NULL (the 3rd coordinate is M, not Z) — reference test ~:2943-3050."""
    @pandas_udf(DoubleType())
    def mm(b: pd.Series) -> pd.Series:
        out = []
        for v, g in zip(b, _decode_series(b)):
            if g is None:
                out.append(None)
                continue
            _, _, has_z, has_m, _, _ = W._read_header(bytes(v), 0)
            if kind == "z":
                idx = 2 if has_z else None
            else:
                idx = (2 + (1 if has_z else 0)) if has_m else None
            c = K._all_coords(g)
            if idx is None or c is None or not len(c) or c.shape[1] <= idx:
                out.append(None)
            else:
                out.append(float(c[:, idx].max() if want_max
                                 else c[:, idx].min()))
        return pd.Series(pd.array(out, dtype="Float64"))
    return mm


st_zmin = _coord_minmax("z", False)
st_zmax = _coord_minmax("z", True)
st_mmin = _coord_minmax("m", False)
st_mmax = _coord_minmax("m", True)


@pandas_udf(DoubleType())
def st_m(b: pd.Series) -> pd.Series:
    """M coordinate of a point, honoring the header's Z/M flags: M lives at
    index 2 for M-only points, index 3 for ZM."""
    out = []
    for v, g in zip(b, _decode_series(b)):
        if g is None or g[0] != "Point":
            out.append(None)
            continue
        _, _, has_z, has_m, _, _ = W._read_header(bytes(v), 0)
        idx = 2 + (1 if has_z else 0)
        val = float(g[1][idx]) if has_m and len(g[1]) > idx else None
        out.append(None if val is None or val != val else val)
    return pd.Series(pd.array(out, dtype="Float64"))


@pandas_udf(BooleanType())
def st_hasm(b: pd.Series) -> pd.Series:
    return pd.Series([None if v is None else W._read_header(bytes(v), 0)[3]
                      for v in b])


def _lm_is_empty(g) -> bool:
    t, d = g[0], g[1]
    if t == "Point":
        a = np.asarray(d, dtype=np.float64)
        return a.size == 0 or bool(np.isnan(a).all())
    return len(d) == 0


def line_merge(g, directed: bool = False):
    """Chain connected linestrings end-to-end (GEOS linemerge semantics for
    the simple non-branching case).

    - puntal input (Point/MultiPoint) merges to GEOMETRYCOLLECTION EMPTY
      (reference test_st_linemerge);
    - polygonal input contributes its rings as lines (reference behavior:
      LineMerge(POLYGON) returns the merged boundary ring);
    - ``directed``: only join where one line's END meets another's START —
      no flipping (reference test_st_linemerge_directed)."""
    if g is None:
        return None
    if _lm_is_empty(g):
        # empty inputs pass through unchanged (reference test_st_linemerge
        # empty cases: POLYGON EMPTY -> POLYGON EMPTY, POINT EMPTY -> same)
        return g
    if g[0] in ("Point", "MultiPoint"):
        return ("GeometryCollection", [])
    if g[0] == "Polygon":
        lines = [r.copy() for r in g[1] if len(r) >= 2]
    elif g[0] == "MultiPolygon":
        lines = [r.copy() for rings in g[1] for r in rings if len(r) >= 2]
    elif g[0] == "GeometryCollection":
        lines = []
        for q in g[1]:
            sub = line_merge(q, directed)
            if sub[0] == "LineString":
                lines.append(sub[1])
            elif sub[0] == "MultiLineString":
                lines.extend(sub[1])
    elif g[0] != "MultiLineString":
        return g
    else:
        lines = [l.copy() for l in g[1] if len(l) >= 2]
    merged = True
    while merged and len(lines) > 1:
        merged = False
        for i in range(len(lines)):
            for j in range(len(lines)):
                if i == j:
                    continue
                a, b = lines[i], lines[j]
                if np.array_equal(a[-1, :2], b[0, :2]):
                    lines[i] = np.vstack([a, b[1:]])
                elif not directed and np.array_equal(a[-1, :2], b[-1, :2]):
                    lines[i] = np.vstack([a, b[::-1][1:]])
                elif np.array_equal(a[0, :2], b[-1, :2]):
                    lines[i] = np.vstack([b, a[1:]])
                elif not directed and np.array_equal(a[0, :2], b[0, :2]):
                    lines[i] = np.vstack([b[::-1], a[1:]])
                else:
                    continue
                lines.pop(j)
                merged = True
                break
            if merged:
                break
    if not lines:
        return ("GeometryCollection", [])
    if len(lines) == 1:
        return ("LineString", lines[0])
    return ("MultiLineString", lines)


def _st_linemerge_impl(*cols):
    """ST_LineMerge(geom[, directed]) — variadic for the directed overload."""
    b = cols[0]
    directed = cols[1] if len(cols) > 1 else None
    out = []
    dvals = directed if directed is not None else [False] * len(b)
    for g, d in zip(_decode_series(b), dvals):
        if g is None:
            out.append(None)
        else:
            out.append(W.encode(line_merge(g, bool(d) if d is not None
                                           else False)))
    return pd.Series(out)


st_linemerge = pandas_udf(_st_linemerge_impl, BinaryType())


def make_valid(g):
    """Valid input passes through; an invalid (self-intersecting/bowtie)
    polygon is rebuilt by even-odd slab decomposition + boundary dissolve
    (geometry/overlay.py) — the same even-odd region semantics as GEOS
    MakeValid's default 'linework' mode (a bowtie becomes two triangles);
    collections repair part-wise.  If the rebuild degenerates (e.g. a
    zero-area sliver), the convex hull remains the last-resort tier."""
    if g is None:
        return None
    if A.is_valid(g):
        return g
    if g[0] in ("Polygon", "MultiPolygon"):
        from sedona_db_spark.geometry.overlay import boolean_op
        rebuilt = boolean_op(g, ("GeometryCollection", []), "union")
        if rebuilt[0] in ("Polygon", "MultiPolygon"):
            return rebuilt
        return K.convex_hull(g)
    if g[0] == "GeometryCollection":
        return ("GeometryCollection", [make_valid(q) for q in g[1]])
    return g


@pandas_udf(BinaryType())
def st_makevalid(b: pd.Series) -> pd.Series:
    return pd.Series([None if g is None else W.encode(make_valid(g))
                      for g in _decode_series(b)])


UDFS3 = {
    "ST_PointZM": st_pointzm,
    "ST_PointM": st_pointm,
    "ST_Force3D": st_force3d,
    "ST_Force3DZ": st_force3d,
    "ST_Force3DM": st_force3dm,
    "ST_Force4D": st_force4d,
    "ST_ZMFlag": st_zmflag,
    "ST_ZMin": st_zmin,
    "ST_ZMax": st_zmax,
    "ST_MMin": st_mmin,
    "ST_MMax": st_mmax,
    "ST_M": st_m,
    "ST_HasM": st_hasm,
    "ST_LineMerge": st_linemerge,
    "ST_MakeValid": st_makevalid,
    "ST_ReducePrecision": None,  # alias filled in register (snap_to_grid)
}
UDFS3 = {k: v for k, v in UDFS3.items() if v is not None}
