"""RS_ raster functions as Arrow-batched pandas UDFs over the raster struct.

Mirrors the reference's pure-Rust raster surface
(/root/reference/rust/sedona-raster-functions/src/register.rs:41-73):
geo-referencing accessors, affine world↔pixel coordinate mapping
(rs_rastercoordinate.rs / rs_worldcoordinate.rs / rs_pixel_functions.rs:39-236)
and raster↔vector predicates (rs_spatial_predicates.rs:18-30, compared via
extent here — tiles are axis-aligned).

A struct column arrives in a pandas UDF as a pd.DataFrame whose columns are
the struct fields; the metadata arithmetic is therefore plain vectorized
numpy over the whole batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType, BooleanType, DoubleType, IntegerType, LongType, StringType,
)

from sedona_db_spark.raster.model import RASTER_TYPE
from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W


def _meta(r: pd.DataFrame) -> pd.DataFrame:
    # raster struct -> its metadata sub-struct (pandas nests as dicts/rows)
    m = r["metadata"]
    if isinstance(m.iloc[0] if len(m) else None, dict):
        return pd.DataFrame(list(m))
    return m


def _mcol(r: pd.DataFrame, name: str) -> np.ndarray:
    return _meta(r)[name].to_numpy()


def _simple_meta_udf(field: str, spark_type, np_type):
    @pandas_udf(spark_type)
    def fn(r: pd.DataFrame) -> pd.Series:
        return pd.Series(_mcol(r, field).astype(np_type))
    return fn


rs_width = _simple_meta_udf("width", LongType(), np.int64)
rs_height = _simple_meta_udf("height", LongType(), np.int64)
rs_scalex = _simple_meta_udf("scale_x", DoubleType(), np.float64)
rs_scaley = _simple_meta_udf("scale_y", DoubleType(), np.float64)
rs_skewx = _simple_meta_udf("skew_x", DoubleType(), np.float64)
rs_skewy = _simple_meta_udf("skew_y", DoubleType(), np.float64)
rs_upperleftx = _simple_meta_udf("upperleft_x", DoubleType(), np.float64)
rs_upperlefty = _simple_meta_udf("upperleft_y", DoubleType(), np.float64)


@pandas_udf(IntegerType())
def rs_numbands(r: pd.DataFrame) -> pd.Series:
    return pd.Series([len(b) if b is not None else 0 for b in r["bands"]],
                     dtype="int32")


@pandas_udf(StringType())
def rs_crs(r: pd.DataFrame) -> pd.Series:
    return r["crs"]


def _extent(r: pd.DataFrame):
    """Vectorized tile extents from the affine geotransform (skew-free)."""
    m = _meta(r)
    w = m["width"].to_numpy(np.float64)
    h = m["height"].to_numpy(np.float64)
    ulx = m["upperleft_x"].to_numpy(np.float64)
    uly = m["upperleft_y"].to_numpy(np.float64)
    sx = m["scale_x"].to_numpy(np.float64)
    sy = m["scale_y"].to_numpy(np.float64)
    x2 = ulx + sx * w
    y2 = uly + sy * h
    return (np.minimum(ulx, x2), np.minimum(uly, y2),
            np.maximum(ulx, x2), np.maximum(uly, y2))


@pandas_udf(BinaryType())
def rs_envelope(r: pd.DataFrame) -> pd.Series:
    xmin, ymin, xmax, ymax = _extent(r)
    out = []
    for a, b, c, d in zip(xmin, ymin, xmax, ymax):
        ring = np.array([[a, b], [c, b], [c, d], [a, d], [a, b]])
        out.append(W.encode(("Polygon", [ring])))
    return pd.Series(out)


# --- affine world <-> raster coordinate mapping (1-based pixel indices) ----

@pandas_udf(IntegerType())
def rs_worldtorastercoordx(r: pd.DataFrame, x: pd.Series, y: pd.Series) -> pd.Series:
    m = _meta(r)
    sx = m["scale_x"].to_numpy(np.float64)
    ulx = m["upperleft_x"].to_numpy(np.float64)
    col = np.floor((x.to_numpy(np.float64) - ulx) / sx).astype(np.int64) + 1
    return pd.Series(col.astype(np.int32))


@pandas_udf(IntegerType())
def rs_worldtorastercoordy(r: pd.DataFrame, x: pd.Series, y: pd.Series) -> pd.Series:
    m = _meta(r)
    sy = m["scale_y"].to_numpy(np.float64)
    uly = m["upperleft_y"].to_numpy(np.float64)
    row = np.floor((y.to_numpy(np.float64) - uly) / sy).astype(np.int64) + 1
    return pd.Series(row.astype(np.int32))


@pandas_udf(DoubleType())
def rs_rastertoworldcoordx(r: pd.DataFrame, col: pd.Series, row: pd.Series) -> pd.Series:
    m = _meta(r)
    c = col.to_numpy(np.float64) - 1
    rr = row.to_numpy(np.float64) - 1
    return pd.Series(m["upperleft_x"].to_numpy(np.float64)
                     + c * m["scale_x"].to_numpy(np.float64)
                     + rr * m["skew_x"].to_numpy(np.float64))


@pandas_udf(DoubleType())
def rs_rastertoworldcoordy(r: pd.DataFrame, col: pd.Series, row: pd.Series) -> pd.Series:
    m = _meta(r)
    c = col.to_numpy(np.float64) - 1
    rr = row.to_numpy(np.float64) - 1
    return pd.Series(m["upperleft_y"].to_numpy(np.float64)
                     + rr * m["scale_y"].to_numpy(np.float64)
                     + c * m["skew_y"].to_numpy(np.float64))


@pandas_udf(BinaryType())
def rs_pixelaspoint(r: pd.DataFrame, col: pd.Series, row: pd.Series) -> pd.Series:
    m = _meta(r)
    c = col.to_numpy(np.float64) - 1
    rr = row.to_numpy(np.float64) - 1
    x = (m["upperleft_x"].to_numpy(np.float64)
         + c * m["scale_x"].to_numpy(np.float64)
         + rr * m["skew_x"].to_numpy(np.float64))
    y = (m["upperleft_y"].to_numpy(np.float64)
         + rr * m["scale_y"].to_numpy(np.float64)
         + c * m["skew_y"].to_numpy(np.float64))
    return pd.Series(W.points_to_wkb(x, y))


@pandas_udf(BinaryType())
def rs_pixelascentroid(r: pd.DataFrame, col: pd.Series, row: pd.Series) -> pd.Series:
    m = _meta(r)
    c = col.to_numpy(np.float64) - 0.5
    rr = row.to_numpy(np.float64) - 0.5
    x = m["upperleft_x"].to_numpy(np.float64) + c * m["scale_x"].to_numpy(np.float64)
    y = m["upperleft_y"].to_numpy(np.float64) + rr * m["scale_y"].to_numpy(np.float64)
    return pd.Series(W.points_to_wkb(x, y))


@pandas_udf(BinaryType())
def rs_pixelaspolygon(r: pd.DataFrame, col: pd.Series, row: pd.Series) -> pd.Series:
    m = _meta(r)
    ulx = m["upperleft_x"].to_numpy(np.float64)
    uly = m["upperleft_y"].to_numpy(np.float64)
    sx = m["scale_x"].to_numpy(np.float64)
    sy = m["scale_y"].to_numpy(np.float64)
    c = col.to_numpy(np.float64) - 1
    rr = row.to_numpy(np.float64) - 1
    out = []
    for i in range(len(c)):
        x0, y0 = ulx[i] + c[i] * sx[i], uly[i] + rr[i] * sy[i]
        x1, y1 = x0 + sx[i], y0 + sy[i]
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        out.append(W.encode(("Polygon", [ring])))
    return pd.Series(out)


@pandas_udf(BooleanType())
def rs_intersects(r: pd.DataFrame, g: pd.Series) -> pd.Series:
    """RS_Intersects(raster, geom): extent-vs-geometry intersection
    (rasters compared via their hull, rs_spatial_predicates.rs:18-30;
    axis-aligned tiles ⇒ hull == extent)."""
    xmin, ymin, xmax, ymax = _extent(r)
    out = np.zeros(len(g), dtype=bool)
    cache: dict[bytes, object] = {}
    for i, v in enumerate(g):
        if v is None:
            continue
        raw = bytes(v)
        geom = cache.get(raw)
        if geom is None:
            geom = W.decode(raw)
            cache[raw] = geom
        ring = np.array([[xmin[i], ymin[i]], [xmax[i], ymin[i]],
                         [xmax[i], ymax[i]], [xmin[i], ymax[i]],
                         [xmin[i], ymin[i]]])
        out[i] = K.geom_intersects(("Polygon", [ring]), geom)
    return pd.Series(out)


@pandas_udf(BooleanType())
def rs_contains(r: pd.DataFrame, g: pd.Series) -> pd.Series:
    xmin, ymin, xmax, ymax = _extent(r)
    out = np.zeros(len(g), dtype=bool)
    for i, v in enumerate(g):
        if v is None:
            continue
        geom = W.decode(bytes(v))
        bb = K.geom_bbox(geom)
        out[i] = (bb[0] >= xmin[i] and bb[1] >= ymin[i]
                  and bb[2] <= xmax[i] and bb[3] <= ymax[i]
                  and K.geom_covers(("Polygon", [np.array(
                      [[xmin[i], ymin[i]], [xmax[i], ymin[i]],
                       [xmax[i], ymax[i]], [xmin[i], ymax[i]],
                       [xmin[i], ymin[i]]])]), geom))
    return pd.Series(out)


@pandas_udf(BooleanType())
def rs_within(r: pd.DataFrame, g: pd.Series) -> pd.Series:
    xmin, ymin, xmax, ymax = _extent(r)
    out = np.zeros(len(g), dtype=bool)
    for i, v in enumerate(g):
        if v is None:
            continue
        geom = W.decode(bytes(v))
        ring = np.array([[xmin[i], ymin[i]], [xmax[i], ymin[i]],
                         [xmax[i], ymax[i]], [xmin[i], ymax[i]],
                         [xmin[i], ymin[i]]])
        out[i] = K.geom_covers(geom, ("Polygon", [ring]))
    return pd.Series(out)


@pandas_udf(DoubleType())
def rs_value(r: pd.DataFrame, col: pd.Series, row: pd.Series) -> pd.Series:
    """Pixel value of band 1 at (col,row), 1-based (uint8 bands)."""
    m = _meta(r)
    wv = m["width"].to_numpy(np.int64)
    out = np.full(len(col), np.nan)
    for i, bands in enumerate(r["bands"]):
        if bands is None or len(bands) == 0:
            continue
        b0 = bands[0]
        data = b0["data"] if isinstance(b0, dict) else b0[1]
        if data is None or len(data) == 0:
            continue
        c = int(col.iloc[i]) - 1
        rr = int(row.iloc[i]) - 1
        idx = rr * int(wv[i]) + c
        if 0 <= idx < len(data):
            out[i] = data[idx]
    return pd.Series(out)


RS_UDFS = {
    "RS_Width": rs_width,
    "RS_Height": rs_height,
    "RS_ScaleX": rs_scalex,
    "RS_ScaleY": rs_scaley,
    "RS_SkewX": rs_skewx,
    "RS_SkewY": rs_skewy,
    "RS_UpperLeftX": rs_upperleftx,
    "RS_UpperLeftY": rs_upperlefty,
    "RS_NumBands": rs_numbands,
    "RS_CRS": rs_crs,
    "RS_Envelope": rs_envelope,
    "RS_WorldToRasterCoordX": rs_worldtorastercoordx,
    "RS_WorldToRasterCoordY": rs_worldtorastercoordy,
    "RS_RasterToWorldCoordX": rs_rastertoworldcoordx,
    "RS_RasterToWorldCoordY": rs_rastertoworldcoordy,
    "RS_PixelAsPoint": rs_pixelaspoint,
    "RS_PixelAsCentroid": rs_pixelascentroid,
    "RS_PixelAsPolygon": rs_pixelaspolygon,
    "RS_Intersects": rs_intersects,
    "RS_Contains": rs_contains,
    "RS_Within": rs_within,
    "RS_Value": rs_value,
}


# --- band accessors (rs_band_accessors.rs, rs_bandpath.rs) -------------------

def _band0_meta(r: pd.DataFrame, i: int):
    bands = r["bands"].iloc[i]
    # explicit length check: arrow hands multi-band lists back as numpy
    # object arrays, whose truth value is ambiguous
    if bands is None or len(bands) == 0:
        return None
    b0 = bands[0]
    return b0["metadata"] if isinstance(b0, dict) else b0[0]


@pandas_udf(IntegerType())
def rs_bandpixeltype(r: pd.DataFrame) -> pd.Series:
    out = []
    for i in range(len(r)):
        m = _band0_meta(r, i)
        out.append(None if m is None else int(m["datatype"] if isinstance(m, dict) else m[2]))
    return pd.Series(out, dtype="Int32")


@pandas_udf(DoubleType())
def rs_bandnodatavalue(r: pd.DataFrame) -> pd.Series:
    import struct as _s
    out = []
    for i in range(len(r)):
        m = _band0_meta(r, i)
        nd = None if m is None else (m["nodatavalue"] if isinstance(m, dict) else m[0])
        if nd is None or len(nd) == 0:
            out.append(np.nan)
        elif len(nd) == 8:
            out.append(_s.unpack("<d", bytes(nd))[0])
        else:
            out.append(float(bytes(nd)[0]))
    return pd.Series(out)


@pandas_udf(DoubleType())
def rs_bandnodatavalue_band(r: pd.DataFrame, band: pd.Series) -> pd.Series:
    """Any-band variant (reference RsBandNoDataValueWithBand,
    rs_band_accessors.rs:185-215): 1-based band index per row, NULL/NaN
    when out of range or undefined."""
    import struct as _s
    out = []
    for i in range(len(r)):
        bands = r["bands"].iloc[i]
        bi = int(band.iloc[i]) if band.iloc[i] is not None else 1
        if bands is None or bi < 1 or bi > len(bands):
            out.append(np.nan)
            continue
        m = bands[bi - 1]["metadata"] if isinstance(bands[bi - 1], dict) else bands[bi - 1][0]
        nd = None if m is None else (m["nodatavalue"] if isinstance(m, dict) else m[0])
        if nd is None or len(nd) == 0:
            out.append(np.nan)
        elif len(nd) == 8:
            out.append(_s.unpack("<d", bytes(nd))[0])
        else:
            out.append(float(bytes(nd)[0]))
    return pd.Series(out)


@pandas_udf(StringType())
def rs_bandpath(r: pd.DataFrame) -> pd.Series:
    out = []
    for i in range(len(r)):
        m = _band0_meta(r, i)
        out.append(None if m is None else (m["outdb_url"] if isinstance(m, dict) else m[3]))
    return pd.Series(out)


# --- CRS / georeference -------------------------------------------------------

@pandas_udf(IntegerType())
def rs_srid(r: pd.DataFrame) -> pd.Series:
    def srid_of(c):
        if c and c.upper().startswith("EPSG:"):
            try:
                return int(c.split(":")[1])
            except ValueError:
                return 0
        return 0  # OGC:CRS84 and friends → 0 like the reference default
    return pd.Series([srid_of(c) for c in r["crs"]], dtype="int32")


@pandas_udf(StringType())
def rs_georeference(r: pd.DataFrame) -> pd.Series:
    """GDAL-style six-number geotransform string (rs_geotransform.rs)."""
    m = _meta(r)
    out = []
    for i in range(len(m)):
        out.append("%f \n%f \n%f \n%f \n%f \n%f" % (
            m["scale_x"].iloc[i], m["skew_y"].iloc[i], m["skew_x"].iloc[i],
            m["scale_y"].iloc[i], m["upperleft_x"].iloc[i], m["upperleft_y"].iloc[i]))
    return pd.Series(out)


@pandas_udf(DoubleType())
def rs_rotation(r: pd.DataFrame) -> pd.Series:
    m = _meta(r)
    return pd.Series(np.arctan2(m["skew_y"].to_numpy(np.float64),
                                m["scale_x"].to_numpy(np.float64)))


@pandas_udf(BinaryType())
def rs_convexhull(r: pd.DataFrame) -> pd.Series:
    # axis-aligned tiles: hull == envelope (rs_convexhull.rs semantics)
    xmin, ymin, xmax, ymax = _extent(r)
    out = []
    for a, b, c, d in zip(xmin, ymin, xmax, ymax):
        ring = np.array([[a, b], [c, b], [c, d], [a, d], [a, b]])
        out.append(W.encode(("Polygon", [ring])))
    return pd.Series(out)


RS_UDFS.update({
    "RS_BandPixelType": rs_bandpixeltype,
    "RS_BandNoDataValue": rs_bandnodatavalue,
    "RS_BandNoDataValueBand": rs_bandnodatavalue_band,
    "RS_BandPath": rs_bandpath,
    "RS_SRID": rs_srid,
    "RS_GeoReference": rs_georeference,
    "RS_Rotation": rs_rotation,
    "RS_ConvexHull": rs_convexhull,
})


@pandas_udf(RASTER_TYPE)
def rs_setcrs(r: pd.DataFrame, crs: pd.Series) -> pd.DataFrame:
    out = r.copy()
    out["crs"] = crs.astype(str)
    return out


@pandas_udf(RASTER_TYPE)
def rs_setsrid(r: pd.DataFrame, srid: pd.Series) -> pd.DataFrame:
    out = r.copy()
    out["crs"] = ["EPSG:%d" % int(s) for s in srid]
    return out


@pandas_udf(RASTER_TYPE)
def rs_example(width: pd.Series, height: pd.Series) -> pd.DataFrame:
    """Demo raster generator (rs_example.rs analogue): unit-scaled tile at
    the origin with a deterministic gradient band."""
    from sedona_db_spark.raster.model import make_tile
    rows = []
    for w, h in zip(width, height):
        t = make_tile(0, 0.0, float(h), 1.0, -1.0, int(w), int(h))
        rows.append(t["raster"])
    return pd.DataFrame(rows)


RS_UDFS.update({
    "RS_SetCRS": rs_setcrs,
    "RS_SetSRID": rs_setsrid,
    "RS_Example": rs_example,
})
