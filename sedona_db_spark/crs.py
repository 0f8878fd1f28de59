"""Column-level CRS metadata — the Spark analogue of the reference's
type-level CRS.

SedonaDB carries edges/CRS as part of the column TYPE
(rust/sedona-schema/src/datatypes.rs:30-35, serialized to GeoArrow field
metadata `{"edges": ..., "crs": ...}`).  Spark's equivalent slot is
``StructField.metadata``: these helpers read/write the same GeoArrow-style
keys on geometry columns, survive select/withColumnRenamed, and let
``st_transform_col`` default its source CRS from the column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CRS_KEY = "crs"
EDGES_KEY = "edges"
DEFAULT_CRS = "OGC:CRS84"
DEFAULT_EDGES = "planar"


def with_crs(df: DataFrame, geom_col: str, crs: str = DEFAULT_CRS,
             edges: str = DEFAULT_EDGES) -> DataFrame:
    """Tag a geometry column with CRS/edges metadata (GeoArrow-style)."""
    meta = dict(get_meta(df, geom_col) or {})
    meta[CRS_KEY] = crs
    meta[EDGES_KEY] = edges
    cols = [F.col(c).alias(c, metadata=meta) if c == geom_col else F.col(c)
            for c in df.columns]
    return df.select(*cols)


def get_meta(df: DataFrame, geom_col: str) -> dict | None:
    for f in df.schema.fields:
        if f.name == geom_col:
            return dict(f.metadata) if f.metadata else None
    return None


def get_crs(df: DataFrame, geom_col: str) -> str:
    meta = get_meta(df, geom_col)
    return (meta or {}).get(CRS_KEY, DEFAULT_CRS)


def get_edges(df: DataFrame, geom_col: str) -> str:
    meta = get_meta(df, geom_col)
    return (meta or {}).get(EDGES_KEY, DEFAULT_EDGES)


def transform(df: DataFrame, geom_col: str, dst_crs: str) -> DataFrame:
    """Reproject a geometry column using its column-metadata CRS as the
    source; the result column carries the destination CRS."""
    from sedona_db_spark.functions.scalar2 import st_transform
    src = get_crs(df, geom_col)
    out = df.withColumn(geom_col, st_transform(
        F.col(geom_col), F.lit(src), F.lit(dst_crs)))
    return with_crs(out, geom_col, dst_crs, get_edges(df, geom_col))
