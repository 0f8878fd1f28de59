"""Spatial aggregates (reference §2.4 surface, SURVEY.md).

The reference ships six spatial UDAFs following DataFusion's partial→final
accumulator protocol (rust/sedona-functions/src/st_envelope_agg.rs etc.).
On Spark, partial/final comes free from two-stage hash aggregation, so each
aggregate is a composition of built-in aggs plus (at most) one scalar
finisher UDF:

- ST_Envelope_Agg  → min/max over the vectorized bbox accessors → polygon
- ST_Collect_Agg   → collect_list + ST_Collect finisher (scalar2.st_collect)
- ST_Analyze_Agg   → cheap per-row scalars aggregated (GeoStatistics:
  rust/sedona-geometry/src/analyze.rs:29-41)
- ST_Union_Agg / ST_Intersection_Agg → collect + slab-overlay fold
  (geometry/overlay.py); ST_Polygonize via ST_Polygonize over collected
  parts — all six reference aggregates implemented below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def envelope_agg(df: DataFrame, geom_col: str = "geom",
                 group_by: list[str] | None = None) -> DataFrame:
    """Group-wise ST_Envelope_Agg: bbox polygon per group."""
    from sedona_db_spark.functions.scalar import (
        st_geomfromtext, st_xmin, st_ymin, st_xmax, st_ymax)
    g = F.col(geom_col)
    aggs = [F.min(st_xmin(g)).alias("__x0"), F.min(st_ymin(g)).alias("__y0"),
            F.max(st_xmax(g)).alias("__x1"), F.max(st_ymax(g)).alias("__y1")]
    grouped = df.groupBy(*(group_by or [])).agg(*aggs)
    wkt = F.concat(
        F.lit("POLYGON (("),
        F.col("__x0").cast("string"), F.lit(" "), F.col("__y0").cast("string"), F.lit(", "),
        F.col("__x1").cast("string"), F.lit(" "), F.col("__y0").cast("string"), F.lit(", "),
        F.col("__x1").cast("string"), F.lit(" "), F.col("__y1").cast("string"), F.lit(", "),
        F.col("__x0").cast("string"), F.lit(" "), F.col("__y1").cast("string"), F.lit(", "),
        F.col("__x0").cast("string"), F.lit(" "), F.col("__y0").cast("string"),
        F.lit("))"))
    return (grouped.withColumn("envelope", st_geomfromtext(wkt))
                   .drop("__x0", "__y0", "__x1", "__y1"))


def collect_agg(df: DataFrame, geom_col: str = "geom",
                group_by: list[str] | None = None) -> DataFrame:
    """Group-wise ST_Collect_Agg: multi-geometry per group."""
    from sedona_db_spark.functions.scalar2 import st_collect
    grouped = df.groupBy(*(group_by or [])).agg(
        F.collect_list(F.col(geom_col)).alias("__geoms"))
    return (grouped.withColumn("collected", st_collect(F.col("__geoms")))
                   .drop("__geoms"))


def analyze_agg(df: DataFrame, geom_col: str = "geom",
                group_by: list[str] | None = None) -> DataFrame:
    """Group-wise ST_Analyze_Agg: GeoStatistics struct-ish columns —
    count, bbox, total/mean points per geometry, geometry-type counts."""
    from sedona_db_spark.functions.scalar import (
        st_geometrytype, st_npoints, st_xmin, st_ymin, st_xmax, st_ymax)
    g = F.col(geom_col)
    base = df.withColumn("__type", st_geometrytype(g)) \
             .withColumn("__np", st_npoints(g))
    return base.groupBy(*(group_by or [])).agg(
        F.count(F.lit(1)).alias("count"),
        F.min(st_xmin(g)).alias("xmin"),
        F.min(st_ymin(g)).alias("ymin"),
        F.max(st_xmax(g)).alias("xmax"),
        F.max(st_ymax(g)).alias("ymax"),
        F.sum("__np").alias("total_points"),
        F.avg("__np").alias("mean_points_per_geometry"),
        F.sort_array(F.collect_set("__type")).alias("geometry_types"),
    )


def union_agg(df: DataFrame, geom_col: str = "geom",
              group_by: list[str] | None = None) -> DataFrame:
    """Group-wise ST_Union_Agg via collect_list + n-way slab-overlay union
    (region-exact; see geometry/overlay.py)."""
    from sedona_db_spark.functions.scalar4 import st_union_all
    grouped = df.groupBy(*(group_by or [])).agg(
        F.collect_list(F.col(geom_col)).alias("__geoms"))
    return (grouped.withColumn("unioned", st_union_all(F.col("__geoms")))
                   .drop("__geoms"))


def intersection_agg(df: DataFrame, geom_col: str = "geom",
                     group_by: list[str] | None = None) -> DataFrame:
    """Group-wise ST_Intersection_Agg (running intersection)."""
    from sedona_db_spark.functions.scalar4 import st_intersection_all
    grouped = df.groupBy(*(group_by or [])).agg(
        F.collect_list(F.col(geom_col)).alias("__geoms"))
    return (grouped.withColumn("intersected",
                               st_intersection_all(F.col("__geoms")))
                   .drop("__geoms"))


# ---------------------------------------------------------------------------
# SQL aggregate UDFs (grouped-agg pandas UDFs): the reference's aggregates
# are SQL functions (SELECT ST_Envelope_Agg(geom) FROM t GROUP BY ...);
# these register under the same names so its aggregate queries run as-is.
# The DataFrame helpers above remain the scale path (pure JVM min/max);
# the grouped-agg forms ship each group's WKB to one python worker.
# ---------------------------------------------------------------------------

def _grouped_agg_udfs():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import BinaryType

    from sedona_db_spark.geometry import kernels as K
    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.geometry.overlay import (intersection_all, union_all)

    def _geoms(b):
        return [W.decode(bytes(v)) for v in b if v is not None]

    @pandas_udf(BinaryType(), PandasUDFType.GROUPED_AGG)
    def st_envelope_agg_sql(b):
        gs = _geoms(b)
        if not gs:
            return None
        boxes = np.array([K.geom_bbox(g) for g in gs])
        boxes = boxes[~np.isnan(boxes[:, 0])]
        if not len(boxes):
            return None
        bbox_geom = ("Polygon", [np.array([
            [boxes[:, 0].min(), boxes[:, 1].min()],
            [boxes[:, 2].max(), boxes[:, 1].min()],
            [boxes[:, 2].max(), boxes[:, 3].max()],
            [boxes[:, 0].min(), boxes[:, 3].max()],
            [boxes[:, 0].min(), boxes[:, 1].min()]])])
        # degeneracy (single point / collinear) handled by geom_envelope
        return W.encode(K.geom_envelope(bbox_geom))

    @pandas_udf(BinaryType(), PandasUDFType.GROUPED_AGG)
    def st_collect_agg_sql(b):
        gs = _geoms(b)
        if not gs:
            return None
        kinds = {g[0] for g in gs}
        if kinds == {"Point"}:
            return W.encode(("MultiPoint", np.array([g[1][:2] for g in gs])))
        if kinds == {"LineString"}:
            return W.encode(("MultiLineString", [g[1] for g in gs]))
        if kinds == {"Polygon"}:
            return W.encode(("MultiPolygon", [g[1] for g in gs]))
        return W.encode(("GeometryCollection", gs))

    @pandas_udf(BinaryType(), PandasUDFType.GROUPED_AGG)
    def st_union_agg_sql(b):
        gs = _geoms(b)
        if not gs:
            return None
        return W.encode(union_all(gs))

    @pandas_udf(BinaryType(), PandasUDFType.GROUPED_AGG)
    def st_intersection_agg_sql(b):
        gs = _geoms(b)
        if not gs:
            return None
        return W.encode(intersection_all(gs))

    @pandas_udf(BinaryType(), PandasUDFType.GROUPED_AGG)
    def st_polygonize_agg_sql(b):
        """ST_Polygonize_Agg (st_polygonize_agg.rs:40-230): group linework
        -> GEOMETRYCOLLECTION of the bounded arrangement faces, NULL on
        empty input.  Round 4: fully noded (geometry.noding), so crossing
        edge soups polygonize."""
        from sedona_db_spark.functions.scalar4 import polygonize_geom
        gs = _geoms(b)
        if not gs:
            return None
        return W.encode(polygonize_geom(("GeometryCollection", gs)))

    return {
        "ST_Envelope_Agg": st_envelope_agg_sql,
        "ST_Collect_Agg": st_collect_agg_sql,
        "ST_Union_Agg": st_union_agg_sql,
        "ST_Intersection_Agg": st_intersection_agg_sql,
        "ST_Polygonize_Agg": st_polygonize_agg_sql,
    }
