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
