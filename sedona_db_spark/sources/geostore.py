"""Geo-clustered parquet storage: the engine's GeoParquet analogue.

The reference prunes GeoParquet files and row groups by the `geo` metadata
bbox and the GeoParquet 1.1 ``covering.bbox`` struct column's min/max
statistics (/root/reference/rust/sedona-geoparquet/src/file_opener.rs:282-332,
writer.rs:315-414).  On Spark the same effect is ordinary columns + layout:

- ``write_geo``: derive bbox covering columns (bbox_xmin/ymin/xmax/ymax)
  and the grid cell id, range-repartition + sort by cell (Hilbert-ish
  spatial clustering — the ``sd_order`` precedent,
  /root/reference/c/sedona-proj/src/sd_order_lnglat.rs:32-60), write
  parquet.  Sorted-by-cell row groups make min/max stats tight.
- ``read_geo`` + ``bbox_filter``: plain column predicates that Catalyst
  pushes into the parquet scan (visible as PushedFilters in explain) —
  files and row groups outside the query bbox never leave disk.
- partitioned variant: ``partition_cells`` coarse cells become directory
  partitions → partition pruning on top of row-group pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from sedona_db_spark import grid

BBOX_COLS = ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax")


def with_covering(df: DataFrame, geom_col: str = "geom",
                  res: int = 7, partition_res: int | None = None) -> DataFrame:
    """Add bbox covering + cell columns (vectorized; point fast path)."""
    from sedona_db_spark.functions.scalar import (
        st_xmin, st_ymin, st_xmax, st_ymax)
    from sedona_db_spark.operators.spatial_join import _cell_udf
    g = F.col(geom_col)
    out = (df.withColumn("bbox_xmin", st_xmin(g))
             .withColumn("bbox_ymin", st_ymin(g))
             .withColumn("bbox_xmax", st_xmax(g))
             .withColumn("bbox_ymax", st_ymax(g))
             .withColumn("cell", _cell_udf(res)(g)))
    if partition_res is not None:
        out = out.withColumn("pcell", _cell_udf(partition_res)(g))
    return out


def write_geo(df: DataFrame, path: str, geom_col: str = "geom",
              res: int = 7, partition_res: int | None = None,
              files: int | None = None) -> None:
    """Write a spatially-clustered geo table.

    Rows are range-partitioned and sorted by cell id so each parquet row
    group covers a compact spatial window (tight min/max stats == effective
    pruning).  With ``partition_res``, coarse cells become hive partitions.
    """
    out = with_covering(df, geom_col, res, partition_res)
    if files:
        out = out.repartitionByRange(files, "cell")
    out = out.sortWithinPartitions("cell")
    writer = out.write.mode("overwrite")
    if partition_res is not None:
        writer = writer.partitionBy("pcell")
    writer.parquet(path)


def read_geo(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def bbox_filter(qxmin: float, qymin: float, qxmax: float, qymax: float) -> Column:
    """bbox-intersects predicate over the covering columns — plain
    comparisons, so Catalyst pushes them to the parquet scan (min/max
    row-group pruning; the Spark analogue of the reference's
    row_groups_spatial_pruned metric)."""
    return ((F.col("bbox_xmin") <= qxmax) & (F.col("bbox_xmax") >= qxmin)
            & (F.col("bbox_ymin") <= qymax) & (F.col("bbox_ymax") >= qymin))


def spatial_read(spark: SparkSession, path: str, bbox: tuple,
                 geom_col: str = "geom", exact: bool = True) -> DataFrame:
    """Read only the spatial window ``bbox`` = (xmin, ymin, xmax, ymax).

    Two tiers, mirroring the reference's scan pruning (§4.3): pushed bbox
    column predicates (file/row-group pruning) + exact geometry refine.
    """
    df = read_geo(spark, path).where(bbox_filter(*bbox))
    if exact:
        from sedona_db_spark.functions.scalar import st_intersects, st_geomfromtext
        xmin, ymin, xmax, ymax = bbox
        wkt = (f"POLYGON (({xmin} {ymin}, {xmax} {ymin}, {xmax} {ymax}, "
               f"{xmin} {ymax}, {xmin} {ymin}))")
        df = df.where(st_intersects(F.col(geom_col), st_geomfromtext(F.lit(wkt))))
    return df
