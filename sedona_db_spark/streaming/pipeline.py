"""Structured-streaming spatial pipeline (beyond-reference capability).

The reference engine is batch-only (SURVEY.md §2.0: no streaming subsystem
anywhere in SedonaDB), so this module is an *extension*: the same geocode →
cell → aggregate operators expressed over an unbounded stream, using only
watermark + windowed aggregation (fully incremental, shuffle-on-cell).

All transformations are JVM expressions (geocode_cols, cell_expr_sql), so
the stream runs at whole-stage-codegen speed with exactly-once file-source
semantics; checkpointLocation gives restart-resume (the streaming analogue
of operators/checkpoint.py's ledger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sedona_db_spark import grid
from sedona_db_spark.webtext.pages import geocode_cols


def streaming_geocode(stream: DataFrame, url_col: str = "url",
                      res: int = 6) -> DataFrame:
    """pages stream → (url, warc_ts, lon, lat, cell) — pure JVM exprs."""
    lon, lat = geocode_cols(F.col(url_col))
    return (stream.withColumn("lon", lon)
                  .withColumn("lat", lat)
                  .withColumn("cell", F.expr(grid.cell_expr_sql("lon", "lat", res))))


def streaming_cell_counts(stream: DataFrame, ts_col: str = "warc_ts",
                          window: str = "1 hour",
                          watermark: str = "2 hours",
                          res: int = 6) -> DataFrame:
    """Windowed page counts per grid cell with late-data watermarking."""
    geo = streaming_geocode(stream, res=res)
    return (geo.withWatermark(ts_col, watermark)
               .groupBy(F.window(F.col(ts_col), window).alias("w"),
                        F.col("cell"))
               .agg(F.count(F.lit(1)).alias("cnt"))
               .select(F.col("w.start").alias("window_start"), "cell", "cnt"))
