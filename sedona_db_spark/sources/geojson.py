"""GeoJSON ingest: newline-delimited Feature files → DataFrame with WKB.

The reference reads GeoJSON through its GDAL binding
(/root/reference/c/sedona-gdal vector path); here the same capability is a
Spark JSON scan + the ST_GeomFromGeoJSON parser — fully distributed,
schema-inferred properties, no native library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_geojsonl(spark: SparkSession, path: str,
                  geom_col: str = "geom") -> DataFrame:
    """Read newline-delimited GeoJSON Features; properties become columns,
    the geometry becomes a WKB column."""
    from sedona_db_spark.functions.scalar2 import st_geomfromgeojson
    raw = spark.read.json(path)
    props = raw.select("properties.*") if "properties" in raw.columns else raw
    cols = [F.col(f"properties.{c}").alias(c)
            for c in props.columns] if "properties" in raw.columns else []
    return raw.select(
        *cols,
        st_geomfromgeojson(F.to_json(F.col("geometry"))).alias(geom_col))
