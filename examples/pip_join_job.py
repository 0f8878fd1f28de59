#!/usr/bin/env python
"""Example cluster job: web-pages point-in-polygon rollup, resumable.

Deploy (the north-rule packaging shape):

    python tools/package.py
    spark-submit --master <cluster> \\
        --py-files dist/sedona_db_spark.zip \\
        examples/pip_join_job.py \\
        [n_pages] [output_dir]

Runs on any Spark cluster: synthesis/geocode are JVM expressions that scale
with executors; the spatial join broadcasts the region layer (no shuffle of
the pages table); execution is bucketed + ledgered so a re-submission after
a failure resumes mid-join.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pip_join_out"

    spark = SparkSession.builder.appName("pip_join_job").getOrCreate()
    from sedona_db_spark.session import register_all
    register_all(spark)

    from sedona_db_spark.webtext import synth_pages, geocode_cols
    from sedona_db_spark.sources.fixtures import regions_grid
    from sedona_db_spark.operators.checkpoint import checkpointed_spatial_join

    lon, lat = geocode_cols(F.col("url"))
    pages = (synth_pages(spark, n_pages)
             .select("url").withColumn("lon", lon).withColumn("lat", lat))
    regions = spark.createDataFrame(regions_grid(
        n_side=16, bounds=(-180.0, -85.0, 180.0, 85.0), metro_hotspots=8))

    run = checkpointed_spatial_join(
        spark, out_dir, pages, regions, "coveredby",
        num_buckets=16, bucket_key="url",
        left_lonlat=("lon", "lat"), right_geom="geom")
    summary = run.run()
    print(json.dumps(summary))

    counts = (run.result().groupBy("name")
              .agg(F.count(F.lit(1)).alias("pages"))
              .orderBy(F.desc("pages")))
    counts.show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
