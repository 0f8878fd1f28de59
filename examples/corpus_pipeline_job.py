#!/usr/bin/env python
"""Example cluster job: end-to-end training-corpus build over an
Iceberg-style table of web pages — the round-5 operator set composed.

Deploy (the north-rule packaging shape):

    python tools/package.py
    spark-submit --master <cluster> \\
        --py-files dist/sedona_db_spark.zip \\
        examples/corpus_pipeline_job.py [n_pages] [table_dir]

Stages (each a bounded-shuffle operator, no driver loops):
  1. synthesize + geocode pages (JVM expressions), land them in an
     icetable snapshot clustered by longitude so later window scans prune
     whole files at the manifest;
  2. read BACK through the icetable scan with a bbox (files pruned before
     Spark lists anything), spatial-join to a region layer;
  3. language mixture resampling (deterministic integer-hash rates —
     retry/speculation stable);
  4. greedy sequence packing into fixed token budgets (hash-bucketed
     first-fit, one applyInPandas pass per independent bucket);
  5. write the packed corpus + a lineage summary.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    table_dir = sys.argv[2] if len(sys.argv) > 2 else \
        tempfile.mkdtemp(prefix="corpus_ice_") + "/pages"

    spark = SparkSession.builder.appName("corpus_pipeline").getOrCreate()
    from sedona_db_spark.session import register_all
    register_all(spark)

    from sedona_db_spark.operators import spatial_join
    from sedona_db_spark.sources import icetable
    from sedona_db_spark.sources.fixtures import regions_grid
    from sedona_db_spark.textops.mixture import (pack_sequences,
                                                 sample_mixture)
    from sedona_db_spark.webtext import pages_to_points, synth_pages

    # 1. synthesize + geocode + snapshot (lon-clustered data files)
    pages = pages_to_points(synth_pages(spark, n_pages)).select(
        "url", "lang", "text", "lon", "lat", "geom")
    pages = pages.withColumn(
        "doc_id", F.xxhash64("url").bitwiseAND(F.lit((1 << 62) - 1)))
    shutil.rmtree(table_dir, ignore_errors=True)
    icetable.create(spark, table_dir,
                    pages.repartitionByRange(16, "lon"),
                    geom_col="geom", res=4)

    # 2. windowed read-through (manifest prune) + region join
    bbox = (-30.0, 25.0, 45.0, 72.0)          # Europe-ish window
    scan = icetable.scan_files(table_dir, bbox=bbox)
    eu = icetable.read(spark, table_dir, bbox=bbox)
    regions = spark.createDataFrame(regions_grid(
        n_side=8, bounds=bbox, metro_hotspots=4))
    joined = spatial_join(eu.select("doc_id", "lang", "text", "geom"),
                          regions, "coveredby", "inner",
                          left_geom="geom", right_geom="geom")

    # 3. mixture reweighting + 4. packing
    mixed = sample_mixture(joined, {"en": 0.8, "de": 1.5, "fr": 1.0},
                           key_col="lang", id_col="doc_id", seed=11,
                           default_rate=0.3)
    mixed = mixed.withColumn("n_tokens", F.size(F.split("text", " ")))
    packed = pack_sequences(
        mixed.select("doc_id", "lang", "copy_n", "n_tokens"),
        max_tokens=2048, len_col="n_tokens", id_col="doc_id",
        n_buckets=64)

    stats = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("bin_id").alias("bins"),
        F.sum("n_tokens").alias("tokens")).collect()[0]
    summary = {
        "pages": n_pages,
        "files_pruned_by_manifest": scan["files_pruned"],
        "files_total": scan["files_total"],
        "joined_docs": stats["docs"],
        "packed_bins": int(stats["bins"]),
        "packed_tokens": int(stats["tokens"]),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
