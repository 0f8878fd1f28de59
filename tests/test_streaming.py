"""Structured-streaming pipeline: file-source stream == batch result."""

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.streaming import streaming_cell_counts, streaming_geocode
from sedona_db_spark.webtext import synth_pages


def test_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 5000)
    pages.write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(pages.schema).parquet(src))
    agg = streaming_cell_counts(stream, window="1 hour", watermark="2 hours", res=4)
    q = (agg.writeStream.format("memory").queryName("cell_counts")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["window_start"], r["cell"]): r["cnt"]
           for r in spark.sql("SELECT * FROM cell_counts").collect()}
    # batch equivalent over the same data
    from sedona_db_spark import grid
    from sedona_db_spark.webtext.pages import geocode_cols
    lon, lat = geocode_cols(F.col("url"))
    batch = (pages.withColumn("lon", lon).withColumn("lat", lat)
             .withColumn("cell", F.expr(grid.cell_expr_sql("lon", "lat", 4)))
             .groupBy(F.window(F.col("warc_ts"), "1 hour").alias("w"), "cell")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .select(F.col("w.start").alias("window_start"), "cell", "cnt"))
    exp = {(r["window_start"], r["cell"]): r["cnt"] for r in batch.collect()}
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch answer, and most windows must have been emitted
    assert got, "stream produced no rows"
    for k, v in got.items():
        assert exp.get(k) == v
    assert len(got) >= len(exp) * 0.5


def test_streaming_geocode_schema(spark, tmp_path):
    src = str(tmp_path / "pages_src2")
    pages = synth_pages(spark, 100)
    pages.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pages.schema).parquet(src)
    geo = streaming_geocode(stream)
    assert geo.isStreaming
    assert {"lon", "lat", "cell"} <= set(geo.columns)
