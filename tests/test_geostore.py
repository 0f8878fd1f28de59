"""Geo-clustered storage: pushdown evidence + pruning + exactness."""

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.sources import fixtures as FX
from sedona_db_spark.sources.geostore import (
    bbox_filter, read_geo, spatial_read, write_geo,
)

BBOX = (-3.0, -3.0, 3.0, 3.0)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("geostore") / "pts")
    pts = FX.random_points(5000, seed=7)
    df = spark.createDataFrame(pts).withColumnRenamed("geometry", "geom")
    write_geo(df, path, res=7, files=8)
    return path, pts


def test_filters_are_pushed_to_scan(spark, store):
    path, _ = store
    plan = (read_geo(spark, path).where(bbox_filter(*BBOX))
            ._jdf.queryExecution().toString())
    assert "PushedFilters" in plan
    # the bbox comparisons must reach the parquet scan, not sit above it
    pushed = plan.split("PushedFilters")[1][:400]
    assert "bbox_xmin" in pushed and "bbox_ymax" in pushed


def test_spatial_read_exact(spark, store):
    path, pts = store
    got = {r["id"] for r in spatial_read(spark, path, BBOX).collect()}
    exp = set()
    for r in pts.itertuples():
        g = W.decode(bytes(r.geometry))
        x, y = g[1][0], g[1][1]
        if BBOX[0] <= x <= BBOX[2] and BBOX[1] <= y <= BBOX[3]:
            exp.add(r.id)
    assert got == exp


def test_cell_clustering_written(spark, store):
    path, _ = store
    df = read_geo(spark, path)
    assert "cell" in df.columns and "bbox_xmin" in df.columns
    # range partitioning by cell → per-file cell ranges are disjoint-ish:
    # each file's (min,max) cell span must not cover the global span
    spans = (df.withColumn("f", F.element_at(F.split(F.input_file_name(), "/"), -1))
               .groupBy("f").agg(F.min("cell"), F.max("cell")).collect())
    assert len(spans) > 1
    globals_ = df.agg(F.min("cell"), F.max("cell")).collect()[0]
    full = (globals_[0], globals_[1])
    covering_all = [s for s in spans if (s[1], s[2]) == full]
    assert len(covering_all) == 0  # no single file spans the whole grid


def test_partitioned_layout_prunes(spark, tmp_path):
    path = str(tmp_path / "pts_part")
    pts = FX.random_points(2000, seed=8)
    df = spark.createDataFrame(pts).withColumnRenamed("geometry", "geom")
    write_geo(df, path, res=7, partition_res=2, files=4)
    out = spark.read.parquet(path)
    # partition column exists and filtering on it prunes directories
    q = out.where(F.col("pcell") == out.select("pcell").head(1)[0][0])
    plan = q._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan
    assert q.count() > 0


def test_geojson_ingest(spark, tmp_path):
    import json as _json
    from sedona_db_spark.sources.geojson import read_geojsonl
    from sedona_db_spark.geometry import wkb as W
    p = str(tmp_path / "features.jsonl")
    with open(p, "w") as f:
        for i in range(5):
            f.write(_json.dumps({
                "type": "Feature",
                "properties": {"name": f"f{i}", "v": i},
                "geometry": {"type": "Point", "coordinates": [float(i), i * 2.0]},
            }) + "\n")
    df = read_geojsonl(spark, p)
    rows = {r["name"]: W.decode(bytes(r["geom"])) for r in df.collect()}
    assert len(rows) == 5
    assert list(rows["f3"][1]) == [3.0, 6.0]
