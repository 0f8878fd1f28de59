"""Spatial aggregate helpers: envelope/collect/analyze."""

import numpy as np

from sedona_db_spark.functions.aggregates import (
    analyze_agg, collect_agg, envelope_agg,
)
from sedona_db_spark.geometry import kernels as K
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.sources import fixtures as FX

from pyspark.sql import functions as F


def test_envelope_agg(spark):
    pts = FX.random_points(200, seed=5)
    df = (spark.createDataFrame(pts).withColumnRenamed("geometry", "geom")
          .withColumn("grp", F.col("id") % 3))
    rows = envelope_agg(df, group_by=["grp"]).collect()
    assert len(rows) == 3
    X, Y = W.wkb_to_points(pts.geometry)
    for r in rows:
        m = pts.id % 3 == r["grp"]
        env = W.decode(bytes(r["envelope"]))
        bb = K.geom_bbox(env)
        assert bb == (X[m].min(), Y[m].min(), X[m].max(), Y[m].max())


def test_collect_agg(spark):
    pts = FX.random_points(30, seed=6)
    df = spark.createDataFrame(pts).withColumnRenamed("geometry", "geom")
    row = collect_agg(df).collect()[0]
    g = W.decode(bytes(row["collected"]))
    assert g[0] == "MultiPoint" and len(g[1]) == 30


def test_analyze_agg(spark):
    pls = FX.random_polygons(40, seed=7, num_vertices=(3, 6))
    df = spark.createDataFrame(pls).withColumnRenamed("geometry", "geom")
    row = analyze_agg(df).collect()[0]
    assert row["count"] == 40
    assert row["geometry_types"] == ["ST_Polygon"]
    G = [W.decode(bytes(b)) for b in pls.geometry]
    assert row["total_points"] == sum(K.num_points(g) for g in G)
    assert row["xmin"] == min(K.geom_bbox(g)[0] for g in G)
