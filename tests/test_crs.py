"""Column-metadata CRS propagation + metadata-driven transform."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark import crs as C
from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.sources import fixtures as FX


def test_crs_tag_and_read(spark):
    df = spark.createDataFrame(FX.random_points(10, seed=1)) \
        .withColumnRenamed("geometry", "geom")
    assert C.get_crs(df, "geom") == "OGC:CRS84"  # default
    tagged = C.with_crs(df, "geom", "EPSG:4326", "planar")
    assert C.get_crs(tagged, "geom") == "EPSG:4326"
    assert C.get_edges(tagged, "geom") == "planar"
    # survives projection and rename
    sel = tagged.select("id", "geom").withColumnRenamed("geom", "g2")
    assert C.get_crs(sel, "g2") == "EPSG:4326"


def test_metadata_driven_transform(spark):
    df = C.with_crs(
        spark.createDataFrame(FX.random_points(20, seed=2))
        .withColumnRenamed("geometry", "geom"), "geom", "EPSG:4326")
    merc = C.transform(df, "geom", "EPSG:3857")
    assert C.get_crs(merc, "geom") == "EPSG:3857"
    back = C.transform(merc, "geom", "EPSG:4326")
    orig = {r["id"]: W.decode(bytes(r["geom"])) for r in df.collect()}
    got = {r["id"]: W.decode(bytes(r["geom"])) for r in back.collect()}
    for i in orig:
        np.testing.assert_allclose(got[i][1], orig[i][1], atol=1e-9)
