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


def test_crs_survives_spatial_join_project_write_read(spark, tmp_path):
    """Round-4 VERDICT #4: type-level CRS rides column metadata through
    join -> project -> GeoParquet write -> read with NO byte rewrites
    (ST_SetCRS-by-metadata; EWKB re-encoding stays available for per-value
    SRID interop)."""
    from sedona_db_spark.operators.spatial_join import spatial_join
    from sedona_db_spark.sources import geostore as G

    pts = C.with_crs(
        spark.createDataFrame(FX.random_points(40, seed=3))
        .withColumnRenamed("geometry", "geom"), "geom", "EPSG:27700")
    polys = C.with_crs(
        spark.createDataFrame(FX.random_polygons(6, seed=4))
        .withColumnRenamed("geometry", "geom"), "geom", "EPSG:27700",
        "planar")

    joined = spatial_join(pts, polys, "intersects")
    assert C.get_crs(joined, "geom") == "EPSG:27700"
    assert C.get_crs(joined, "geom_r") == "EPSG:27700"

    projected = joined.select("id", "geom")
    assert C.get_crs(projected, "geom") == "EPSG:27700"

    # bytes must be untouched (metadata-only CRS, no EWKB re-encode)
    in_bytes = {r["id"]: bytes(r["geom"]) for r in pts.collect()}
    out_bytes = {r["id"]: bytes(r["geom"]) for r in projected.collect()}
    for i, b in out_bytes.items():
        assert b == in_bytes[i]

    path = str(tmp_path / "crs_gpq")
    G.write_geoparquet(projected, path, "geom")
    meta = G.geoparquet_metadata(path)
    assert meta["columns"]["geom"]["crs"]["id"] == {
        "authority": "EPSG", "code": 27700}
    back, geo = G.read_geoparquet(spark, path)
    assert C.get_crs(back, "geom") == "EPSG:27700"
    rt_bytes = {r["id"]: bytes(r["geom"]) for r in back.collect()}
    for i, b in rt_bytes.items():
        assert b == in_bytes[i]


def test_crs84_writes_null_footer_crs(spark, tmp_path):
    from sedona_db_spark.sources import geostore as G
    df = spark.createDataFrame(FX.random_points(10, seed=6)) \
        .withColumnRenamed("geometry", "geom")
    path = str(tmp_path / "crs84_gpq")
    G.write_geoparquet(df, path, "geom")
    meta = G.geoparquet_metadata(path)
    # spec: null crs means OGC:CRS84 (lon/lat) — the engine default
    assert meta["columns"]["geom"]["crs"] is None
    back, _ = G.read_geoparquet(spark, path)
    assert C.get_crs(back, "geom") == "OGC:CRS84"


def test_spherical_edges_survive_roundtrip(spark, tmp_path):
    from sedona_db_spark.sources import geostore as G
    df = C.with_crs(
        spark.createDataFrame(FX.random_points(10, seed=7))
        .withColumnRenamed("geometry", "geom"), "geom",
        "OGC:CRS84", edges="spherical")
    path = str(tmp_path / "sph_gpq")
    G.write_geoparquet(df, path, "geom")
    meta = G.geoparquet_metadata(path)
    assert meta["columns"]["geom"]["edges"] == "spherical"
    back, _ = G.read_geoparquet(spark, path)
    assert C.get_edges(back, "geom") == "spherical"
