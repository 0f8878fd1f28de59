"""Raster (RS_) function tests: affine round trips + extent predicates.
Invariants from FIXTURES.md §6 / reference rs_pixel_functions.rs."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb as W
from sedona_db_spark.raster.model import make_tiles_df
from sedona_db_spark.raster import functions as RS


@pytest.fixture(scope="module")
def tiles(spark):
    return make_tiles_df(spark, nx=4, ny=4, tile_px=16,
                         bounds=(-120.0, 20.0, -60.0, 50.0)).cache()


def test_accessors(tiles):
    r = tiles.select(
        RS.rs_width(F.col("raster")).alias("w"),
        RS.rs_height(F.col("raster")).alias("h"),
        RS.rs_numbands(F.col("raster")).alias("nb"),
        RS.rs_scalex(F.col("raster")).alias("sx"),
        RS.rs_scaley(F.col("raster")).alias("sy"),
        RS.rs_crs(F.col("raster")).alias("crs"),
    ).collect()
    for row in r:
        assert row["w"] == 16 and row["h"] == 16 and row["nb"] == 1
        assert row["sx"] == 15.0 / 16 and row["sy"] == -7.5 / 16
        assert row["crs"] == "OGC:CRS84"


def test_world_pixel_round_trip(tiles):
    # RS_RasterToWorldCoord of pixel (c, r) then RS_WorldToRasterCoord → (c, r)
    df = tiles.select(
        "tile_id",
        RS.rs_rastertoworldcoordx(F.col("raster"), F.lit(5), F.lit(7)).alias("wx"),
        RS.rs_rastertoworldcoordy(F.col("raster"), F.lit(5), F.lit(7)).alias("wy"),
        F.col("raster"))
    back = df.select(
        "tile_id",
        RS.rs_worldtorastercoordx(F.col("raster"), F.col("wx") + 1e-9, F.col("wy")).alias("c"),
        RS.rs_worldtorastercoordy(F.col("raster"), F.col("wx"), F.col("wy") - 1e-9).alias("r"),
    ).collect()
    for row in back:
        assert row["c"] == 5 and row["r"] == 7, row


def test_pixel_as_point_polygon_consistent(tiles):
    rows = tiles.select(
        RS.rs_pixelaspoint(F.col("raster"), F.lit(1), F.lit(1)).alias("p"),
        RS.rs_pixelaspolygon(F.col("raster"), F.lit(1), F.lit(1)).alias("poly"),
        RS.rs_pixelascentroid(F.col("raster"), F.lit(1), F.lit(1)).alias("c"),
        RS.rs_upperleftx(F.col("raster")).alias("ulx"),
        RS.rs_upperlefty(F.col("raster")).alias("uly"),
    ).collect()
    from sedona_db_spark.geometry import kernels as K
    for r in rows:
        p = W.decode(bytes(r["p"]))
        assert p[1][0] == r["ulx"] and p[1][1] == r["uly"]  # pixel 1,1 = UL corner
        poly = W.decode(bytes(r["poly"]))
        c = W.decode(bytes(r["c"]))
        assert K.points_in_geom(np.array([c[1][0]]), np.array([c[1][1]]), poly)[0]


def test_envelope_and_intersects(tiles, spark):
    # tile extents tile the bounds; a rect overlapping only the west half
    from sedona_db_spark.functions.scalar import st_geomfromtext
    rect = spark.createDataFrame(
        [("r1", "POLYGON ((-121 19, -90.1 19, -90.1 51, -121 51, -121 19))")],
        "name string, wkt string").withColumn("geom", st_geomfromtext(F.col("wkt")))
    j = tiles.crossJoin(rect).where(RS.rs_intersects(F.col("raster"), F.col("geom")))
    ids = {r["tile_id"] for r in j.select("tile_id").collect()}
    # 4x4 grid over lon [-120,-60]: west-half tiles are columns 0,1 (+ col 2
    # touches -90.1? col 2 spans [-90,-75] → no). tile_id = row*4+col
    assert ids == {r * 4 + c for r in range(4) for c in (0, 1)}


def test_rs_value_deterministic(tiles):
    rows = tiles.select(
        "tile_id",
        RS.rs_value(F.col("raster"), F.lit(3), F.lit(2)).alias("v")).collect()
    for r in rows:
        assert r["v"] == (r["tile_id"] * 31 + 1 * 7 + 2 * 3) % 256


def test_band_nodata_any_band(spark):
    """RS_BandNoDataValueBand: 1-based index into any band (reference
    RsBandNoDataValueWithBand); out-of-range -> NULL."""
    import struct
    import pandas as pd
    from pyspark.sql import functions as F
    from sedona_db_spark.raster.model import RASTER_TYPE
    from pyspark.sql.types import StructType, StructField

    def band(nd_bytes):
        return {"metadata": {"nodatavalue": nd_bytes, "storage_type": 0,
                             "datatype": 5, "outdb_url": None,
                             "outdb_band_id": None},
                "data": bytes([0] * 4)}

    raster = {
        "metadata": {"width": 2, "height": 2, "upperleft_x": 0.0,
                     "upperleft_y": 0.0, "scale_x": 1.0, "scale_y": -1.0,
                     "skew_x": 0.0, "skew_y": 0.0},
        "crs": "EPSG:4326",
        "bands": [band(struct.pack("<d", -9999.0)), band(bytes([7]))],
    }
    df = spark.createDataFrame([(raster,)],
                               StructType([StructField("raster", RASTER_TYPE)]))
    r = df.select(
        F.expr("RS_BandNoDataValueBand(raster, 1)").alias("b1"),
        F.expr("RS_BandNoDataValueBand(raster, 2)").alias("b2"),
        F.expr("RS_BandNoDataValueBand(raster, 3)").alias("b3"),
        F.expr("RS_BandNoDataValue(raster)").alias("b_default")).head(1)[0]
    assert r["b1"] == -9999.0 and r["b_default"] == -9999.0
    assert r["b2"] == 7.0
    assert r["b3"] is None


def test_raster_vector_join_matches_bruteforce(spark):
    """Covering-cell raster↔vector join == brute-force rs_intersects over
    all pairs, for BOTH axis-rect and general polygon layers, with no
    CartesianProduct in the plan and no duplicate pairs."""
    import numpy as np
    from pyspark.sql import functions as F
    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.raster.model import make_tiles_df
    from sedona_db_spark.raster.functions import rs_intersects
    from sedona_db_spark.raster.join import raster_vector_join

    tiles = make_tiles_df(spark, 8, 8, 4, (-120.0, 20.0, -60.0, 50.0),
                          with_pixels=False)
    # general layer: triangles (not axis rects) scattered over the bounds
    rng = np.random.default_rng(11)
    rows = []
    for i in range(12):
        cx = float(rng.uniform(-125, -55))
        cy = float(rng.uniform(15, 55))
        s = float(rng.uniform(1.0, 8.0))
        tri = np.array([[cx, cy], [cx + s, cy], [cx + s / 2, cy + s],
                        [cx, cy]])
        rows.append((i, bytes(W.encode(("Polygon", [tri])))))
    geoms = spark.createDataFrame(rows, ["gid", "geom"])

    got = {(r["tile_id"], r["gid"])
           for r in raster_vector_join(tiles, geoms).collect()}
    brute = tiles.crossJoin(F.broadcast(geoms)).where(
        rs_intersects(F.col("raster"), F.col("geom")))
    exp = {(r["tile_id"], r["gid"]) for r in brute.collect()}
    assert got == exp
    # no duplicate pairs (reference-point dedup, not dropDuplicates)
    all_rows = [(r["tile_id"], r["gid"])
                for r in raster_vector_join(tiles, geoms).collect()]
    assert len(all_rows) == len(set(all_rows))
    plan = (raster_vector_join(tiles, geoms)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
