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


def test_union_all_tracer_matches_sweep_on_polygon_groups():
    """round-8 VERDICT #6: union_all's all-polygonal groups run the
    crossing-split tracer first; region parity with the winding-exact
    slab sweep over random overlapping 90-vertex children."""
    import numpy as np
    import pytest as _pytest

    from sedona_db_spark.geometry import ring_union as RU
    from sedona_db_spark.geometry.kernels import geom_area
    from sedona_db_spark.geometry.overlay import union_all

    rng = np.random.default_rng(17)

    def wavy(cx, cy, r, k=90):
        ang = rng.uniform(0, 2 * np.pi) + np.linspace(0, 2 * np.pi,
                                                      k + 1)[:-1]
        rad = r * (1.0 + 0.12 * np.sin(5 * ang + rng.uniform(0, 6)))
        p = np.column_stack([np.cos(ang) * rad + cx,
                             np.sin(ang) * rad + cy])
        return ("Polygon", [np.vstack([p, p[:1]])])

    old = RU.ENABLED
    try:
        for _ in range(40):
            cx, cy = rng.uniform(0, 50, 2)
            gs = [wavy(cx + rng.uniform(-3, 3), cy + rng.uniform(-3, 3),
                       rng.uniform(2, 4))
                  for _ in range(int(rng.integers(3, 7)))]
            RU.ENABLED = True
            fast = geom_area(union_all(gs))
            RU.ENABLED = False
            slow = geom_area(union_all(gs))
            assert fast == _pytest.approx(slow, rel=0, abs=1e-9)
    finally:
        RU.ENABLED = old
