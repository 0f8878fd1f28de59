"""Replay of the reference's expr/test_literal.py
(python/sedonadb/tests/expr/test_literal.py) against the Spark-adapted
``lit()`` front-end (functions/literal.py).

shapely/geopandas objects don't exist in this sandbox; the geometry rows
run against the engine's decoded tuple form with the same WKT inputs and
the same expected bytes/CRS outcomes."""

import numpy as np
import pandas as pd
import pytest

from sedona_db_spark.functions.literal import lit
from sedona_db_spark.geometry import wkb as W


def _value(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_basic_python_literal(spark):
    assert _value(spark, lit(1)) == 1
    assert _value(spark, lit("one")) == "one"
    assert _value(spark, lit(None)) is None


GEOM_WKTS = [
    "POINT (0 1)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "MULTIPOINT ((0 0), (1 1))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
    "((2 2, 3 2, 3 3, 2 3, 2 2)))",
    "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))",
]


@pytest.mark.parametrize("wkt", GEOM_WKTS)
def test_geometry_literal(spark, wkt):
    # reference test_shapely_literal: every geometry type round-trips
    g = W.from_wkt(wkt)
    got = _value(spark, lit(g))
    assert bytes(got) == W.encode(g)


def test_linearring_literal(spark):
    # reference test_shapely_linearring: LINEARRING lowers to LINESTRING
    ring = ("LinearRing", np.array([[0.0, 0], [1, 0], [0, 1], [0, 0]]))
    got = _value(spark, lit(ring))
    assert W.decode(bytes(got))[0] == "LineString"


def test_crs_propagates_as_ewkb_srid(spark):
    # reference test_geopandas_literal: EPSG:3857 survives lit()
    g = W.from_wkt("POINT (0 1)")
    got = _value(spark, lit(g, crs="EPSG:3857"))
    assert W.get_srid(bytes(got)) == 3857
    # null-CRS default: no SRID embedded
    plain = _value(spark, lit(g))
    assert W.get_srid(bytes(plain)) in (0, None)


def test_pandas_literal(spark):
    # reference test_pandas_literal, same error messages
    assert _value(spark, lit(pd.Series([1]))) == 1
    assert _value(spark, lit(pd.DataFrame({"x": [1]}))) == 1
    with pytest.raises(ValueError, match="with length != 1"):
        lit(pd.Series([], dtype=float))
    with pytest.raises(ValueError, match=r"with shape != \(1, 1\)"):
        lit(pd.DataFrame({"x": []}))
    with pytest.raises(ValueError, match=r"with shape != \(1, 1\)"):
        lit(pd.DataFrame({"x": [1], "y": [2]}))


def test_dataframe_literal(spark):
    # reference test_sedonadb_literal, same error messages
    df = spark.sql("SELECT 1 AS one")
    assert _value(spark, lit(df)) == 1
    with pytest.raises(ValueError, match="number of columns != 1"):
        lit(spark.sql("SELECT 1 AS one, 2 AS two"))
    with pytest.raises(ValueError, match="size != 1 row"):
        lit(spark.sql("SELECT 1 AS one WHERE false"))
