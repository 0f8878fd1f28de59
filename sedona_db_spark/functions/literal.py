"""Python-value → Spark literal front-end.

Spark adaptation of the reference's ``sedonadb.expr.literal.lit``
(python/sedonadb/python/sedonadb/expr/literal.py, behavior pinned by
python/sedonadb/tests/expr/test_literal.py): one entry point that turns a
Python-side value — scalar, geometry, one-element pandas container, or a
one-cell DataFrame — into a Column literal, propagating CRS into the
value (EWKB SRID) where the reference propagates it into the Arrow type.

The sandbox has no shapely/geopandas, so "geometry value" here means the
engine's decoded tuple form (``("Point", ndarray)`` …) or raw WKB/EWKB
bytes; the reference's shapely rows are replayed against those in
tests/test_reference_literal.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def lit(value, crs: str | None = None) -> Column:
    """Build a literal Column.

    - None / bool / int / float / str → plain literal
    - bytes/bytearray → binary literal (assumed WKB/EWKB, passed through)
    - decoded geometry tuple → WKB literal (LinearRing collapses to
      LineString, the reference's test_shapely_linearring row)
    - pandas Series/DataFrame → the single contained value
      (ValueError "with length != 1" / "with shape != (1, 1)" otherwise)
    - Spark DataFrame → the single cell
      (ValueError "number of columns != 1" / "size != 1 row" otherwise)

    ``crs="EPSG:nnnn"`` on a geometry embeds the SRID as EWKB — the
    value-level carrier of the reference's type-level CRS propagation
    (test_geopandas_literal asserts EPSG:3857 survives lit())."""
    import pandas as pd

    from sedona_db_spark.geometry import wkb as W

    if isinstance(value, DataFrame):
        if len(value.columns) != 1:
            raise ValueError(
                f"Can't build literal from DataFrame with number of "
                f"columns != 1 ({len(value.columns)})")
        rows = value.limit(2).collect()
        if len(rows) != 1:
            raise ValueError(
                f"Can't build literal from DataFrame with size != 1 row")
        return lit(rows[0][0], crs=crs)
    if isinstance(value, pd.DataFrame):
        if value.shape != (1, 1):
            raise ValueError(
                f"Can't build literal from DataFrame with shape != (1, 1) "
                f"({value.shape})")
        return lit(value.iloc[0, 0], crs=crs)
    if isinstance(value, pd.Series):
        if len(value) != 1:
            raise ValueError(
                f"Can't build literal from Series with length != 1 "
                f"({len(value)})")
        return lit(value.iloc[0], crs=crs)
    if isinstance(value, tuple) and len(value) == 2 \
            and isinstance(value[0], str):
        name, payload = value
        if name == "LinearRing":
            value = ("LineString", payload)
        wkb = W.encode(value)
        return lit(wkb, crs=crs)
    if isinstance(value, (bytes, bytearray)):
        b = bytes(value)
        if crs:
            code = crs.rpartition(":")[2]
            if code.isdigit():
                b = W.set_srid(b, int(code))
        return F.lit(b)
    if isinstance(value, np.generic):
        value = value.item()
    if value is None or isinstance(value, (bool, int, float, str)):
        return F.lit(value)
    raise TypeError(f"Can't build literal from {type(value).__name__}")
