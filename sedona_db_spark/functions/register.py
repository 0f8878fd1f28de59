"""SQL registration of all ST_/RS_/SD_ functions on a SparkSession.

Analogue of the reference's function-set registration
(/root/reference/rust/sedona/src/context.rs:200-247): after
``register_functions(spark)`` both ``spark.sql("SELECT ST_Contains(...)")``
and the DataFrame API (calling the UDFs from
sedona_db_spark.functions.scalar) work.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_functions(spark: SparkSession) -> None:
    from sedona_db_spark.functions.scalar import UDFS
    from sedona_db_spark.functions.scalar2 import UDFS2, st_snaptogrid
    from sedona_db_spark.functions.scalar3 import UDFS3
    from sedona_db_spark.functions.scalar4 import UDFS4
    for name, fn in {**UDFS, **UDFS2, **UDFS3, **UDFS4}.items():
        spark.udf.register(name, fn)
    spark.udf.register("ST_ReducePrecision", st_snaptogrid)
    # geography-constructor + EWKT/EWKB aliases (planar tier: same storage)
    aliases = {
        "ST_GeomFromEWKT": UDFS["ST_GeomFromText"],
        "ST_GeogFromWKT": UDFS["ST_GeomFromText"],
        "ST_GeogFromText": UDFS["ST_GeomFromText"],
        "ST_GeomFromEWKB": UDFS["ST_GeomFromWKB"],
        "ST_GeogFromWKB": UDFS["ST_GeomFromWKB"],
        "ST_GeogPoint": UDFS["ST_Point"],
    }
    for name, fn in aliases.items():
        spark.udf.register(name, fn)
    from sedona_db_spark.functions.aggregates import _grouped_agg_udfs
    for name, fn in _grouped_agg_udfs().items():
        spark.udf.register(name, fn)
    try:
        from sedona_db_spark.raster.functions import RS_UDFS
        for name, fn in RS_UDFS.items():
            spark.udf.register(name, fn)
    except ImportError:
        pass
