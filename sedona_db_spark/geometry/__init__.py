from sedona_db_spark.geometry import wkb, kernels  # noqa: F401
