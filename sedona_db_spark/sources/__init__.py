from sedona_db_spark.sources import fixtures  # noqa: F401
