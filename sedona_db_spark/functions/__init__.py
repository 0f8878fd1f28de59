from sedona_db_spark.functions.register import register_functions  # noqa: F401
