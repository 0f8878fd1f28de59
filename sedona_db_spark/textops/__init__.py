from sedona_db_spark.textops import dedup, analysis  # noqa: F401
