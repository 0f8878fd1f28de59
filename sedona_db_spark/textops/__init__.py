from sedona_db_spark.textops import (  # noqa: F401
    dedup, analysis, repetition, substring, scrub, decontam)
