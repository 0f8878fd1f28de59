from sedona_db_spark.streaming.pipeline import (  # noqa: F401
    streaming_cell_counts, streaming_exact_dedup, streaming_geocode,
    streaming_sessionize, streaming_spatial_join,
)
