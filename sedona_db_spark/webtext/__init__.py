from sedona_db_spark.webtext.pages import (  # noqa: F401
    synth_pages, extract_text_col, geocode_cols, pages_to_points,
)
from sedona_db_spark.webtext import urlops  # noqa: F401
