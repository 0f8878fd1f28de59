from sedona_db_spark.raster.model import RASTER_TYPE, make_tiles_df  # noqa: F401
from sedona_db_spark.raster.functions import RS_UDFS  # noqa: F401
