from sedona_db_spark.operators.spatial_join import spatial_join  # noqa: F401
from sedona_db_spark.operators.knn import knn_join  # noqa: F401
