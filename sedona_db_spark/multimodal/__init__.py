from sedona_db_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA, extract_media_meta, decode_image_stub,
)
