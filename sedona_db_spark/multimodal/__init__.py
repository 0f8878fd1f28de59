from sedona_db_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA, decode_image_stub, decode_media_frame, decode_png,
    decode_wav, encode_png_gray, encode_wav_pcm16, extract_media_meta,
    parse_png_header, parse_wav_header,
)
