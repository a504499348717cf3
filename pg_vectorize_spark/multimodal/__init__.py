from pg_vectorize_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    binary_metadata,
    decode_media,
    frame_sample,
    with_media_columns,
)

__all__ = [
    "MEDIA_SCHEMA",
    "binary_metadata",
    "decode_media",
    "frame_sample",
    "with_media_columns",
]
