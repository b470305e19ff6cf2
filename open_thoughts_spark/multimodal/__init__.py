from open_thoughts_spark.multimodal.media import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_and_featurize,
    make_synthetic_media,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_and_featurize",
    "make_synthetic_media",
    "sample_frames",
]
