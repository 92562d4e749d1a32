from arcane_framework_scala_spark.multimodal.media import (
    MEDIA_META_SCHEMA,
    attach_media,
    audio_features,
    audio_segments,
    frame_sample,
    sniff_media_type,
    image_features,
    resize_images,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media",
    "audio_features",
    "audio_segments",
    "frame_sample",
    "sniff_media_type",
    "image_features",
    "resize_images",
]
