"""Multimodal (image/audio/video) column support for the training-data
pipeline surface.

Media are opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas``. The actual codec step is STUBBED (no
image/audio libs in this container) behind a deterministic fake — the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape) is
real and tested.
"""

from .media import (
    AUDIO_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    media_table,
    decode_features,
    resize_stub,
    frame_sample,
    audio_spectrogram,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "media_table",
    "decode_features",
    "resize_stub",
    "frame_sample",
    "audio_spectrogram",
    "AUDIO_FEATURE_SCHEMA",
]
