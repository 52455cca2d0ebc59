"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested; the codec step is stubbed behind
``set_image_decoder``/deterministic fakes because no image/audio libraries
exist in this container (clearly marked — swap in PIL/torchaudio/pyav on a
real cluster).
"""

from .ops import (
    MEDIA_SCHEMA,
    decode_image_features,
    frame_sample_plan,
    media_metadata,
    set_image_decoder,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_metadata",
    "decode_image_features",
    "frame_sample_plan",
    "set_image_decoder",
]
