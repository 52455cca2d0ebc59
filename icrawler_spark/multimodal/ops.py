"""Multimodal operators over binary media columns.

Design for 100 TB: media rides as one opaque ``binary`` column next to typed
metadata (media_type, mime, n_bytes, magic-sniffed format); decode/feature
stages are ``mapInPandas`` with bounded Arrow batches (media rows are large —
cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly and
partition by a size-aware key so one executor never holds a skewed batch of
huge videos).

Codec posture: PNG is decoded FOR REAL by the from-scratch stdlib codec
(:mod:`icrawler_spark.multimodal.png` — chunk framing, all five scanline
filters, palette expansion); the remaining codecs (JPEG decode, audio
resample, video frame extraction) are NOT available in this container, so
``_default_image_decoder`` routes PNG payloads to the real decoder and
raises ``NotImplementedError`` for the rest. Tests also exercise
``deterministic_fake_decoder`` (md5-seeded pseudo-features) for the
plumbing-only path. On a real cluster call ``set_image_decoder(pil_decoder)``
once per session to cover every format.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),   # image | audio | video
    StructField("mime", StringType()),
    StructField("content", StringType()),       # placeholder when absent
])

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
]


def sniff_mime(data: bytes | None) -> str | None:
    if not data:
        return None
    for magic, mime in _MAGIC:
        if data[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


# --- decoder registry (the stub boundary) ------------------------------------

ImageDecoder = Callable[[bytes], "tuple[int, int, list[float]]"]
"""bytes → (width, height, feature_vector)."""


def _default_image_decoder(data: bytes) -> tuple[int, int, list[float]]:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import png_image_decoder

        return png_image_decoder(data)
    raise NotImplementedError(
        "No codec for this format in this environment (PNG decodes natively) "
        "- inject one with set_image_decoder() (e.g. a PIL-based decoder on "
        "a real cluster)"
    )


def deterministic_fake_decoder(data: bytes) -> tuple[int, int, list[float]]:
    """md5-seeded pseudo-decode: stable (w, h, 8-dim feature) per payload —
    exercises the full Arrow/batch path without a codec."""
    h = hashlib.md5(data or b"").digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    feats = [round(b / 255.0, 6) for b in h[2:10]]
    return w, ht, feats


_image_decoder: ImageDecoder = _default_image_decoder


def set_image_decoder(decoder: ImageDecoder) -> None:
    global _image_decoder
    _image_decoder = decoder


# --- operators ----------------------------------------------------------------


def media_metadata(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata projection: byte length + magic-sniffed mime.

    Length stays JVM-native; only the magic sniff drops to a pandas UDF
    (first 16 bytes — negligible Arrow traffic if the caller pre-projects
    ``substring(content, 1, 16)``; done here)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def sniff(prefixes: pd.Series) -> pd.Series:
        return prefixes.map(lambda b: sniff_mime(bytes(b) if b is not None else None))

    return media.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "sniffed_mime", sniff(F.substring(F.col(content_col), 1, 16))
    )


_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("features", ArrayType(FloatType())),
    StructField("decode_error", StringType()),
])


def decode_image_features(
    media: DataFrame, decoder: ImageDecoder | None = None
) -> DataFrame:
    """media(media_id, content binary) → (width, height, features, error).

    Arrow-batched mapInPandas; per-row decode errors are captured as data
    (a poisoned payload must not kill the stage at 10^10 rows)."""
    use = decoder or _image_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "features", "decode_error")}
            for row in pdf.itertuples(index=False):
                out["media_id"].append(row.media_id)
                try:
                    w, h, feats = use(bytes(row.content) if row.content is not None else b"")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["features"].append(feats)
                    out["decode_error"].append(None)
                except Exception as exc:  # captured, not raised
                    out["width"].append(None)
                    out["height"].append(None)
                    out["features"].append(None)
                    out["decode_error"].append(type(exc).__name__)
            yield pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in out.items()})

    return media.select("media_id", "content").mapInPandas(run, _FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, fps: float = 1.0, duration_col: str = "duration_s") -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx, ts_s) rows, one per
    sampled frame — pure JVM sequence/explode, no Python. The actual frame
    *extraction* would be a mapInPandas over (media_id, content, ts_s)
    batches (stubbed: no pyav here); the plan is what drives partitioning
    and batch shape at scale."""
    n_frames = F.greatest(F.floor(F.col(duration_col) * fps).cast("int"), F.lit(1))
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_f"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") / fps).alias("ts_s"),
    )
