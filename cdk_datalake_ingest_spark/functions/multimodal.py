"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each executor processes whole record batches
without per-row Python overhead. The actual codec work is STUBBED
(image/audio libraries are not in this environment): ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder produces stable feature rows — the Spark
plumbing (schema, batching, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("sha1", StringType()),
        StructField("feat_0", IntegerType()),
        StructField("feat_1", IntegerType()),
        # Codec-free byte-level features — real signal (not stubbed):
        # distinct byte values and Shannon entropy of the byte
        # histogram, the standard cheap screens for corrupt/ truncated
        # media (entropy far from the codec's norm) and for compressed-
        # vs-plaintext payload classification.
        StructField("n_distinct_bytes", IntegerType()),
        StructField("entropy_bits", DoubleType()),
    ]
)


# (magic-byte prefix, mime) — checked in order; longest prefixes first
# where one is a prefix of another.
_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
    (b"\x1aE\xdf\xa3", "video/webm"),
]


def sniff_mime(col) -> "F.Column":
    """Content-type detection from magic bytes — native binary
    comparisons (JVM-side, codec-free): the real part of media
    ingestion that does not need a decoder. Handles the offset-based
    RIFF (WAV/AVI) and ISO-BMFF (MP4) containers too."""
    import pyspark.sql.functions as _F

    def prefix(n: int) -> "F.Column":
        return _F.substring(col, 1, n)

    expr = _F.lit("application/octet-stream")
    # ISO base media: bytes 5-8 == 'ftyp'
    expr = _F.when(
        _F.substring(col, 5, 4) == _F.lit(b"ftyp"), "video/mp4"
    ).otherwise(expr)
    # RIFF container: discriminate by format tag at offset 9
    expr = _F.when(
        (prefix(4) == _F.lit(b"RIFF"))
        & (_F.substring(col, 9, 4) == _F.lit(b"WAVE")),
        "audio/wav",
    ).when(
        (prefix(4) == _F.lit(b"RIFF"))
        & (_F.substring(col, 9, 4) == _F.lit(b"AVI ")),
        "video/avi",
    ).otherwise(expr)
    for magic, mime in _MAGIC:
        expr = _F.when(prefix(len(magic)) == _F.lit(magic), mime).otherwise(expr)
    return expr


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for pixel decoding."""
    h = hashlib.sha1(content or b"").digest()
    return h[0], h[1]


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    Real decoding would swap ``_fake_decode`` for PIL/libvips inside
    the same mapInPandas batch loop — the batch shape, schema and
    partitioning are identical.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub decoder"
        )

    import numpy as np

    def _byte_stats(content: bytes) -> tuple[int, float]:
        if not content:
            return 0, 0.0
        counts = np.bincount(
            np.frombuffer(content, dtype=np.uint8), minlength=256
        )
        p = counts[counts > 0] / float(len(content))
        return int(len(p)), float(-(p * np.log2(p)).sum())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_decode(c) for c in pdf["content"]]
            stats = [_byte_stats(c or b"") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(c or b"") for c in pdf["content"]],
                    "sha1": [
                        hashlib.sha1(c or b"").hexdigest() for c in pdf["content"]
                    ],
                    "feat_0": [f[0] for f in feats],
                    "feat_1": [f[1] for f in feats],
                    "n_distinct_bytes": [s[0] for s in stats],
                    "entropy_bits": [s[1] for s in stats],
                }
            )

    return df.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def target_dims(width: int, height: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving fit into a ``max_dim`` bounding box (the real,
    non-stubbed part of resizing): scale the longer side down to
    max_dim, never upscale, round half-up, floor at 1px."""
    if max_dim <= 0:
        # 0 would silently collapse every image to 1x1 via the
        # max(1, ...) floor — same raise-at-boundary contract as the
        # sessionizer gap / dedup caps
        raise ValueError(f"target_dims: max_dim must be positive, got {max_dim}")
    w, h = int(width or 0), int(height or 0)
    if w <= 0 or h <= 0:
        return 0, 0
    longest = max(w, h)
    if longest <= max_dim:
        return w, h
    scale = max_dim / float(longest)
    return max(1, int(w * scale + 0.5)), max(1, int(h * scale + 0.5))


def resize_images(df: DataFrame, max_dim: int = 512, fake: bool = False) -> DataFrame:
    """Arrow-batched image resize over binary content. The output-
    dimension computation (:func:`target_dims`) is real; the pixel
    work is stubbed like :func:`decode_image_features` — a real
    deployment swaps the fake re-encode for PIL/libvips inside the
    same mapInPandas batch loop with identical schema/partitioning.
    The fake output bytes are deterministic in (content, dims) so
    downstream dedup/hash stages exercise realistically."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub resizer"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [
                target_dims(w, h, max_dim)
                for w, h in zip(pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": [d[0] for d in dims],
                    "out_height": [d[1] for d in dims],
                    "content": [
                        hashlib.sha1(
                            (c or b"") + b"|%dx%d" % d
                        ).digest()
                        for c, d in zip(pdf["content"], dims)
                    ],
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explodes per-frame timestamp
    offsets natively; frame decode itself would be a mapInPandas stage
    like :func:`decode_image_features`."""
    if every_ms <= 0:
        # Spark's sequence() raises on a zero step only at RUNTIME and
        # deep inside a task; fail at plan-construction time instead
        raise ValueError(
            f"sample_frames: every_ms must be positive, got {every_ms}"
        )
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "frame_ms", "content")
    )
