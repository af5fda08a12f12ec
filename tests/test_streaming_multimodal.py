import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.functions.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    decode_image_features,
    sample_frames,
)
from cdk_datalake_ingest_spark.sources.parquet import load_table, ts_us_expr
from cdk_datalake_ingest_spark.streaming.events import (
    run_available_now,
    stream_events,
    windowed_event_counts,
)

import pytest


def test_streaming_matches_batch_rollup(spark, tmp_path, sf_dir):
    # stage a copy of events (with us timestamps) as the stream source
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.withColumn("ts", F.timestamp_micros(ts_us_expr(ev_raw)))
    src = str(tmp_path / "stream_src")
    ev.write.parquet(src)
    static = spark.read.parquet(src)

    stream = stream_events(spark, src, static.schema)
    assert stream.isStreaming
    result = windowed_event_counts(stream, watermark="1 hour", window_size="1 hour")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(result, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    batch = (
        static.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = got.select("window_start", "event_type", "n").exceptAll(
        batch.select("window_start", "event_type", "n")
    )
    # every emitted window agrees with the batch result
    assert joined.count() == 0
    # append mode withholds only the final not-yet-finalized window(s)
    # (their end is not past the watermark when the stream drains)
    n_types = static.select("event_type").distinct().count()
    assert got.count() >= batch.count() - n_types


def _media_df(spark):
    rows = [
        Row(
            media_id=i,
            media_type="video" if i % 2 else "image",
            content=bytes([i]) * (10 + i),
            mime="application/octet-stream",
            width=4,
            height=4,
            duration_ms=2500 if i % 2 else None,
        )
        for i in range(6)
    ]
    return spark.createDataFrame(rows)


def test_multimodal_fake_decode_plumbing(spark):
    df = _media_df(spark)
    feats = decode_image_features(df, fake=True)
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert rows[0].byte_len == 10
    assert rows[0].sha1 == hashlib.sha1(bytes([0]) * 10).hexdigest()
    assert 0 <= rows[0].feat_0 <= 255


def test_multimodal_decode_without_codecs_raises(spark):
    from cdk_datalake_ingest_spark.functions.multimodal import HAS_PIL

    if HAS_PIL:
        pytest.skip("Pillow installed: fake=False runs the real decode")
    with pytest.raises(NotImplementedError):
        decode_image_features(_media_df(spark), fake=False)


def test_resize_dims_math():
    from cdk_datalake_ingest_spark.functions.multimodal import target_dims

    assert target_dims(4000, 3000, 512) == (512, 384)
    assert target_dims(3000, 4000, 512) == (384, 512)
    assert target_dims(100, 100, 512) == (100, 100)  # never upscale
    assert target_dims(10000, 3, 512) == (512, 1)  # floor at 1px
    assert target_dims(0, 50, 512) == (0, 0)  # missing metadata


def test_resize_images_plumbing(spark):
    import hashlib as _h

    from cdk_datalake_ingest_spark.functions.multimodal import (
        RESIZED_SCHEMA,
        resize_images,
    )

    df = _media_df(spark).withColumn("width", F.lit(4000)).withColumn(
        "height", F.lit(3000)
    )
    out = resize_images(df, max_dim=512, fake=True)
    assert out.schema == RESIZED_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {0, 2, 4}  # images only
    r0 = rows[0]
    assert (r0.out_width, r0.out_height) == (512, 384)
    # fake bytes are deterministic in (content, dims)
    assert bytes(r0.content) == _h.sha1(bytes([0]) * 10 + b"|512x384").digest()
    from cdk_datalake_ingest_spark.functions.multimodal import HAS_PIL

    if not HAS_PIL:
        with pytest.raises(NotImplementedError):
            resize_images(df, fake=False)


def test_sample_frames(spark):
    frames = sample_frames(_media_df(spark), every_ms=1000).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_ms)
    assert by_media[1] == [0, 1000, 2000]
    assert 0 not in by_media  # images excluded


def test_sniff_mime_magic_bytes(spark):
    from cdk_datalake_ingest_spark.functions.multimodal import sniff_mime

    samples = [
        (1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 8, "image/png"),
        (2, b"\xff\xd8\xff\xe0rest", "image/jpeg"),
        (3, b"GIF89a....", "image/gif"),
        (4, b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/wav"),
        (5, b"RIFF\x00\x00\x00\x00AVI LIST", "video/avi"),
        (6, b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
        (7, b"OggS\x00\x02", "audio/ogg"),
        (8, b"fLaC\x00\x00", "audio/flac"),
        (9, b"ID3\x04tag", "audio/mpeg"),
        (10, b"\x1aE\xdf\xa3webm", "video/webm"),
        (11, b"plain text here", "application/octet-stream"),
        (12, b"", "application/octet-stream"),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c, _ in samples], "id int, content binary"
    )
    got = {
        r.id: r.mime
        for r in df.select("id", sniff_mime(F.col("content")).alias("mime")).collect()
    }
    assert got == {i: m for i, _, m in samples}


def test_approx_sketches_close_to_exact(spark, sf_dir):
    from cdk_datalake_ingest_spark.queries import user_engagement_approx

    rows = user_engagement_approx(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the gate output carries the bounds verdicts (oracle emits TRUE,
        # so an out-of-bounds sketch fails the hash gate); assert them
        # here too plus sanity on the exact companions
        assert r.users_in_bounds and r.p50_in_bounds and r.p95_in_bounds
        assert r.p50_exact is not None and r.p50_exact <= r.p95_exact
        assert r.exact_users <= r.n


def test_stream_dedup_within_watermark(spark, tmp_path):
    from cdk_datalake_ingest_spark.streaming.events import stream_dedup

    rows = [
        Row(k=1, ts="2024-01-01 10:00:00", v="first-1"),
        Row(k=2, ts="2024-01-01 10:00:30", v="first-2"),
        Row(k=1, ts="2024-01-01 10:02:00", v="dup-1"),
        Row(k=3, ts="2024-01-01 10:03:00", v="first-3"),
        Row(k=2, ts="2024-01-01 10:04:00", v="dup-2"),
        Row(k=1, ts="2024-01-01 10:05:00", v="dup-1b"),
    ]
    src = str(tmp_path / "dedup_src")
    static = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    static.write.parquet(src)

    stream = stream_events(spark, src, spark.read.parquet(src).schema)
    result = stream_dedup(stream, keys=["k"], watermark="10 minutes")
    out_dir, ckpt = str(tmp_path / "dedup_out"), str(tmp_path / "dedup_ckpt")
    run_available_now(result, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    # one survivor per key; repeats within the watermark horizon dropped
    assert got.count() == 3
    assert {r.k for r in got.collect()} == {1, 2, 3}


def test_multimodal_boundary_params_raise(spark):
    import pytest

    from cdk_datalake_ingest_spark.functions.multimodal import (
        sample_frames,
        target_dims,
    )

    with pytest.raises(ValueError, match="max_dim must be positive"):
        target_dims(100, 50, 0)
    df = spark.createDataFrame(
        [(1, "video", 5000, b"x")],
        "media_id long, media_type string, duration_ms long, content binary",
    )
    for bad in (0, -100):
        with pytest.raises(ValueError, match="every_ms must be positive"):
            sample_frames(df, every_ms=bad)



def test_real_pil_decode_when_available(spark):
    """Optional-dependency real decode (r14, env-gated like the Delta
    branch): skips cleanly when Pillow is absent; with it, fake=False
    decodes real pixel dimensions and classifies corrupt payloads as
    (-1, -1), and resize_images re-encodes real PNGs at target dims."""
    from cdk_datalake_ingest_spark.functions.multimodal import (
        HAS_PIL,
        decode_image_features,
        resize_images,
    )

    if not HAS_PIL:
        pytest.skip("Pillow not installed (sandbox capability boundary)")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (40, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [
            (0, "image", bytearray(png), "image/png", 40, 30, None),
            (1, "image", bytearray(b"corrupt"), "image/png", 40, 30, None),
        ],
        "media_id long, media_type string, content binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = {r.media_id: r for r in decode_image_features(df).collect()}
    assert (feats[0].feat_0, feats[0].feat_1) == (40, 30)
    assert (feats[1].feat_0, feats[1].feat_1) == (-1, -1)
    out = {r.media_id: r for r in resize_images(df, max_dim=20).collect()}
    assert (out[0].out_width, out[0].out_height) == (20, 15)
    with Image.open(io.BytesIO(bytes(out[0].content))) as im:
        assert (im.width, im.height) == (20, 15)
    assert bytes(out[1].content) == b""  # undecodable payload
