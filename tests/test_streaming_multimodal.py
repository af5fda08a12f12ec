import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.functions.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    decode_image_features,
    sample_frames,
)
from cdk_datalake_ingest_spark.sources.parquet import load_table
from cdk_datalake_ingest_spark.streaming.events import (
    run_available_now,
    stream_events,
    windowed_event_counts,
)

import pytest


def test_streaming_matches_batch_rollup(spark, tmp_path, sf_dir):
    # stage a copy of events (with us timestamps) as the stream source
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
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
    with pytest.raises(NotImplementedError):
        decode_image_features(_media_df(spark), fake=False)


def test_sample_frames(spark):
    frames = sample_frames(_media_df(spark), every_ms=1000).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_ms)
    assert by_media[1] == [0, 1000, 2000]
    assert 0 not in by_media  # images excluded
