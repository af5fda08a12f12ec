"""Salted skew join equivalence + streaming foreachBatch upsert sink."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.dedup import latest_record_dedup
from cdk_datalake_ingest_spark.operators.skew import salted_join
from cdk_datalake_ingest_spark.operators.table import ManagedTable
from cdk_datalake_ingest_spark.streaming.sink import stream_upsert_to_table


def _skewed(spark):
    # key 1 is hot (200 rows), keys 2..11 have 3 rows each
    rows = [Row(k=1, v=i) for i in range(200)]
    rows += [Row(k=kk, v=i) for kk in range(2, 12) for i in range(3)]
    left = spark.createDataFrame(rows)
    right = spark.createDataFrame(
        [Row(k=kk, name=f"dim{kk}") for kk in range(1, 10)]
    )
    return left, right


def test_salted_inner_equals_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, on=["k"]).groupBy("k").count()
    salted = salted_join(left, right, on=["k"], num_salts=8).groupBy("k").count()
    assert {(r.k, r["count"]) for r in plain.collect()} == {
        (r.k, r["count"]) for r in salted.collect()
    }


def test_salted_left_preserves_unmatched(spark):
    left, right = _skewed(spark)
    plain = left.join(right, on=["k"], how="left")
    salted = salted_join(left, right, on=["k"], how="left", num_salts=4)
    assert plain.count() == salted.count()
    # unmatched keys (10, 11) appear exactly as in the plain join
    unmatched = salted.filter(F.col("name").isNull()).groupBy("k").count()
    assert {(r.k, r["count"]) for r in unmatched.collect()} == {(10, 3), (11, 3)}


def test_salted_join_rejects_right_outer(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, on=["k"], how="right")


def test_salted_join_with_duplicate_right_keys(spark):
    left = spark.createDataFrame([Row(k=1, v=1), Row(k=1, v=2), Row(k=2, v=3)])
    right = spark.createDataFrame(
        [Row(k=1, name="a"), Row(k=1, name="b"), Row(k=2, name="c")]
    )
    plain = sorted(
        (r.k, r.v, r.name) for r in left.join(right, on=["k"]).collect()
    )
    salted = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(left, right, on=["k"], num_salts=3).collect()
    )
    assert plain == salted


def test_stream_upsert_matches_batch_merge(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    batch1 = [
        Row(user_id=1, event_type="click", ts=t0, value=1.0),
        Row(user_id=1, event_type="view", ts=t0, value=2.0),
        Row(user_id=2, event_type="click", ts=t0, value=3.0),
    ]
    batch2 = [
        # newer click for user 1 overrides; new user 3 inserts
        Row(user_id=1, event_type="click", ts=t0 + dt.timedelta(hours=1), value=9.0),
        Row(user_id=3, event_type="view", ts=t0, value=4.0),
    ]
    src = tmp_path / "src"
    src.mkdir()
    schema = None
    for i, rows in enumerate([batch1, batch2]):
        df = spark.createDataFrame(rows)
        schema = df.schema
        df.coalesce(1).write.parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    table_path = tmp_path / "stage"
    stream_upsert_to_table(
        stream,
        table_path,
        keys=["user_id", "event_type"],
        order_by=["ts"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    got = {
        (r.user_id, r.event_type): r.value
        for r in ManagedTable(spark, table_path).read().collect()
    }
    want_df = latest_record_dedup(
        spark.createDataFrame(batch1 + batch2),
        ["user_id", "event_type"],
        ["ts"],
    )
    want = {
        (r.user_id, r.event_type): r.value for r in want_df.collect()
    }
    assert got == want
    assert got[(1, "click")] == 9.0
