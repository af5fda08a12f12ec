"""As-of join operator (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import Row

from cdk_datalake_ingest_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=100, lv="a"),
            Row(k=1, ts=250, lv="b"),
            Row(k=1, ts=50, lv="c"),   # before any right row
            Row(k=2, ts=100, lv="d"),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=100, rv=10.0),
            Row(k=1, ts=200, rv=20.0),
            Row(k=1, ts=300, rv=30.0),
        ]
    )
    return left, right


def test_asof_basic_and_ties_and_missing(spark):
    left, right = _frames(spark)
    got = {
        (r.k, r.ts): (r.ts_right, r.rv_right)
        for r in asof_join(left, right, on=["k"], ts_col="ts").collect()
    }
    assert got[(1, 100)] == (100, 10.0)  # tie: right.ts == left.ts matches
    assert got[(1, 250)] == (200, 20.0)  # newest at-or-before
    assert got[(1, 50)] == (None, None)  # nothing before
    assert got[(2, 100)] == (None, None)  # key absent from right


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        (r.k, r.ts): (r.ts_right, r.rv_right)
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", tolerance_us=40
        ).collect()
    }
    assert got[(1, 100)] == (100, 10.0)  # gap 0 <= 40
    assert got[(1, 250)] == (None, None)  # gap 50 > 40 -> dropped


def test_asof_null_payload_column_stays_atomic(spark):
    """A NULL in one right column must not be stitched with values from
    an older right row."""
    left = spark.createDataFrame([Row(k=1, ts=300)])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=100, a="old_a", b="old_b"),
            Row(k=1, ts=200, a=None, b="new_b"),
        ]
    )
    r = asof_join(left, right, on=["k"], ts_col="ts").first()
    assert r.ts_right == 200
    assert r.a_right is None  # NOT "old_a"
    assert r.b_right == "new_b"


def test_asof_left_row_count_preserved(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on=["k"], ts_col="ts").count() == left.count()
