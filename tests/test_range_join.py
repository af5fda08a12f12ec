"""Range (interval containment) join operator (operators/range_join.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.range_join import range_join


def _frames(spark):
    points = spark.createDataFrame(
        [
            Row(k=1, ts=100, pv="a"),
            Row(k=1, ts=250, pv="b"),
            Row(k=1, ts=999, pv="c"),  # inside no interval
            Row(k=2, ts=100, pv="d"),  # key with no intervals
            Row(k=1, ts=300, pv="e"),  # exactly on an interval end
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(k=1, lo=50, hi=150, iv="w1"),
            Row(k=1, lo=90, hi=300, iv="w2"),  # overlaps w1 -> ts=100 in both
            Row(k=3, lo=0, hi=1000, iv="w3"),  # key absent from points
        ]
    )
    return points, intervals


def _pairs(df):
    return {(r.k, r.ts, r.iv) for r in df.collect()}


def test_matches_naive_inequality_join(spark):
    points, intervals = _frames(spark)
    naive = points.join(
        intervals,
        (points.k == intervals.k)
        & points.ts.between(intervals.lo, intervals.hi),
    ).select(points.k, points.ts, intervals.iv)
    for width in (10, 100, 1000, 10_000):  # invariant across bucket widths
        got = range_join(
            points, intervals, "ts", "lo", "hi", on=["k"], bucket_width=width
        )
        assert _pairs(got) == _pairs(naive), f"width={width}"


def test_closed_bounds_and_multi_overlap(spark):
    points, intervals = _frames(spark)
    got = _pairs(range_join(points, intervals, "ts", "lo", "hi", on=["k"]))
    assert (1, 100, "w1") in got and (1, 100, "w2") in got  # point in 2 windows
    assert (1, 300, "w2") in got  # hi bound inclusive
    assert not any(ts == 999 for (_, ts, _) in got)
    assert not any(k == 2 for (k, _, _) in got)


def test_left_join_keeps_unmatched_points(spark):
    points, intervals = _frames(spark)
    got = range_join(points, intervals, "ts", "lo", "hi", on=["k"], how="left")
    rows = {(r.k, r.ts, r.iv) for r in got.collect()}
    assert (1, 999, None) in rows and (2, 100, None) in rows
    assert (1, 100, "w1") in rows
    # every point appears at least once
    assert {(r.k, r.ts) for r in got.collect()} == {
        (r.k, r.ts) for r in points.collect()
    }


def test_no_nested_loop_in_plan(spark):
    """The whole point of the operator: the physical plan must be an
    equi-join on (keys, bucket), never BroadcastNestedLoop/Cartesian."""
    points, intervals = _frames(spark)
    plan = (
        range_join(points, intervals, "ts", "lo", "hi", on=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_column_collision_suffix(spark):
    points = spark.createDataFrame([Row(k=1, ts=5, tag="p")])
    intervals = spark.createDataFrame([Row(k=1, lo=0, hi=10, tag="i")])
    r = range_join(points, intervals, "ts", "lo", "hi", on=["k"]).first()
    assert r.tag == "p" and r.tag_right == "i"


def test_rejects_bad_args(spark):
    points, intervals = _frames(spark)
    with pytest.raises(ValueError):
        range_join(points, intervals, "ts", "lo", "hi", how="full")
    with pytest.raises(ValueError):
        range_join(points, intervals, "ts", "lo", "hi", bucket_width=0)


def test_left_join_stable_with_shuffled_lineage(spark):
    """Round-2 review regression: the row-id anchoring the left
    recovery must survive recomputation when the points input carries a
    shuffle (its within-partition order is not deterministic per
    evaluation). The operator materializes the id once; every point —
    including duplicates and NULL-bearing rows — must appear exactly
    once per match (or once null-padded)."""
    from pyspark.sql import functions as F

    base = spark.range(0, 2000).select(
        (F.col("id") % 40).alias("k"),
        (F.col("id") % 97).alias("ts"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("tag"),
    )
    # shuffle in the lineage: aggregate then re-expand
    points = (
        base.groupBy("k", "ts")
        .agg(F.count("tag").alias("tag"))
        .repartition(16)
    )
    intervals = spark.createDataFrame(
        [Row(k=int(k), lo=10, hi=30) for k in range(40)]
    )
    out = range_join(points, intervals, "ts", "lo", "hi", on=["k"], how="left")
    n_points = points.count()
    # every point appears exactly once (each matches <=1 interval here)
    assert out.count() == n_points
    assert out.filter(F.col("lo").isNull()).count() == points.filter(
        ~F.col("ts").between(10, 30)
    ).count()


def test_negative_timestamps(spark):
    """floor() bucketing must be correct across zero (cast-truncation
    would put -5 and +5 in the same bucket at width 10)."""
    points = spark.createDataFrame([Row(ts=-5), Row(ts=5), Row(ts=-15)])
    intervals = spark.createDataFrame([Row(lo=-10, hi=0, iv="neg")])
    got = {(r.ts, r.iv) for r in range_join(points, intervals, "ts", "lo", "hi", bucket_width=10).collect()}
    assert got == {(-5, "neg")}


def test_refuses_runaway_interval_spans(spark):
    """One corrupt interval end (year-9999 in microseconds) would
    explode into a ~70M-element bucket array in one row and OOM the
    stage; the span guard refuses it with the offending interval
    instead (gap-fill contract: corruption stops the job). A NULL
    start/end interval is silently dropped by the same explode — the
    equi-join NULL-key semantics."""
    points, intervals = _frames(spark)
    bad = intervals.union(
        spark.createDataFrame(
            [Row(k=1, lo=0, hi=253_402_300_800_000_000, iv="corrupt")]
        )
    )
    with pytest.raises(Exception, match="interval spans > "):
        range_join(
            points, bad, "ts", "lo", "hi", on=["k"], bucket_width=3600
        ).collect()
    null_iv = intervals.union(
        spark.createDataFrame(
            [(1, None, None, "nullrow")],
            "k long, lo long, hi long, iv string",
        )
    )
    out = range_join(
        points, null_iv, "ts", "lo", "hi", on=["k"], bucket_width=100
    )
    assert {r.iv for r in out.collect()} == {"w1", "w2"}


def test_refuses_runaway_inverted_interval(spark):
    """The guard must bound the span in BOTH directions: sequence(b0,
    b1) with b0 > b1 generates a DESCENDING array, so a corrupt START
    (or swapped bounds) would bypass a signed bound and materialize
    the same runaway array the guard exists to prevent (review catch
    on the first draft). Small inverted intervals remain allowed."""
    points, intervals = _frames(spark)
    bad = intervals.union(
        spark.createDataFrame(
            [Row(k=1, lo=253_402_300_800_000_000, hi=0, iv="swapped")]
        )
    )
    with pytest.raises(Exception, match="interval spans > "):
        range_join(
            points, bad, "ts", "lo", "hi", on=["k"], bucket_width=3600
        ).collect()
