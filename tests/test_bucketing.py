"""Bucketed tables produce shuffle-free co-located joins."""

from __future__ import annotations

from pyspark.sql import Row

from cdk_datalake_ingest_spark.operators.bucketing import (
    is_shuffle_free_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.createDataFrame(
        [Row(k=i % 50, v=i) for i in range(2000)]
    )
    right = spark.createDataFrame(
        [Row(k=i % 50, name=f"n{i}") for i in range(500)]
    )
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    write_bucketed(
        left, "bkt_left", ["k"], num_buckets=8,
        sort_cols=["k"], path=str(tmp_path / "l"),
    )
    write_bucketed(
        right, "bkt_right", ["k"], num_buckets=8,
        sort_cols=["k"], path=str(tmp_path / "r"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # co-located: no Exchange anywhere in the physical plan
        assert is_shuffle_free_join(spark, "bkt_left", "bkt_right", ["k"])
        # and the result is correct
        n = (
            spark.table("bkt_left")
            .join(spark.table("bkt_right"), on=["k"])
            .count()
        )
        assert n == 2000 * 10  # each left row matches 500/50 right rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
