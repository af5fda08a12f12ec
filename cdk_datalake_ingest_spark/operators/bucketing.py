"""Bucketed stage tables: co-located, shuffle-free joins.

The 100 TB lever the reference never had: persisting a table bucketed
(and optionally sorted) by its join key lets every later join/groupBy
on that key skip the shuffle entirely — Spark matches bucket spec to
the required hash distribution at plan time. The classic use here:
stage fact tables bucketed by the MERGE id columns, so the recurring
incremental merge joins bucket-to-bucket.

Bucketing metadata lives in the session catalog (saveAsTable), data in
plain parquet at ``path`` when given (external table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols``.

    ``num_buckets`` should match the downstream parallelism target —
    both sides of a co-located join must use the same count."""
    w = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def is_shuffle_free_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> bool:
    """True when joining the two bucketed tables on ``on`` produces a
    plan without any shuffle (Exchange) — the co-location check."""
    df = spark.table(left_table).join(spark.table(right_table), on=on)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
