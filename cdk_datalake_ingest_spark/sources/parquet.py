"""Parquet/fixture table loading, with nanosecond-timestamp handling.

The driver fixtures carry TIMESTAMP(NANOS) parquet columns (events.ts)
that Spark only reads via ``spark.sql.legacy.parquet.nanosAsLong`` —
they surface as bigint nanoseconds; ``*_us`` helper columns convert to
microseconds for interop with engines that truncate to us (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def events_with_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (bigint microseconds, floor of the ns
    value) — the deterministic cross-engine representation."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_us", F.expr("ts div 1000"))
