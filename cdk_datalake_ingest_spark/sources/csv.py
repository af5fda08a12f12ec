"""Raw-zone CSV sources/sinks (S1/S2/S6/S7/S8).

The reference's raw zone is gzip CSV with header, read schema-less so
every column is StringType (aje-stage-dms-load.py:377 — deliberately no
inferSchema: stage casts are declared per column). Identical here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_raw_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    compression: str = "gzip",
) -> DataFrame:
    """S1: gzip-CSV scan with header, all columns string."""
    return (
        spark.read.format("csv")
        .option("compression", compression)
        .option("header", header)
        .load(path)
    )


def write_raw_csv(
    df: DataFrame,
    path: str,
    mode: str = "append",
    header: bool = True,
    compression: str = "gzip",
) -> None:
    """S7/S8: gzip-CSV sink. ``mode='append'`` is the multi-slice
    union-at-storage the reference's extraction threads rely on."""
    df.write.mode(mode).option("header", header).csv(path, compression=compression)


def empty_relation(spark: SparkSession, schema: StructType | str = None) -> DataFrame:
    """S6: empty-relation fallback when a landing read fails
    (extract_salesforce_to_raw.py:117)."""
    return spark.createDataFrame([], schema=schema or StructType([]))
