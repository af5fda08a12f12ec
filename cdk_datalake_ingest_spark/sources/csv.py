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
    """S1: gzip-CSV scan with header, all columns string.

    ``multiLine`` is ON: the writer quotes embedded newlines, but
    Spark's default reader splits records on raw newlines REGARDLESS
    of quoting — a newline-bearing VARCHAR (normal in DMS-extracted
    database text columns) silently became a corrupt extra row
    (verified: 6 rows written, 7 read). multiLine costs per-file
    parallelism, which gzip (unsplittable, the raw-zone format) has
    already given up — write_raw_csv's many-slices convention is the
    parallelism story.

    Documented canonicalization, NOT a bug: the hop maps '' -> NULL.
    CSV cannot portably carry the distinction (Spark's reader maps
    both the bare and the quoted empty field to nullValue), and the
    reference's primary source dialect (Oracle) already erases it
    source-side ('' IS NULL). Pinned in tests/test_sources_catalog.py.
    """
    return (
        spark.read.format("csv")
        .option("compression", compression)
        .option("header", header)
        .option("multiLine", True)
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
    union-at-storage the reference's extraction threads rely on.

    Whitespace trimming is OFF: Spark's CSV WRITER trims leading and
    trailing whitespace by default (ignore*WhiteSpace default true on
    write), so 'trail ' silently became 'trail' through the raw zone —
    byte loss in a hop whose whole contract is losslessness (verified
    against the written bytes; the reader side defaults to no
    trimming)."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path, compression=compression)
    )


def empty_relation(spark: SparkSession, schema: StructType | str = None) -> DataFrame:
    """S6: empty-relation fallback when a landing read fails
    (extract_salesforce_to_raw.py:117)."""
    return spark.createDataFrame([], schema=schema or StructType([]))
