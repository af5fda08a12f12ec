"""Engine-portable deterministic hashing helpers.

Spark's ``hash()`` (Murmur3) and DuckDB's ``hash()`` are different
functions, so any sampling/splitting decision made with them cannot be
reproduced across engines. md5 is bit-identical everywhere; the first
8 hex chars give 32 uniform bits — plenty for percent-style bucketing.

One definition, two renderings (Column + SQL snippet), used by the
dataset-split and stratified-sampling operators (queries.py) so a
change to the idiom cannot drift between a query and its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket(col: Column, buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, buckets): md5 of the value's
    string form, first 8 hex chars as an integer, mod buckets. A
    stateless map — rerunning any subset of partitions (or the whole
    job on another engine) yields identical assignments."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def md5_bucket_sql(col_sql: str, buckets: int = 100) -> str:
    """The DuckDB rendering of :func:`md5_bucket` (same bits)."""
    return f"('0x' || substr(md5({col_sql}::VARCHAR), 1, 8))::BIGINT % {buckets}"
