"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship stage-pipeline query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry
(cdk_datalake_ingest_spark/queries.py) — one entry per implemented
operator from SURVEY.md §2 plus the LLM-pipeline extensions, each with
a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdk_datalake_ingest_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["stage_pipeline_lineitem"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
