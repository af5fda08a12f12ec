"""Raw-SQL entry point over the fixture catalog.

The reference's consumers ultimately speak SQL (Athena over the Glue
catalog its crawlers/registrations feed — aje-cdk-libs table stacks);
this module is the equivalent surface here: register the lake's tables
as views and hand the text to Spark SQL, so a user can run the same
ANSI query against this engine and against DuckDB/Athena unchanged.

``run_sql`` is the programmatic path; ``ManagedTable.register`` (C2)
covers catalog-persisted tables — this covers ad-hoc federation over
the raw parquet zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each parquet table under ``sf_dir`` as a temp view
    (create-or-replace, so repeated registration against different
    sf_dirs is safe). Returns the registered names."""
    names = list(tables) if tables is not None else TABLES
    for t in names:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI SQL string against the registered fixture tables.
    The plan goes through the same Catalyst pipeline as the DataFrame
    API — pushdown/pruning/broadcast decisions are identical, so
    everything tests/test_plans.py pins for DataFrame queries holds
    for the SQL surface too."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
