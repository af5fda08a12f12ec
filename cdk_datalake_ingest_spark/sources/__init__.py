from cdk_datalake_ingest_spark.sources.csv import (
    empty_relation,
    read_raw_csv,
    write_raw_csv,
)
from cdk_datalake_ingest_spark.sources.parquet import load_table, load_tables

__all__ = [
    "read_raw_csv",
    "write_raw_csv",
    "empty_relation",
    "load_table",
    "load_tables",
]
