"""cdk_datalake_ingest_spark — a PySpark-native analytics/ingestion engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference metadata-driven ELT platform (MR34Z1r0/cdk-datalake-ingest):
three-zone lake (raw CSV -> stage columnar), a column-transform DSL,
watermark-driven incremental loads, window-function deduplication and
MERGE upserts — plus large-scale training-data-pipeline extensions
(exact/MinHash/SimHash dedup, embedding similarity search, text
analysis, multimodal column plumbing).

Everything dataflow-shaped compiles to declarative DataFrame operations
so Catalyst/Tungsten/AQE choose the physical plan; there are no
row-at-a-time Python UDFs in any hot path.
"""

from cdk_datalake_ingest_spark.session import get_spark
from cdk_datalake_ingest_spark.specs import ColumnSpec, EndpointSpec, TableSpec

__all__ = ["get_spark", "TableSpec", "ColumnSpec", "EndpointSpec"]

__version__ = "0.1.0"
