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

from cdk_datalake_ingest_spark.dsl.compiler import compile_transformation
from cdk_datalake_ingest_spark.operators.dedup import (
    exact_dedup,
    latest_record_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from cdk_datalake_ingest_spark.operators.merge import merge_dataframes
from cdk_datalake_ingest_spark.operators.sessionize import sessionize
from cdk_datalake_ingest_spark.operators.skew import salted_join
from cdk_datalake_ingest_spark.operators.table import ManagedTable
from cdk_datalake_ingest_spark.operators.watermark import WatermarkStore, max_watermark
from cdk_datalake_ingest_spark.plans.pipeline import StagePipeline, TransformResult
from cdk_datalake_ingest_spark.plans.planner import RunLog, RunPlanner
from cdk_datalake_ingest_spark.session import apply_runtime_conf, get_spark
from cdk_datalake_ingest_spark.specs import (
    ColumnSpec,
    ConfigCatalog,
    EndpointSpec,
    TableSpec,
)

__all__ = [
    "get_spark",
    "apply_runtime_conf",
    "TableSpec",
    "ColumnSpec",
    "EndpointSpec",
    "ConfigCatalog",
    "compile_transformation",
    "StagePipeline",
    "TransformResult",
    "ManagedTable",
    "merge_dataframes",
    "latest_record_dedup",
    "exact_dedup",
    "minhash_near_dup_pairs",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "WatermarkStore",
    "max_watermark",
    "RunLog",
    "RunPlanner",
    "sessionize",
    "salted_join",
]

__version__ = "0.1.0"
