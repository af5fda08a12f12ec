"""Column-transform DSL: parser + native-Column compiler.

Replaces the reference's two divergent string-scanning interpreters
(aje-stage-dms-load.py:102-137 innermost-first, transform_light.py:282-292
recursive) with one recursive-descent parser producing an AST that the
compiler folds into pure `pyspark.sql.functions` Column expressions —
no Python UDFs, so every transform stays inside Catalyst/whole-stage
codegen.
"""

from cdk_datalake_ingest_spark.dsl.compiler import (
    BIGMAGIC,
    SALESFORCE,
    Dialect,
    TransformError,
    UnknownTransformError,
    compile_transformation,
)
from cdk_datalake_ingest_spark.dsl.parser import FuncCall, Raw, parse_transformation

__all__ = [
    "parse_transformation",
    "FuncCall",
    "Raw",
    "compile_transformation",
    "Dialect",
    "BIGMAGIC",
    "SALESFORCE",
    "TransformError",
    "UnknownTransformError",
]
