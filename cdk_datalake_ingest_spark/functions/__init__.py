from cdk_datalake_ingest_spark.functions import similarity, text

__all__ = ["text", "similarity"]
