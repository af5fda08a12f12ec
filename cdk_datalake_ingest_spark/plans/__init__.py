from cdk_datalake_ingest_spark.plans.pipeline import StagePipeline, TransformResult
from cdk_datalake_ingest_spark.plans.planner import RunLog, RunPlanner

__all__ = ["StagePipeline", "TransformResult", "RunPlanner", "RunLog"]
