from cdk_datalake_ingest_spark.operators.dedup import (
    exact_dedup,
    latest_record_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from cdk_datalake_ingest_spark.operators.merge import merge_dataframes
from cdk_datalake_ingest_spark.operators.table import ManagedTable

__all__ = [
    "latest_record_dedup",
    "exact_dedup",
    "minhash_near_dup_pairs",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "merge_dataframes",
    "ManagedTable",
]
