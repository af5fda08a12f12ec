"""Streaming corpus statistics: a JSONL document drop (the
training-data landing format, sources/jsonl.py) consumed as a file
stream, aggregated into running per-(lang, source) corpus stats.

This is the monitoring half of a streaming ingest: while
``streaming/sink.py`` upserts documents into the stage zone,
this topology keeps corpus composition (doc counts, token volume)
continuously current — the numbers the mixture/temperature rebalancer
(queries.py:temperature_mixture_docs) consumes.

Complete-output aggregation state here is |lang|x|source|-sized (tiny,
bounded by catalog cardinality, NOT corpus-sized), so complete mode is
safe at any corpus scale — the state is the report itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.functions.text import token_count

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_jsonl_documents(
    spark: SparkSession,
    source_dir: str,
    schema: str = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """File-source stream over a JSONL drop directory (gzip ok).
    Schema is explicit — streaming reads do not infer, and inference
    would widen integral ids anyway (see sources/jsonl.py).
    ``mode`` defaults to FAILFAST for the same reason as the batch
    reader: a corrupt shard line under PERMISSIVE silently feeds an
    all-NULL document into every running aggregate, and a streaming
    sink can't un-count it. Like the batch twin, mode="PERMISSIVE" is
    the explicit opt-in for triaging a damaged drop directory (the
    API symmetry is deliberate — both readers, one contract)."""
    reader = spark.readStream.schema(schema).option("mode", mode)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return reader.json(source_dir)


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Running per-(lang, source) composition: document count, token
    volume (whitespace tokens of the normalized text — the same
    tokenizer every batch operator uses), character volume."""
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


def run_complete_overwrite(
    result: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain all available input; each micro-batch overwrites
    ``out_dir`` with the FULL updated aggregate (complete mode), so
    after the drain the directory holds the final totals. Overwrite-
    per-batch is idempotent under foreachBatch's at-least-once
    delivery — a replayed batch rewrites the same state."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        result.writeStream.outputMode("complete")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
