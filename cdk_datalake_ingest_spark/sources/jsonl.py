"""JSONL (newline-delimited JSON) source/sink — the training-data
delivery format (HF datasets, WebDataset text shards, most LLM data
releases ship as gzipped JSONL).

Spark's native json reader/writer does the heavy lifting (JVM-side,
splittable when uncompressed, per-file parallel when gzipped — same
trade-off as the raw CSV zone). The helpers pin the lakehouse
conventions: schema-explicit reads (inference costs an extra full
pass and infers doubles for integral ids), deterministic shard count,
gzip by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    shards: int | None = None,
) -> None:
    """Write as JSONL; ``shards`` repartitions for a deterministic
    output-file count (training jobs address shards by index)."""
    out = df.repartition(shards) if shards else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Read JSONL; pass the schema (DDL string ok) — inference is a
    second full scan and widens integral ids to doubles, both wrong at
    100 TB.

    ``mode`` defaults to FAILFAST: under Spark's default PERMISSIVE
    mode a corrupt shard line silently becomes an ALL-NULL row
    (verified) — a poisoned corpus row per corrupt line with zero
    signal, in the format whose whole job is delivering training
    data. Corruption stops the job (the engine's refusal convention);
    pass mode="PERMISSIVE" (ideally with a corrupt-record column in
    the schema) to triage a damaged delivery instead."""
    r = spark.read.option("mode", mode)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
