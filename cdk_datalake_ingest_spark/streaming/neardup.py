"""Streaming near-duplicate dedup-on-ingest: the continuous-crawl
composition of the persisted MinHash signature index
(operators/dedup.py:minhash_signature_index) with a document stream.

The batch pieces already exist and are oracle-gated separately —
`minhash_near_dup_pairs` (within-corpus pairs), `minhash_signature_index`
(the persistable band/set tables), `incremental_near_dup` (batch probes
index without re-shingling the corpus). This module is the ingest LOOP a
crawl pipeline actually runs: each arriving micro-batch is deduped
against everything kept so far, its survivors land in the output zone,
and their signatures append to the index so the NEXT batch probes them
too. State lives in the index tables, not in Spark streaming state — the
topology is stateless per batch and restart-safe from the tables.

Survivor rule, stated precisely (deterministic and monotone — the
documented contract, chosen over greedy maximal-independent-set because
it is order-stable and exactly SQL-expressible without recursion):

  a document d of batch i is KEPT iff
    (a) no batch-i document with a SMALLER id is a near-dup of d
        (within-batch domination — by anyone earlier, regardless of
        whether that earlier document itself survives), AND
    (b) no document KEPT in batches < i is a near-dup of d
        (the index probe — only survivors' signatures ever enter the
        index).

Rule (a) can drop both members of a chain (e~d where e itself is
index-dropped still dominates d) — conservative for dedup: the kept set
never contains a near-duplicate pair; it may drop extra members of a dup
cluster. At 100 TB the per-batch cost is: shingle the batch once (never
the corpus), one broadcast-pinned candidate join against the band index
(incremental_near_dup's contract, batch size capped), one within-batch
banded self-join; index appends are survivor-sized.

Idempotency note: the gate runs availableNow with a fresh checkpoint and
plain parquet appends; a PRODUCTION deployment must make the foreachBatch
body idempotent under replay (the standard contract) — write survivors
and index appends through a transactional table keyed by batch_id
(ManagedTable/Delta MERGE on (batch_id, id)), not blind appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_datalake_ingest_spark.operators.dedup import (
    incremental_near_dup,
    minhash_near_dup_pairs,
    minhash_signature_index,
)

#: schema of the band-index table (minhash_signature_index bands_df)
_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ]
)
#: schema of the shingle-set table (sets_df)
_SETS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("__set", T.ArrayType(T.StringType())),
    ]
)


def ingest_batch(
    batch_df: DataFrame,
    index_bands: DataFrame,
    index_sets: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    **sig_params,
) -> DataFrame:
    """One ingest step as pure batch logic (unit-testable without a
    stream): the batch's SURVIVORS per the module survivor rule.
    ``sig_params`` (shingle_size/num_hashes/bands/seed/prime) must
    match the index's build parameters — they define the probe space.

    The result is lazy and its lineage reads the index relations —
    callers that mutate the index afterwards (the streaming loop) must
    pin the survivor set FIRST (localCheckpoint) or the deferred plan
    re-probes the grown index."""
    # (a) within-batch domination: every id_b of a within-batch pair
    # has a smaller near-dup id_a (the pair operator emits id_a < id_b)
    batch_pairs = minhash_near_dup_pairs(
        batch_df,
        id_col,
        text_col,
        jaccard_threshold=jaccard_threshold,
        **sig_params,
    )
    dominated = batch_pairs.select(F.col("id_b").alias(id_col)).distinct()
    undominated = batch_df.join(dominated, id_col, "left_anti")
    # (b) probe the persisted index with the undominated remainder only
    # (same survivor set, strictly less probe work)
    index_hits = incremental_near_dup(
        undominated,
        index_bands,
        index_sets,
        id_col,
        text_col,
        jaccard_threshold=jaccard_threshold,
        **sig_params,
    )
    dup_new = index_hits.select(F.col("new_id").alias(id_col)).distinct()
    return undominated.join(dup_new, id_col, "left_anti")


def stream_near_dup_ingest(
    spark: SparkSession,
    source_stream: DataFrame,
    out_dir: str,
    bands_dir: str,
    sets_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    **sig_params,
) -> None:
    """Drain ``source_stream`` (availableNow) through the ingest loop:
    per micro-batch, dedup against the index tables AS THEY EXIST,
    append survivors (tagged with ``ingest_batch`` = the micro-batch
    id) to ``out_dir`` and their signatures to the index dirs. The
    index starts empty; batch 0's probe sees zero rows and only the
    within-batch rule applies — no special-casing."""

    def _read_or_empty(path: str, schema: T.StructType) -> DataFrame:
        # existence probe, not try/except: the first batch's missing
        # index would otherwise log a loud py4j FileNotFound trace
        # inside the stream thread (caught but noisy). Local paths
        # only — an object-store deployment passes pre-created tables.
        import os

        if not os.path.exists(path):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(path)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # pin the batch (the file-source relation feeds three consumers)
        batch_df = batch_df.localCheckpoint(eager=True)
        bands = _read_or_empty(bands_dir, _BANDS_SCHEMA)
        sets = _read_or_empty(sets_dir, _SETS_SCHEMA)
        survivors = ingest_batch(
            batch_df,
            bands,
            sets,
            id_col,
            text_col,
            jaccard_threshold,
            **sig_params,
        )
        # FIX THE DECISION before anything mutates the index dirs the
        # survivor plan reads: localCheckpoint truncates the lineage so
        # the signature build and the three writes below all see the
        # same survivor set (a lazy plan would re-probe the GROWN index
        # on each re-execution and silently diverge bands from sets).
        survivors = survivors.localCheckpoint(eager=True)
        new_bands, new_sets = minhash_signature_index(
            survivors, id_col, text_col, **sig_params
        )
        survivors.withColumn(
            "ingest_batch", F.lit(batch_id).cast("int")
        ).write.mode("append").parquet(out_dir)
        new_bands.write.mode("append").parquet(bands_dir)
        new_sets.write.mode("append").parquet(sets_dir)

    q = (
        source_stream.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
