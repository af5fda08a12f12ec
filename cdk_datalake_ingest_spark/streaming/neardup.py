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
    MINHASH_PRIME,
    _minhash_banded,
    pairs_from_signatures,
    probe_signatures,
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
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingest step as pure batch logic (unit-testable without a
    stream): ``(survivors, surv_bands, surv_sets)`` — the batch rows
    kept per the module survivor rule plus their signature relations,
    ready to append to the index tables. ``sig_params`` (shingle_size/
    num_hashes/bands/seed/prime) must match the index's build
    parameters — they define the probe space.

    The batch is shingled exactly ONCE: all three consumers (the
    within-batch pair join, the index probe, the appended signatures)
    derive from one shared, persisted ``_minhash_banded`` stage — the
    r12 restructure that took the gate from ~22 s to ~<10 s at sf0.1
    (the naive composition re-shingled per consumer). The survivor ID
    set is pinned (localCheckpoint — ids only, tiny) so every returned
    relation agrees and none re-probes the index after the caller
    mutates it (the appends-then-lazy-re-read divergence)."""
    banded, sets = _minhash_banded(
        batch_df,
        id_col,
        text_col,
        sig_params.get("shingle_size", 3),
        sig_params.get("num_hashes", 32),
        sig_params.get("bands", 8),
        sig_params.get("seed", 42),
        sig_params.get("prime", MINHASH_PRIME),
        cache=sig_params.get("cache", True),
    )
    # (a) within-batch domination: every id_b of a within-batch pair
    # has a smaller near-dup id_a (the pair tail emits id_a < id_b)
    batch_pairs = pairs_from_signatures(
        banded, sets, id_col, jaccard_threshold
    )
    dominated = batch_pairs.select(F.col("id_b").alias(id_col)).distinct()
    # PIN the undominated id set (ids only — tiny): it feeds THREE
    # consumers (the probe's bands + sets semi-joins and the survivor
    # anti-join), and without the pin each consumer re-executes the
    # whole pair self-join + exact-verify pipeline — profiled at ~3x
    # the drain's compute before this checkpoint landed.
    und_ids = (
        batch_df.select(id_col)
        .join(dominated, id_col, "left_anti")
        .localCheckpoint(eager=True)
    )
    # (b) probe the persisted index with the undominated remainder only
    # (same survivor set, strictly less probe work) — signatures come
    # from the SHARED stage via an id semi-join, never a re-shingle
    und_bands = banded.join(und_ids, id_col, "left_semi")
    und_sets = sets.join(und_ids, id_col, "left_semi")
    index_hits = probe_signatures(
        und_bands, und_sets, index_bands, index_sets, id_col,
        jaccard_threshold,
    )
    dup_new = index_hits.select(F.col("new_id").alias(id_col)).distinct()
    surv_ids = und_ids.join(dup_new, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    survivors = batch_df.join(surv_ids, id_col, "left_semi")
    surv_bands = banded.join(surv_ids, id_col, "left_semi")
    surv_sets = sets.join(surv_ids, id_col, "left_semi")
    return survivors, surv_bands, surv_sets


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
    shuffle_partitions: int | None = None,
    **sig_params,
) -> None:
    """Drain ``source_stream`` (availableNow) through the ingest loop:
    per micro-batch, dedup against the index tables AS THEY EXIST,
    append survivors (tagged with ``ingest_batch`` = the micro-batch
    id) to ``out_dir`` and their signatures to the index dirs. The
    index starts empty; batch 0's probe sees zero rows and only the
    within-batch rule applies — no special-casing.

    ``shuffle_partitions`` sizes the foreachBatch joins (latched into
    the stream's cloned session at start, caller conf restored
    immediately — the run_complete_overwrite pattern): a micro-batch
    is bounded by maxFilesPerTrigger, so its pair/probe joins shuffle
    batch-sized relations and want batch-sized parallelism, not the
    session default. There is no state store here (state = the index
    tables), so unlike a stateful query the number is NOT pinned by
    the checkpoint — restarts may resize freely."""

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
        # no batch_df checkpoint: the file-source batch relation is a
        # column-pruned parquet scan whose three consumers share the
        # PERSISTED signature stage inside ingest_batch — an eager
        # checkpoint here costs a full extra job + memory per batch
        # for re-reads that are already cheap.
        # Block-lifecycle note: each batch persists the signature stage
        # and localCheckpoints two id sets; relying on the GC-driven
        # ContextCleaner lets blocks from EVERY batch pile up in the
        # executor heap for the whole drain (measured: a 3-batch drain
        # left enough residue to slow unrelated memory-hungry queries
        # ~1.5x in the same JVM). Snapshot the persistent-RDD ids
        # before the batch and drop exactly the NEW ones when done —
        # by then all writes are on disk and the next batch re-reads
        # from the tables, so nothing re-references the blocks.
        # Caveat: assumes no CONCURRENT jobs persist RDDs mid-batch
        # (true for this loop; a shared-session deployment should
        # disable cleanup and size the heap instead).
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        before = {int(i) for i in jmap.keySet().toArray()}
        bands = _read_or_empty(bands_dir, _BANDS_SCHEMA)
        sets = _read_or_empty(sets_dir, _SETS_SCHEMA)
        # ingest_batch pins the survivor ID set internally, so all
        # three relations below agree and none re-probes the index
        # after the appends mutate it.
        survivors, new_bands, new_sets = ingest_batch(
            batch_df,
            bands,
            sets,
            id_col,
            text_col,
            jaccard_threshold,
            **sig_params,
        )
        survivors.withColumn(
            "ingest_batch", F.lit(batch_id).cast("int")
        ).write.mode("append").parquet(out_dir)
        new_bands.write.mode("append").parquet(bands_dir)
        new_sets.write.mode("append").parquet(sets_dir)
        jmap2 = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap2.keySet().toArray()):
            if int(rid) not in before:
                jmap2.get(rid).unpersist(False)

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    try:
        q = (
            source_stream.writeStream.outputMode("append")
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
    q.awaitTermination()
