"""Feature-hashing document embeddings (the "hashing trick",
Weinberger et al. 2009): each token is md5-bucketed into one of
``dim`` slots; the document vector is the (optionally L2-normalized)
bucket-count histogram.

This closes the documents -> embeddings gap in the training pipeline
with a model-free, deterministic featurizer: the output feeds the same
semantic operators (k-means, SemDeDup, ANN) as pretrained embeddings,
and — unlike a neural encoder — is exactly reproducible in the DuckDB
oracle, so the whole documents->vectors->clustering chain stays under
the hash-equality gate.

Scale: a pure per-row fold (O(tokens * dim) arithmetic per document,
zero shuffle) that pipelines with the scan — the cheapest possible
embedding pass at 100 TB. md5 bucketing (functions/hashing.py) keeps
assignments engine-portable where Spark's Murmur3 ``hash()`` would
not be.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.functions.hashing import md5_bucket
from cdk_datalake_ingest_spark.functions.text import tokens


def hash_embed_counts(text_col: Column, dim: int = 64) -> Column:
    """array<double> of per-bucket token counts (the raw histogram —
    integral values, exact in both engines). NULL text embeds like
    empty text (all-zero histogram, never a NULL vector — downstream
    clustering would silently drop NULL rows)."""
    buckets = F.transform(
        tokens(F.coalesce(text_col, F.lit(""))),
        lambda t: md5_bucket(t, dim),
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    return F.aggregate(
        buckets,
        zero,
        lambda acc, b: F.transform(
            acc,
            lambda x, i: F.when(i.cast("bigint") == b, x + 1.0).otherwise(
                x
            ),
        ),
    )


def hash_embed(text_col: Column, dim: int = 64) -> Column:
    """L2-normalized hashing-trick embedding (all-zero for empty
    documents rather than NULL, so downstream cosine math sees a
    well-typed vector).

    The divide is a zip_with against ``array_repeat(nrm, dim)`` — NOT
    ``transform(counts, x -> x / nrm)``: an outer expression captured
    in a higher-order-function lambda is re-evaluated per element
    (same pitfall as operators/dedup.py:word_shingles), and ``nrm``
    embeds the whole O(tokens*dim) counting fold — the capture form
    measured 9x the entire featurize cost at sf0.1."""
    counts = hash_embed_counts(text_col, dim)
    nrm = F.sqrt(
        F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * x)
    )
    return F.when(nrm == 0.0, counts).otherwise(
        F.zip_with(
            counts, F.array_repeat(nrm, dim), lambda x, n: x / n
        )
    )
