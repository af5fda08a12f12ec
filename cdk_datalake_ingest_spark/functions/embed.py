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

Scale: tokenization and md5 bucketing stay JVM-side (O(tokens) native
Column work that pipelines with the scan); the bucket->histogram
assembly is ONE Arrow-batched ``pandas_udf`` running a vectorized
numpy bincount over the whole batch. This is a deliberate exception
to the no-Python-hot-path rule (same contract as SimHash's popcount,
operators/dedup.py): Catalyst arrays are immutable, so a pure-
expression histogram is an O(tokens * dim) fold — measured ~9x the
cost of the Arrow bincount at sf0.1 and the dominant term of the
raw-text semantic-dedup chain. The UDF stays zero-shuffle: a pure
map stage, no Exchange anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cdk_datalake_ingest_spark.functions.hashing import md5_bucket
from cdk_datalake_ingest_spark.functions.text import tokens

#: one compiled UDF per dim — pandas_udf registration is not free and
#: every caller in a process shares the same (dim-closed) kernel
_BINCOUNT_UDFS: dict[int, Column] = {}


def _bincount_udf(dim: int):
    """Arrow kernel: Series of int bucket-lists -> Series of dim-wide
    double histograms. Vectorized across the batch: all rows' buckets
    are flattened into one array and counted with a single
    ``np.bincount`` over ``row_index * dim + bucket`` — no per-row
    Python beyond the list-length scan."""
    if dim not in _BINCOUNT_UDFS:

        @pandas_udf("array<double>")
        def _bincount(buckets: pd.Series) -> pd.Series:
            rows = buckets.tolist()
            n = len(rows)
            lens = np.fromiter(
                (0 if r is None else len(r) for r in rows),
                dtype=np.int64,
                count=n,
            )
            if int(lens.sum()) == 0:
                hist = np.zeros((n, dim), dtype=np.float64)
            else:
                flat = np.concatenate(
                    [np.asarray(r, dtype=np.int64) for r in rows if r is not None and len(r)]
                )
                row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
                hist = (
                    np.bincount(row_idx * dim + flat, minlength=n * dim)
                    .reshape(n, dim)
                    .astype(np.float64)
                )
            return pd.Series(list(hist))

        _BINCOUNT_UDFS[dim] = _bincount
    return _BINCOUNT_UDFS[dim]


def hash_embed_counts(text_col: Column, dim: int = 64) -> Column:
    """array<double> of per-bucket token counts (the raw histogram —
    integral values, exact in both engines). NULL text embeds like
    empty text (all-zero histogram, never a NULL vector — downstream
    clustering would silently drop NULL rows)."""
    buckets = F.transform(
        tokens(F.coalesce(text_col, F.lit(""))),
        lambda t: md5_bucket(t, dim),
    )
    return _bincount_udf(dim)(buckets)


def hash_embed(text_col: Column, dim: int = 64) -> Column:
    """L2-normalized hashing-trick embedding (all-zero for empty
    documents rather than NULL, so downstream cosine math sees a
    well-typed vector).

    The divide is a zip_with against ``array_repeat(nrm, dim)`` — NOT
    ``transform(counts, x -> x / nrm)``: an outer expression captured
    in a higher-order-function lambda is re-evaluated per element
    (same pitfall as operators/dedup.py:word_shingles), and ``nrm``
    embeds the whole counting histogram — the capture form measured
    9x the entire featurize cost at sf0.1. The counts are integral
    doubles, so the norm and division are bit-identical to the
    oracle's regardless of which engine assembled the histogram."""
    counts = hash_embed_counts(text_col, dim)
    nrm = F.sqrt(
        F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * x)
    )
    return F.when(nrm == 0.0, counts).otherwise(
        F.zip_with(
            counts, F.array_repeat(nrm, dim), lambda x, n: x / n
        )
    )
