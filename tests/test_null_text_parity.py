"""NULL/degenerate-text parity sweep (round 11).

The driver fixtures contain no NULL-text documents, so every
gate's NULL-text behavior was a latent Spark-vs-DuckDB divergence
waiting for the first real corpus with missing text (the r10 ADVICE
caught exactly one instance, in BPE_TOKENIZE_SQL). This test builds a
doctored documents table — real sf0.001 rows PLUS NULL text, empty
text, whitespace-only, punctuation-only, and single-token edge rows —
and runs 24 text/dedup/sampling gates against their OWN registered
oracles on that data, with the same comparator the local parity
harness uses.

Round-11 catches (fixed, then pinned here): the engine-wide legacy
size(NULL) = -1 vs the oracle's NULL; pack_sequences silently
DROPPING NULL-lang docs through a name-list offsets join; the
scrub/substring oracles coalescing NULL text to '' against the
operators' NULL propagation.

What it pins: the engine-wide ``spark.sql.legacy.sizeOfNull=false``
choice (size(NULL) = NULL, matching DuckDB's len(NULL) — without it
``token_count`` of a NULL text read -1 while the oracle read NULL),
and that every covered gate either propagates NULL identically on
both sides or normalizes it identically on both sides.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SRC = "/root/testdata/sf0.001"

#: text-family gates whose inputs are documents-only and whose oracle
#: is registered — one per distinct NULL-handling code path
GATES = [
    "text_metrics_docs",
    "token_stats_docs",
    "lang_id_docs",
    "fingerprint_docs",
    "vocab_top_tokens",
    "exact_dedup_docs",
    "repetition_docs",
    "unigram_lm_docs",
    "gopher_rules_docs",
    "bpe_train_merges_docs",
    "bpe_tokenize_docs",
    "dataset_split_docs",
    "pii_scrub_docs",
    # dedup / scrub family: degenerate docs are exactly the inputs the
    # r10 hardening was about (content-less SimHash cliques, empty-doc
    # shingle guards) — keep them pinned against the oracles too
    "minhash_near_dup_docs",
    "simhash_near_dup_docs",
    "substring_dedup_docs",
    "scrub_boilerplate_docs",
    "boilerplate_ngrams_docs",
    "decontaminate_docs",
    "chunk_docs_sliding",
    # sampling / packing: md5-bucket and token-budget paths over
    # NULL/empty text
    "temperature_mixture_docs",
    "stratified_sample_docs",
    "pack_sequences_docs",
    # round-11 session-2 extension: the remaining document-family
    # gates (featurizer/quality/curation/multimodal). This extension
    # CAUGHT three divergences, now pinned: hash_embed's NULL text ->
    # ZERO vector contract (oracle read NULL toks), the same silent
    # NULL-vector drop shifting every kmeans_train_hash centroid, and
    # the multimodal inner join dropping the NULL-content media item
    # whose row survives the decode stage with empty-payload features
    # and the sniffer's octet-stream fallback.
    "tfidf_top_terms_docs",
    "perplexity_buckets_docs",
    "nb_quality_filter_docs",
    "curate_documents",
    "hash_embed_docs",
    "kmeans_train_hash_docs",
    "ngram_jaccard_docs",
    "semantic_dedup_hash_docs",
    "multimodal_media_pipeline",
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory, spark):
    """An sf-dir whose documents table carries degenerate text rows;
    the other nine tables are the untouched sf0.001 parquet files."""
    d = tmp_path_factory.mktemp("edge_sf")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    docs = spark.read.parquet(f"{SF_SRC}/documents.parquet").limit(80)
    extra = spark.createDataFrame(
        [
            (100001, None, "en", "edge", 0),
            (100002, "", "en", "edge", 0),
            (100003, "   ", "en", "edge", 3),
            (100004, "?!,.;:", "en", "edge", 6),
            (100005, "word", "en", "edge", 4),
            (100006, "the the the", None, "edge", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staged = d / "_docs_staged"
    docs.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        str(staged)
    )
    # single FILE (not a Spark part-directory): the oracle harness
    # registers '<dir>/documents.parquet' as one parquet file
    part = next(staged.glob("part-*.parquet"))
    shutil.copy(part, d / "documents.parquet")
    shutil.rmtree(staged)
    return str(d)


def test_text_gates_match_oracles_on_degenerate_text(spark, edge_sf_dir):
    from check_parity import compare, duck_conn

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duck_conn(edge_sf_dir)
    failed = {}
    for name in GATES:
        sdf = qs[name](spark, edge_sf_dir).toPandas()
        ddf = con.execute(oracles[name]).df()
        problems = compare(name, sdf, ddf)
        if problems:
            failed[name] = problems
    assert not failed, failed
