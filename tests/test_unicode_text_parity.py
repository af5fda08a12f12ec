"""Unicode/multibyte text parity sweep (round 11) — sweep #4, the
non-ASCII twin of the NULL-text sweep.

The driver fixtures are ASCII-only English prose, so every text gate's
behavior on the text a real 100 TB web corpus is full of — CJK without
word boundaries, emoji/ZWJ sequences, combining accents vs precomposed
forms, locale-sensitive case pairs (Turkish İ, Greek final sigma,
German ß), NBSP/ideographic spaces, astral-plane code points, RTL
scripts, zero-width characters — was unverified against the oracles.
Case mapping is the classic cross-engine trap here: Spark's ``lower``
runs Java/ICU full-string case conversion while DuckDB's ``lower`` is
utf8proc per-code-point, and the two disagree on exactly the pairs
above (e.g. full-string lowercase of a word-final 'Σ' is 'ς', the
per-code-point map gives 'σ').

This builds a doctored documents table — real sf0.001 rows PLUS 15
Unicode edge rows — and runs the same 24 text/dedup/sampling gates as
the NULL sweep against their OWN registered oracles with the local
parity comparator.

What it pins: every covered gate's tokenization, normalization, case
mapping, hashing, and length semantics agree byte-for-byte between the
Spark operators and their DuckDB oracles on non-ASCII input — i.e. the
cross-engine contract holds for the text the fixtures never generate.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SRC = "/root/testdata/sf0.001"

# Same gate list as the NULL-text sweep: one entry per distinct
# text-handling code path with a registered oracle.
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
    "minhash_near_dup_docs",
    "simhash_near_dup_docs",
    "substring_dedup_docs",
    "scrub_boilerplate_docs",
    "boilerplate_ngrams_docs",
    "decontaminate_docs",
    "chunk_docs_sliding",
    "temperature_mixture_docs",
    "stratified_sample_docs",
    "pack_sequences_docs",
    # round-11 session-2 extension (same list as the NULL sweep): the
    # remaining document-family gates — all agreed on Unicode input
    # out of the box once the case/whitespace pins above landed
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

#: (doc_id, text, lang) — n_chars is derived as len(text) (code points,
#: the same count both engines' length() returns).
EDGE_ROWS = [
    # CJK with and without word boundaries (whitespace tokenizers see
    # one giant token; shingles/ngrams must agree on it byte-for-byte)
    (200001, "春眠不覚暁 処処聞啼鳥 夜来風雨声 花落知多少", "ja"),
    (200002, "春眠不覚暁処処聞啼鳥夜来風雨声花落知多少", "ja"),
    # emoji incl. ZWJ family sequence and regional-indicator flag
    (200003, "family 👨‍👩‍👧‍👦 rocket 🚀 flag 🇺🇳 ok", "en"),
    # combining accents vs precomposed: NFC/NFD must NOT be conflated
    # by either engine (no engine normalizes)
    (200004, "café mañana versus café mañana", "es"),
    # Turkish dotted/dotless i: lower('İ') is the locale trap
    (200005, "İstanbul ISPARTA ıhlamur iğne DİYARBAKIR", "tr"),
    # Greek final sigma: full-string lower('ΟΔΟΣ') = 'οδος' vs 'οδοσ'
    (200006, "ΟΔΥΣΣΕΥΣ ΚΑΙ Η ΟΔΟΣ οδός", "el"),
    # German sharp s, incl. capital ẞ (U+1E9E)
    (200007, "STRASSE straße GROSS ẞ WEIẞ", "de"),
    # NBSP (U+00A0) and ideographic space (U+3000): non-\s in BOTH
    # engines' ASCII-only regex \s — must stay inside tokens
    (200008, "foo bar　baz qux", "en"),
    # astral-plane (surrogate pairs in UTF-16, 4-byte UTF-8)
    (200009, "𝕊𝕡𝕒𝕣𝕜 𝔞𝔫𝔞𝔩𝔶𝔱𝔦𝔠𝔰 𝄞 clef", "en"),
    # RTL scripts, mixed direction
    (200010, "مرحبا بالعالم שלום עולם hello", "ar"),
    # Cyrillic with the ё/Ё pair (case map lives outside ASCII range)
    (200011, "Привет МИР мир ёЁ Ёлка", "ru"),
    # zero-width space / joiner / word-joiner inside a word
    (200012, "zero​width‍join⁠er word", "en"),
    # repeated emoji runs (repetition/ngram family over non-ASCII)
    (200013, "🌲🌲🌲🌲🌲🌲🌲🌲 🌲🌲🌲🌲 🌲🌲", "en"),
    # embedded control whitespace
    (200014, "line1\nline2\ttab\rcarriage end", "en"),
    # quote/special soup (also guards against any literal-embedding
    # assumptions in generated SQL)
    (200015, "it's \"quoted\" 100% — em—dash … ©™ §", "en"),
    # NBSP at the EDGES: engine-defined trim() strips it on utf8proc
    # engines but not on the JVM — the normalize contract must not
    # depend on trim
    (200016, " leading NBSP and trailing ", "en"),
    # vertical tab: inside Java's \s, outside RE2's \s
    (200017, "vertical\x0btab and\x0bmore words", "en"),
    # C0 control chars at edges and interior: outside both engines'
    # \s, but inside Spark trim()'s <= 0x20 strip set
    (200018, "\x01control\x02chars\x1f here\x01", "en"),
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory, spark):
    """An sf-dir whose documents table carries Unicode edge rows; the
    other nine tables are the untouched sf0.001 parquet files."""
    d = tmp_path_factory.mktemp("unicode_sf")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    docs = spark.read.parquet(f"{SF_SRC}/documents.parquet").limit(80)
    extra = spark.createDataFrame(
        [
            (doc_id, text, lang, "edge", len(text))
            for doc_id, text, lang in EDGE_ROWS
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staged = d / "_docs_staged"
    docs.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        str(staged)
    )
    part = next(staged.glob("part-*.parquet"))
    shutil.copy(part, d / "documents.parquet")
    shutil.rmtree(staged)
    return str(d)


def test_text_gates_match_oracles_on_unicode_text(spark, unicode_sf_dir):
    from check_parity import compare, duck_conn

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duck_conn(unicode_sf_dir)
    failed = {}
    for name in GATES:
        try:
            sdf = qs[name](spark, unicode_sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001 - report which gate died
            failed[name] = [f"spark error: {e}"[:300]]
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed[name] = [f"duckdb error: {e}"[:300]]
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed[name] = problems
    assert not failed, failed
