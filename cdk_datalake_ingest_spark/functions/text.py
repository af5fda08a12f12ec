"""Text-analysis column functions for training-data pipelines.

All pure native Column expressions (JVM-side, whole-stage codegen):
token counting, quality scoring, n-gram language ID, fingerprinting.
Regexes are restricted to syntax with identical semantics in Java
regex and RE2 so DuckDB oracles can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.dedup import (
    ASCII_WS,
    normalize_text,
    word_shingles,
)

WORD_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[.,!?;:]"
# GPT-2-style pre-tokenizer pattern, restricted to syntax shared by
# Java regex and RE2 (no lookarounds, and no bare \s: Java's \s
# includes vertical tab 0x0B, RE2's does not, so a \x0B would land in
# the whitespace run under Java but in the symbol run under RE2 — the
# class is written out) so the DuckDB oracle can run the identical
# pattern: contraction suffixes, letter runs, digit runs, other-symbol
# runs (each optionally preceded by one space), whitespace.
_WS = ASCII_WS  # the single pinned class (operators/dedup.py)
BPE_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^A-Za-z0-9" + _WS + r"']+|[" + _WS + r"]+"
)

# Tiny built-in stopword lists for the n-gram/stopword language-ID
# heuristic. Order fixes the argmax tie-break (first wins).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por", "un"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "que", "pour"],
    "de": ["der", "die", "das", "und", "von", "zu", "den", "mit", "ist", "des", "im", "ein"],
}


def tokens_of_norm(norm: Column) -> Column:
    """Whitespace tokens of ALREADY-normalized text (the
    ``normalize_text`` output contract: single-space separated, no
    edge spaces). Split out so a pipeline that needs tokens in many
    expression positions can project the normalized text ONCE and
    derive tokens from the attribute reference — Catalyst's
    CollapseProject keeps a non-cheap alias referenced more than once
    in its own project, so the normalize regex runs once per row
    instead of once per position (the round-12 curate_documents fix:
    the r11 normalize body re-evaluated ~10x per row through
    lang_id/quality/token_count cost a measured 1.36x on that gate)."""
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (empty array for
    blank/empty input)."""
    return tokens_of_norm(normalize_text(col))


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def word_count(col: Column) -> Column:
    """Regex word count (BPE-ish sub-token proxy: \\w+ runs)."""
    return F.size(F.regexp_extract_all(col, F.lit(WORD_RE), 0))


def bpe_token_count(col: Column) -> Column:
    """Token count under a BPE-ish pre-tokenizer regex (contraction
    suffixes / letter runs / digit runs / symbol runs / whitespace) —
    the standard proxy for LLM token budgeting when the real tokenizer
    isn't on the cluster. Whitespace-only matches are not counted."""
    pieces = F.regexp_extract_all(col, F.lit(BPE_RE), 0)
    # NOT trim(p) != '': trim is engine-defined (Spark strips <= 0x20,
    # utf8proc engines strip Unicode whitespace, so an NBSP-only piece
    # counted here but not in the oracle). The exclusion is exactly
    # "pieces produced by the \s+ alternative", so test that.
    return F.size(F.filter(pieces, lambda p: ~p.rlike(f"^[{_WS}]+$")))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0))


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.regexp_extract_all(col, F.lit(r"[0-9]"), 0)).cast("double") / n
    )


def stopword_hits_tokens(toks: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in a token array."""
    wordlist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.array_distinct(
            F.filter(toks, lambda t: F.array_contains(wordlist, t))
        )
    )


def stopword_hits(col: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the text."""
    return stopword_hits_tokens(tokens(col), lang)


def stopword_hit_count_tokens(toks: Column, lang: str = "en") -> Column:
    """Number of tokens in the array that are ``lang`` stopwords
    (duplicates count)."""
    wordlist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordlist, t)))


def stopword_hit_count(col: Column, lang: str = "en") -> Column:
    """Number of tokens that are ``lang`` stopwords (duplicates count)
    — the shared numerator of ``stopword_ratio`` and the Gopher
    >=2-stopword rule, so the wordlist and tokenization live in ONE
    place."""
    return stopword_hit_count_tokens(tokens(col), lang)


def stopword_ratio_tokens(toks: Column, lang: str = "en") -> Column:
    """Fraction of array tokens that are ``lang`` stopwords."""
    n = F.size(toks)
    hits = stopword_hit_count_tokens(toks, lang)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are ``lang`` stopwords (duplicates count)."""
    return stopword_ratio_tokens(tokens(col), lang)


def mean_word_length_tokens(toks: Column) -> Column:
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n == 0, F.lit(0.0)).otherwise(total.cast("double") / n)


def mean_word_length(col: Column) -> Column:
    return mean_word_length_tokens(tokens(col))


def quality_score_tokens(toks: Column, raw: Column) -> Column:
    """``quality_score`` with the tokenization factored out: ``toks``
    is the token array (ideally a projected column — see
    ``tokens_of_norm``), ``raw`` the original text (the digit penalty
    is char-based and deliberately sees the RAW string). Same tree,
    same arithmetic, same rounding as ``quality_score``."""
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    mwl = mean_word_length_tokens(toks)
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.3))
    sw_score = F.least(stopword_ratio_tokens(toks, "en") * F.lit(4.0), F.lit(1.0))
    digit_pen = F.lit(1.0) - F.least(digit_ratio(raw) * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.3) * len_score
        + F.lit(0.2) * mwl_score
        + F.lit(0.3) * sw_score
        + F.lit(0.2) * digit_pen,
        6,
    )


def quality_score(col: Column) -> Column:
    """Deterministic heuristic quality score in [0,1]: rewards
    mid-length documents, plausible mean word length and stopword
    presence; penalizes digit soup. Weights are fixed so DuckDB
    oracles can reproduce the arithmetic exactly."""
    return quality_score_tokens(tokens(col), col)


def lang_id_from_hits(
    hits: dict[str, Column], langs: list[str]
) -> Column:
    """The language-ID argmax over PRECOMPUTED per-language hit
    columns; 'und' when no list matches. Tie-break: first language in
    ``langs`` order wins. Factored out so a pipeline can project the
    hit counts once (the oracle SQL's CTE ``h`` shape) instead of
    re-evaluating each token filter in every CaseWhen comparison."""
    best = None
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other == lang:
                continue
            # strictly greater than languages listed before (they won
            # ties), >= for languages after.
            if langs.index(other) < langs.index(lang):
                cond = cond & (hits[lang] > hits[other])
            else:
                cond = cond & (hits[lang] >= hits[other])
        branch = F.when(cond, F.lit(lang))
        best = branch if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def lang_id(col: Column, langs: list[str] | None = None) -> Column:
    """Stopword-hit argmax language ID; 'und' when no list matches.
    Tie-break: first language in ``langs`` order wins."""
    langs = langs or list(STOPWORDS)
    return lang_id_from_hits(
        {lang: stopword_hits(col, lang) for lang in langs}, langs
    )


def doc_fingerprint(col: Column, n: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5 over word
    n-gram shingles (a 1-permutation MinHash — stable under shingle
    reordering). Empty/short docs fall back to md5 of the normalized
    text."""
    sh = word_shingles(col, n)
    return F.when(
        F.size(sh) > 0,
        F.array_min(F.transform(sh, lambda s: F.md5(s))),
    ).otherwise(F.md5(normalize_text(col)))
