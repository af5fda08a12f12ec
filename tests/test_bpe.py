"""BPE merge training (operators/corpus.py:bpe_train_merges):
reference-example equivalence, tie-breaks, greedy-apply semantics,
boundary raises."""

from __future__ import annotations

import pytest

from cdk_datalake_ingest_spark.operators.corpus import bpe_train_merges


def test_matches_sennrich_reference_example(spark):
    """The canonical low/lower/newest corpus: merge order and weighted
    pair counts hand-checked against the paper's algorithm (count DESC,
    then (lhs, rhs) lexicographic tie-break)."""
    df = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest")],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in bpe_train_merges(df, n_merges=4).collect()]
    assert rows == [
        # (l,o) and (o,w) both count 4 -> lexicographic lhs wins
        (1, "l", "o", "lo", 4),
        (2, "lo", "w", "low", 4),
        # among the count-2 pairs (e,s),(e,w),(n,e),(s,t): (e,s) wins
        (3, "e", "s", "es", 2),
        (4, "e", "w", "ew", 2),
    ]


def test_greedy_apply_is_left_to_right_nonoverlapping(spark):
    """'aaa' must merge to (aa, a), not consume the overlap — the
    double-space replace trick preserves reference greedy semantics,
    so after merging (a,a) the remaining pair count for (aa,a) is 1
    per 'aaa' word, and (a,a) inside 'aaaa' counts 3 overlapping
    positions when first measured."""
    df = spark.createDataFrame(
        [(1, "aaa aaa aaaa bc")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in bpe_train_merges(df, n_merges=2).collect()]
    # step 1: (a,a) = 2 per 'aaa' x2 + 3 in 'aaaa' = 7
    assert rows[0] == (1, "a", "a", "aa", 7)
    # after apply: 'aaa'->'aa a' (x2), 'aaaa'->'aa aa'; pairs now
    # (aa,a)=2, (aa,aa)=1, (b,c)=1 -> (aa,a) wins
    assert rows[1] == (2, "aa", "a", "aaa", 2)


def test_case_and_nonletter_tokens_excluded(spark):
    """Vocabulary is lowercased letters-only words; digits/punct
    tokens contribute nothing (pre-tokenization's job)."""
    df = spark.createDataFrame(
        [(1, "AB ab 12 a-b ab")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in bpe_train_merges(df, n_merges=1).collect()]
    assert rows == [(1, "a", "b", "ab", 3)]


def test_boundary_raises(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(df, n_merges=0)
    # single-char words have no adjacent pairs: exhaustion raises with
    # the step count instead of silently returning a short model
    with pytest.raises(ValueError, match="exhausted after 0 merges"):
        bpe_train_merges(df, n_merges=2)


def test_bpe_segment_replays_training(spark):
    """bpe_segment (the apply side) replays the learned merges: after
    training on the reference corpus, the training words segment
    exactly as the final training-state vocabulary, segments always
    concatenate back to the word, and unknown characters pass through
    single-symbol."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.corpus import bpe_segment

    df = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest")],
        "doc_id long, text string",
    )
    table = bpe_train_merges(df, n_merges=4).collect()
    merges = [(r["lhs"], r["rhs"]) for r in table]
    words = spark.createDataFrame(
        [("low",), ("lower",), ("newest",), ("xyz",)], "w string"
    )
    got = {
        r["w"]: list(r["seg"])
        for r in words.select(
            "w", bpe_segment(F.col("w"), merges).alias("seg")
        ).collect()
    }
    # merges learned: (l,o) (lo,w) (e,s) (e,w)
    assert got["low"] == ["low"]
    assert got["lower"] == ["low", "e", "r"]
    assert got["newest"] == ["n", "ew", "es", "t"]
    assert got["xyz"] == ["x", "y", "z"]
    for w, seg in got.items():
        assert "".join(seg) == w


def test_bpe_segment_merge_bound(spark):
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.corpus import bpe_segment

    with pytest.raises(ValueError, match="single-expression bound"):
        bpe_segment(F.lit("abc"), [("a", "b")] * 65)
