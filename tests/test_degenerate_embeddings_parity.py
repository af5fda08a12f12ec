"""Degenerate-embeddings parity sweep (round 11) — the vector twin of
tests/test_null_text_parity.py.

The fixtures carry no zero-norm or NULL embeddings, so the similarity
module's exclusion contract (zero-norm/NULL vectors EXCLUDED from
every search path — this round's ADVICE fixes) was pinned only in
unit tests, never against the DuckDB oracles. Three doctored
embeddings fixtures:

- ``edge_zero``: zero-norm + exact-duplicate rows at LARGE vec_ids
  (IVF's seed-sample centroids — the 16 smallest ids — stay clean);
  NULL-free, so the guarded-training gates run too.
- ``edge_null``: adds a NULL-vector row at a large id — the
  silent-drop search paths and seed-clean ivf_topk accept it; the
  lloyd-trained quantizer gate RAISES by contract (pinned).
- ``edge_query``: zero-norm and NULL rows at NEGATIVE vec_ids, which
  pass the gates' ``vec_id < 8`` query filters — the tier that BITES:
  before this round's oracle fix, a degenerate query produced rank
  rows with NULL cosines in the SQL window (DuckDB's x/0 and 0/0 are
  NULL, ranked NULLS-LAST but still emitted) while Spark emits no row
  at all; verified to fail against the pre-fix oracle text. The IVF
  gates cannot take this tier (negative ids would enter the
  seed-sample centroids on both engines — a garbage-in-centroids
  boundary, not a drop contract); their query-side exclusion is
  pinned in tests/test_text_similarity.py instead.

Round-11 catch (fixed, then pinned here): none of the top-k oracles
excluded degenerate vectors. All five now carry the same ``norm > 0``
exclusion as similarity._nonzero; threshold-only near-dup oracles
were already safe (NULL cosine fails >= t on both engines) and carry
the exclusion for contract uniformity.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SRC = "/root/testdata/sf0.001"

#: search/near-dup gates whose contract is SILENT DROP of degenerate
#: vectors and whose query side is an id filter (vec_id < 8)
NONIVF_DROP_GATES = [
    "ann_cosine_topk",
    "ann_lsh_suite_topk",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
]


def _build(tmp_path_factory, spark, rows, name):
    d = tmp_path_factory.mktemp(name)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents"
    ).split():
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    emb = spark.read.parquet(f"{SF_SRC}/embeddings.parquet")
    extra = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    staged = d / "_staged"
    emb.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        str(staged)
    )
    part = next(staged.glob("part-*.parquet"))
    shutil.copy(part, d / "embeddings.parquet")
    shutil.rmtree(staged)
    return str(d)


@pytest.fixture(scope="module")
def edge_zero_dir(tmp_path_factory, spark):
    dup = [float(i % 7) for i in range(64)]
    return _build(
        tmp_path_factory,
        spark,
        [
            (100001, [0.0] * 64, 0),  # zero-norm: no direction
            (100002, dup, 1),
            (100003, dup, 1),  # exact duplicate pair
        ],
        "edge_zero",
    )


@pytest.fixture(scope="module")
def edge_null_dir(tmp_path_factory, spark):
    return _build(
        tmp_path_factory,
        spark,
        [
            (100001, [0.0] * 64, 0),
            (100002, None, 1),
        ],
        "edge_null",
    )


@pytest.fixture(scope="module")
def edge_query_dir(tmp_path_factory, spark):
    """Degenerate QUERY rows: negative ids pass vec_id < 8."""
    return _build(
        tmp_path_factory,
        spark,
        [
            (-1, [0.0] * 64, 0),  # zero-norm query AND corpus row
            (-2, None, 1),  # NULL-vector query
            (100001, [0.0] * 64, 0),  # plus corpus-side degenerates
        ],
        "edge_query",
    )


def _run(spark, sf_dir, gates):
    from check_parity import compare, duck_conn

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duck_conn(sf_dir)
    failed = {}
    for name in gates:
        sdf = qs[name](spark, sf_dir).toPandas()
        ddf = con.execute(oracles[name]).df()
        problems = compare(name, sdf, ddf)
        if problems:
            failed[name] = problems
    return failed


def test_ann_gates_match_oracles_with_zero_norm_rows(spark, edge_zero_dir):
    # the kmeans-quantizer IVF accepts zero vectors (a zero vector is
    # a legitimate L2 point for Lloyd training; only the cosine search
    # stage excludes it) — include both IVF gates in the NULL-free tier
    failed = _run(
        spark,
        edge_zero_dir,
        NONIVF_DROP_GATES + ["ann_ivf_topk", "ann_ivf_kmeans_topk"],
    )
    assert not failed, failed


def test_ann_gates_match_oracles_with_null_vectors(spark, edge_null_dir):
    failed = _run(spark, edge_null_dir, NONIVF_DROP_GATES + ["ann_ivf_topk"])
    assert not failed, failed


def test_ann_gates_match_oracles_with_degenerate_queries(
    spark, edge_query_dir
):
    """The biting tier: a zero-norm/NULL QUERY must produce NO output
    rows on either engine (pre-fix, the SQL rank window emitted NULL-
    cosine rows for it — verified divergent before the oracle fix)."""
    failed = _run(spark, edge_query_dir, NONIVF_DROP_GATES)
    assert not failed, failed
    # and the degenerate queries are genuinely absent, not just agreeing
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    got = qs["ann_cosine_topk"](spark, edge_query_dir).toPandas()
    assert not set(got["query_id"]) & {-1, -2}


def test_guarded_training_raises_on_null_vectors(spark, edge_null_dir):
    """lloyd_kmeans-backed gates refuse NULL vectors loudly
    (operators/semantic._guarded_vec) rather than silently dropping —
    the documented split between the search contract (drop) and the
    training contract (raise with the offending id)."""
    import __spark_entry__ as entry_mod

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    qs = entry_mod.queries()
    with pytest.raises(SparkRuntimeException, match="dim"):
        qs["ann_ivf_kmeans_topk"](spark, edge_null_dir).collect()