"""Extreme-numerics parity sweep (round 11) — sweep #7.

The fixtures' doubles are tame (uniform event values, unit-ish
embedding components), so the gates' behavior on IEEE-754's edge
inhabitants — NaN, ±Infinity, -0.0, overflow-sized and subnormal
magnitudes — was unverified against the oracles. These are not
hypothetical at 100 TB: one corrupted sensor reading or a divide
upstream produces them, and the engines genuinely differ here (the
probe that motivated this sweep: DuckDB CAST(inf AS DECIMAL) raises
and even TRY_CAST(nan AS DECIMAL) raises, while Spark's non-ANSI cast
yields NULL for all three of NaN/Inf/overflow).

Doctors events.value with the full edge set and embeddings with
NaN/Inf-component vectors, then runs every value-consuming events
gate and the ANN/near-dup suite against their registered oracles.

What it pins after the fixes: the money-aggregate contract
(non-finite and overflow values contribute NULL to DECIMAL sums on
BOTH engines — Spark's non-ANSI cast semantics, emulated in the
oracles via isnan guard + TRY_CAST), NaN/Inf ordering agreement
(both engines sort NaN above +Inf; rank/percentile/window gates
agree without changes), and the similarity guard extension (a
non-finite-norm vector is excluded from every search path exactly
like a zero-norm one).
"""

from __future__ import annotations

import datetime as dt
import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SRC = "/root/testdata/sf0.001"

GATES_EVENTS = [
    "events_hourly_rollup",
    "events_daily_rollup_sets",
    "events_value_percentiles",
    "events_unpivot_metrics",
    "events_pivot_by_type",
    "window_rank_suite_events",
    "user_value_analytics",
    "gap_fill_user_hours",
    "sessionize_events",
    "asof_purchase_click",
    "range_join_purchase_clicks",
    "skew_salted_join_events",
    "w1_latest_event",
    "merge_upsert_events",
    "merge_delete_window_events",
    "continuous_rollup_events",
]

#: search paths: non-finite vectors silently DROPPED (similarity.
#: _nonzero), oracle-mirrored via isfinite
GATES_EMB = [
    "ann_cosine_topk",
    "ann_lsh_suite_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
]

#: training paths: non-finite vectors REFUSED loudly (semantic.
#: _guarded_vec, shared by lloyd/assign/SemDeDup and pq_train) —
#: corrupt input stops a model build
GATES_EMB_TRAINING = [
    "ann_ivf_kmeans_topk",
    "semantic_dedup_embeddings",
    "kmeans_clusters_embeddings",
    "ann_pq_adc_topk",
    "ann_ivfadc_topk",
]

_T0 = dt.datetime(2024, 1, 2, 12, 0, 0)

#: (event_id, value) — IEEE-754 edge inhabitants
VALUE_ROWS = [
    (920001, float("nan")),
    (920002, float("inf")),
    (920003, float("-inf")),
    (920004, 1e300),  # overflows DECIMAL(18,6)
    (920005, -1e300),
    (920006, -0.0),
    (920007, 5e-324),  # smallest subnormal
    (920008, 1.7976931348623157e308),  # DBL_MAX
]


@pytest.fixture(scope="module")
def extreme_sf_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("extreme_sf")
    for t in (
        "region nation customer supplier part orders lineitem documents"
    ).split():
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")

    def _stage(base_df, extra_df, dest: Path):
        staged = d / f"_staged_{dest.stem}"
        base_df.unionByName(extra_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staged))
        shutil.copy(next(staged.glob("part-*.parquet")), dest)
        shutil.rmtree(staged)

    ev = spark.read.parquet(f"{SF_SRC}/events.parquet")
    # spread the edge rows across users and BOTH event types so the
    # purchase/click join gates and per-user windows all see them
    ev_extra = spark.createDataFrame(
        [
            (
                eid,
                _T0 + dt.timedelta(minutes=i),
                3 + (i % 4),
                "purchase" if i % 2 else "click",
                v,
                '{"k": 1}',
            )
            for i, (eid, v) in enumerate(VALUE_ROWS)
        ],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    _stage(ev, ev_extra, d / "events.parquet")

    emb = spark.read.parquet(f"{SF_SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    nan_vec = [float("nan")] * dim
    inf_vec = [1.0] * dim
    inf_vec[0] = float("inf")
    one_nan = [0.5] * dim
    one_nan[-1] = float("nan")
    emb_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in emb.schema.fields)
    emb_extra = spark.createDataFrame(
        [(930001, nan_vec, 0), (930002, inf_vec, 0), (930003, one_nan, 0)],
        emb_schema,
    )
    _stage(emb, emb_extra, d / "embeddings.parquet")
    return str(d)


def _run(spark, sf_dir, gates):
    from check_parity import compare, duck_conn

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duck_conn(sf_dir)
    failed = {}
    for name in gates:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
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
    return failed


def test_events_gates_agree_on_ieee_edge_values(spark, extreme_sf_dir):
    assert not _run(spark, extreme_sf_dir, GATES_EVENTS)


def test_ann_gates_agree_on_nonfinite_vectors(spark, extreme_sf_dir):
    assert not _run(spark, extreme_sf_dir, GATES_EMB)


def test_gap_fill_refuses_runaway_spans(spark, tmp_path):
    """One corrupt timestamp (a year-9999 bad parse) would make the
    gap-fill grid's sequence() materialize a ~70M-element array in a
    single row and OOM the stage; the span guard refuses it with the
    offending user instead — corruption stops the job, it does not
    silently OOM. Same refusal contract as _guarded_vec."""
    import __spark_entry__ as entry_mod

    d = tmp_path / "sf"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    ev = spark.read.parquet(f"{SF_SRC}/events.parquet")
    bad = spark.createDataFrame(
        [(940001, dt.datetime(9999, 1, 1), 3, "click", 1.0, "{}")],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    staged = d / "_s"
    ev.unionByName(bad).coalesce(1).write.mode("overwrite").parquet(
        str(staged)
    )
    shutil.copy(next(staged.glob("part-*.parquet")), d / "events.parquet")
    shutil.rmtree(staged)
    with pytest.raises(Exception, match="hour span exceeds"):
        entry_mod.queries()["gap_fill_user_hours"](
            spark, str(d)
        ).toPandas()


def test_training_gates_refuse_nonfinite_vectors(spark, extreme_sf_dir):
    """The documented contrast to the search paths' silent drop: a
    k-means/SemDeDup model build REFUSES corrupt vectors with the
    offending id instead of silently shrinking (or NaN-poisoning) the
    model — np.argmin over a NaN distance row and a SQL ORDER BY rank
    genuinely disagree, so there is no portable silent semantics to
    pin here."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in GATES_EMB_TRAINING:
        with pytest.raises(Exception, match="non-finite vector component"):
            qs[name](spark, extreme_sf_dir).toPandas()
