"""Degenerate-events parity sweep (round 11) — the events twin of the
NULL-text and degenerate-embeddings sweeps.

The events fixture has no NULL keys, timestamps, or values, so the
window/rollup/join gates' NULL behavior was unverified against their
oracles — and NULL ORDERING is a known cross-engine trap (Spark's
default ASC is NULLS FIRST, DuckDB's is NULLS LAST; a lag/lead
sessionizer or rank window over a NULL-bearing sort key can disagree
while both engines are 'correct'). This builds a doctored events
table — real sf0.001 rows PLUS rows with NULL user_id, NULL
event_type, NULL ts, and NULL value — and runs the events-family
gates against their OWN registered oracles.

Gates excluded deliberately: streaming entries (fixture staging, not
a NULL-semantics surface at this grain) and the q-series (no events).
"""

from __future__ import annotations

import datetime as dt
import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SRC = "/root/testdata/sf0.001"

GATES = [
    "w1_latest_event",
    "events_hourly_rollup",
    "events_daily_rollup_sets",
    "events_value_percentiles",
    "events_unpivot_metrics",
    "events_pivot_by_type",
    "events_props_json",
    "window_rank_suite_events",
    "user_value_analytics",
    "sessionize_events",
    "asof_purchase_click",
    "range_join_purchase_clicks",
    "skew_salted_join_events",
    "gap_fill_user_hours",
    "watermark_events",
    "incremental_between_events",
    "merge_upsert_events",
    "merge_delete_window_events",
    "continuous_rollup_events",
]


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_events")
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    ev = spark.read.parquet(f"{SF_SRC}/events.parquet")
    t0 = dt.datetime(2024, 1, 2, 12, 0, 0)
    extra = spark.createDataFrame(
        [
            (900001, t0, None, "click", 1.5, '{"k": 1}'),  # NULL user
            (900002, t0, 3, None, 2.5, "{}"),  # NULL type
            (900003, None, 3, "click", 3.5, None),  # NULL ts + props
            (900004, t0, 4, "purchase", None, '{"k": 2}'),  # NULL value
            (None, t0, 5, "click", 4.5, '{"k": 3}'),  # NULL event_id
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    staged = d / "_staged"
    ev.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        str(staged)
    )
    part = next(staged.glob("part-*.parquet"))
    shutil.copy(part, d / "events.parquet")
    shutil.rmtree(staged)
    return str(d)


def test_events_gates_match_oracles_on_degenerate_keys(
    spark, edge_events_dir
):
    from check_parity import compare, duck_conn

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duck_conn(edge_events_dir)
    failed = {}
    for name in GATES:
        try:
            sdf = qs[name](spark, edge_events_dir).toPandas()
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