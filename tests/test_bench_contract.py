"""The bench summary-line contract the driver depends on.

The driver captures only the last ~2 KB of bench.py's stdout and
parses the one JSON line out of that tail; a line that outgrows the
capture loses its head and the round's BENCH json comes back
parsed:null (it happened in round 4). ``fit_summary_line`` must keep
the line parseable and under budget for ANY registry size, preferring
the slowest entries — those are the ones a summary reader wants.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from bench import fit_summary_line


def _payload(n_queries: int) -> dict:
    return {
        "metric": "headline_queries_total",
        "value": round(sum(i * 0.1 for i in range(n_queries)), 3),
        "unit": "sec",
        "queries": {
            f"query_name_{i:04d}": round(i * 0.1, 3)
            for i in range(n_queries)
        },
        "sf": 0.1,
        "repeats": 3,
        "timing": "median_of_repeats",
    }


def test_small_registry_emits_full_map():
    p = _payload(10)
    line = fit_summary_line(p)
    out = json.loads(line)
    assert out["queries"] == p["queries"]
    assert "queries_omitted" not in out


@given(st.integers(min_value=0, max_value=500))
@settings(max_examples=60, deadline=None)
def test_line_fits_budget_and_keeps_slowest(n):
    p = _payload(n)
    line = fit_summary_line(p)
    assert len(line) <= 1800 or n == 0
    out = json.loads(line)  # parseable regardless
    # headline fields always survive the trim
    assert out["metric"] == "headline_queries_total"
    assert out["value"] == p["value"]
    kept = out["queries"]
    if "queries_omitted" in out:
        assert out["queries_omitted"] == n - len(kept)
        assert out["detail_file"] == "BENCH_DETAIL.json"
        # kept set is exactly the slowest len(kept) entries
        cutoff = sorted(p["queries"].values(), reverse=True)[: len(kept)]
        assert sorted(kept.values(), reverse=True) == cutoff
    else:
        assert kept == p["queries"]


def test_caller_payload_not_mutated():
    p = _payload(300)
    before = dict(p["queries"])
    fit_summary_line(p)
    assert p["queries"] == before and "queries_omitted" not in p


def test_flag_contaminated_rule():
    from bench import flag_contaminated

    # too few warm sweeps to compare
    assert flag_contaminated([]) == []
    assert flag_contaminated([100.0]) == []
    assert flag_contaminated([100.0, 90.0]) == []
    # the r12 driver-run shape: monotonically falling warm totals =
    # contention in the early warm sweep
    assert flag_contaminated([296.1, 241.3, 200.4]) == [1]
    # clean run: warm spread under 15%
    assert flag_contaminated([150.0, 101.0, 100.0]) == []
    # replacement sweep appended after a flagged one: the flag
    # recomputes over ALL warm sweeps, so the slow one stays flagged
    # and the replacement is clean
    assert flag_contaminated([150.0, 130.0, 100.0, 101.0]) == [1]
