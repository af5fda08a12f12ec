"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full computation,
no driver-side result materialization cost).

Repeats are INTERLEAVED round-robin across the query set (r11 verdict
task #1): sweep 0 runs every query once, then sweep 1, then sweep 2 —
instead of running each query's repeats back-to-back. Under back-to-back
repeats a transient box-contention window (another process, a GC storm)
lands ALL of one query's samples inside it and no statistic can recover;
interleaving separates a query's samples by a full sweep (~minutes), so
contention shows up as at most one bad sample per query plus an elevated
per-sweep load average — both visible in the detail file. The r11 driver
run read +19% vs r10 on unchanged code with monotonically-falling
per-repeat totals (a contended-box signature the old layout couldn't
localize); this layout makes that failure mode diagnosable.

Each query reports the MEDIAN of its sweep samples (round 8 measured a
1.4-1.7x per-query noise floor between same-code runs; the median is
robust to one outlier in either direction) AND the detail file carries
`trimmed_min` — the per-query min over WARM sweeps (sweep 0 excluded),
the statistic least sensitive to contention for cross-round same-code
comparison. Sweep 0's cold time stays in first_run, every raw sample in
"runs" (sweep order), and os.getloadavg() is recorded at each sweep
boundary so a contaminated run is self-evident from the committed
artifact. Set SPARK_GRAFT_BENCH_REPEATS=1 for single-shot.

SELF-HEALING (r13): a warm sweep whose total exceeds the fastest warm
sweep by >15% is flagged as contaminated (`flag_contaminated`); the
harness then runs up to 2 replacement sweeps and computes every
reported statistic from the CLEAN sweeps only, disclosing
contaminated_sweeps / replacement_sweeps / could_not_heal in the
artifact — a polluted headline is never silently shipped again.
busy_at_start records the load average before the run generates any
load of its own: the one reading that can expose uniform external
contention the sweep-relative flag cannot see.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Every registered query except the quadratic exactness oracles:
# ngram_jaccard_docs is the exact reference for MinHash, and
# embedding_near_dup is the exact O(n^2) cross-join reference for
# embedding_near_dup_lsh (the gated scale path). Both stay in the
# correctness gate; neither is a scale path to benchmark.
EXCLUDE = {"ngram_jaccard_docs", "embedding_near_dup"}


def bench_queries() -> list[str]:
    # ALPHABETICAL, not registry order: the registry rotates every
    # round (driver-freshness policy), and run position changes a
    # query's JIT/codegen warmth — round 7's rotation made the moved
    # entries read 1.3-1.9x "slower" with zero code change (total over
    # common entries: +0.1%). A rotation-independent order keeps
    # per-query numbers comparable across rounds.
    from cdk_datalake_ingest_spark.queries import QUERIES

    return sorted(q for q in QUERIES if q not in EXCLUDE)


def main() -> None:
    # FIRST statement (review catch): the pre-run contention signal is
    # only meaningful if sampled before this process generates any load
    # of its own — after get_spark() + the warm-up query, the 1-minute
    # load average is dominated by the bench itself and the field would
    # read "busy" on every run.
    busy_at_start = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from cdk_datalake_ingest_spark.queries import QUERIES
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch overheads.
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    order = bench_queries()
    all_runs: dict[str, list[float]] = {name: [] for name in order}
    load_avgs: list[float] = []
    sweep_totals: list[float] = []

    def run_sweep() -> None:
        load_avgs.append(round(os.getloadavg()[0], 2))
        t_sweep = time.perf_counter()
        for name in order:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            all_runs[name].append(round(time.perf_counter() - t0, 3))
        sweep_totals.append(round(time.perf_counter() - t_sweep, 3))

    def contaminated() -> list[int]:
        return flag_contaminated(sweep_totals)

    for _sweep in range(repeats):
        run_sweep()
    # SELF-HEALING (r12 verdict task #3): when a warm sweep is flagged
    # as contaminated, run replacement sweeps (cap +2) until the CLEAN
    # warm count is back to repeats-1 — never ship a polluted headline,
    # never run a sweep the statistics don't need (a flagged sweep
    # stays flagged forever relative to the clean floor, so "loop while
    # anything is flagged" would always burn the full cap). The
    # statistics below exclude the flagged sweeps (disclosed in the
    # artifact); sweep count and layout stay comparable: the median is
    # still over 1 cold + repeats-1 clean warm samples.
    extra_sweeps = 0

    def _clean_warm_count() -> int:
        return len(sweep_totals) - 1 - len(contaminated())

    while (
        repeats > 1
        and contaminated()
        and _clean_warm_count() < repeats - 1
        and extra_sweeps < 2
    ):
        run_sweep()
        extra_sweeps += 1
    flagged = contaminated()
    could_not_heal = bool(flagged) and extra_sweeps == 2 and (
        len(sweep_totals) - 1 - len(flagged) < repeats - 1
    )
    load_avgs.append(round(os.getloadavg()[0], 2))  # end-of-run reading

    # clean sample indices: sweep 0 (cold, medians need it for
    # methodology continuity) + unflagged warm sweeps
    clean_idx = [0] + [
        i for i in range(1, len(sweep_totals)) if i not in flagged
    ]

    timings: dict[str, float] = {}
    trimmed_min: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name, runs in all_runs.items():
        first_run[name] = runs[0]
        clean = [runs[i] for i in clean_idx]
        # median of clean sweeps — robust to one outlier in EITHER
        # direction, unlike min (under-reports genuine cost) or mean
        # (one 1.7x noise spike drags it); sweep 0 is usually the max
        # (JIT/codegen/footer warmup), so the median lands warm.
        srt = sorted(clean)
        mid = len(srt) // 2
        med = srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2
        timings[name] = round(med, 3)
        # min over clean WARM sweeps: the contention-insensitive
        # statistic for same-code cross-round comparison (single-shot
        # runs have no warm sweep — fall back to the only sample).
        warm = [runs[i] for i in clean_idx[1:]] or runs
        trimmed_min[name] = round(min(warm), 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Methodology fields so cross-round comparisons are
        # interpretable: rounds 1-2 were single-shot cold runs
        # (repeats=1); rounds 3-8 reported the warm min-of-2; rounds
        # 9-11 the median of back-to-back repeats; round 12+ the median
        # of INTERLEAVED sweeps (same statistic, same repeat count —
        # totals stay comparable with r9-11; only the sample layout
        # changed, to localize box contention).  value_trimmed_min is
        # the sum of per-query warm-sweep minimums — the
        # contention-insensitive companion number.
        "repeats": repeats,
        "timing": (
            "interleaved_median_of_sweeps" if repeats > 1 else "single_shot"
        ),
        "value_trimmed_min": round(sum(trimmed_min.values()), 3),
        # one load-average reading per sweep boundary (n_sweeps + 1):
        # a contaminated run shows elevated/rising values here. These
        # mid-run readings include the bench's OWN local[32] load and
        # cannot flag uniform external contention — busy_at_start (the
        # reading taken before this process did any work) is the one
        # reading that can.
        "load_avg": load_avgs,
        # sweeps excluded from the reported statistics (see
        # contaminated() in main): non-empty means replacement sweeps
        # ran and the headline is computed from clean sweeps only.
        "contaminated_sweeps": flagged,
        "replacement_sweeps": extra_sweeps,
        # healing gave up: even after +2 replacement sweeps, fewer
        # than repeats-1 clean warm sweeps exist — treat value with
        # suspicion and prefer value_trimmed_min.
        "could_not_heal": could_not_heal,
        # load average BEFORE the run generated any of its own load —
        # an elevated value here (> ~2 on this 32-cpu box) means the
        # box was already busy and EVERY sweep is suspect in a way the
        # sweep-relative flag cannot see.
        "busy_at_start": busy_at_start,
    }

    # Full per-query detail always lands in a file the judge can read.
    # first_run records the COLD time of each query (detail file only):
    # the reported median damps run 0's JIT/footer warmup, and for
    # queries that memoize driver-side state (the k-means quantizer
    # caches, the staged streaming drops) the cold column is where the
    # one-time setup cost remains visible.
    # `runs` carries every raw repeat in execution order, so ANY
    # statistic (median, min, min-of-first-2 for same-methodology
    # comparison with rounds <=8) is recomputable from the committed
    # artifact — the evidence-pipeline fix of the r8 verdict: analysis
    # can never again depend on an uncommitted sibling run.
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(
        json.dumps(
            {
                **payload,
                "first_run": first_run,
                "runs": all_runs,
                "trimmed_min": trimmed_min,
                "sweep_totals": sweep_totals,
            },
            indent=2,
        )
        + "\n"
    )

    line = fit_summary_line(payload)
    # Stop Spark BEFORE printing: the console progress bar writes
    # \r-frames to stdout and must not land after the summary line.
    spark.stop()
    print(line, flush=True)


def flag_contaminated(sweep_totals: list[float]) -> list[int]:
    """Warm sweeps (sweep 0 is cold by design) whose total exceeds the
    fastest warm sweep by >15% — the r12 finding is that the box's
    periodic monitoring tick (every ~15 min) lands inside most full
    runs and inflates a CONTIGUOUS window of one sweep.

    LIMITATION (self-relative by construction): contention that
    inflates EVERY warm sweep uniformly has no fast sweep to stand out
    against and stays invisible here; ``busy_at_start`` in the payload
    (the pre-run load reading, taken before this process has generated
    any load of its own) is the committed signal for that case —
    mid-run load readings can't serve, because the bench's own
    local[32] execution dominates them. Needs >= 2 warm sweeps to have
    anything to compare."""
    if len(sweep_totals) < 3:
        return []
    floor = min(sweep_totals[1:])
    return [
        i
        for i in range(1, len(sweep_totals))
        if sweep_totals[i] > 1.15 * floor
    ]


def fit_summary_line(payload: dict, budget: int = 1800) -> str:
    """Budget the printed summary to the driver's tail capture.

    The driver keeps only the LAST ~2 KB of stdout and parses the JSON
    line out of that tail.  Round 4's 65-query line grew past the
    capture window and lost its head ({"metric","value",...}), so
    BENCH_r04.json came back parsed:null.  Emit the full query map when
    it fits; otherwise keep the slowest-K entries (the ones worth
    reading in a summary) and say how many were omitted — the full map
    is always in BENCH_DETAIL.json.  Tested in
    tests/test_bench_contract.py (the line must stay parseable and
    under budget for ANY registry size)."""
    payload = dict(payload)
    timings = payload["queries"]
    line = json.dumps(payload)
    if len(line) > budget:
        slowest = dict(
            sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
        )
        while len(line) > budget and slowest:
            slowest.popitem()  # drop current fastest of the kept set
            payload["queries"] = dict(slowest)
            payload["queries_omitted"] = len(timings) - len(slowest)
            payload["detail_file"] = "BENCH_DETAIL.json"
            line = json.dumps(payload)
    return line


if __name__ == "__main__":
    main()
