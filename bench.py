"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full computation,
no driver-side result materialization cost).

Each query runs REPEATS times (default 3) and reports the MEDIAN of
ALL repeats — with 3 repeats that is the middle value, which in the
normal case (run 0 slowest, paying JIT/codegen/footer costs worth
~1.5-2x) lands on the slower of the two warm runs. Round 8 measured a
per-query noise floor of 1.4-1.7x between same-code runs, against
which min-of-2 was under-powered; the median is robust to one outlier
in EITHER direction (the round-9 evidence-pipeline fix, r8 verdict
task #1). Run 0's cold time is recorded separately in the detail
file's first_run map, and every raw repeat lands in its "runs" map so
any other statistic is recomputable from the committed artifact. Set
SPARK_GRAFT_BENCH_REPEATS=1 for single-shot.
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
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in bench_queries():
        fn = QUERIES[name]
        runs: list[float] = []
        for i in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            if i == 0:
                first_run[name] = round(elapsed, 3)
            runs.append(elapsed)
        all_runs[name] = [round(r, 3) for r in runs]
        # median of all repeats (odd default 3: the middle value) —
        # robust to one outlier in EITHER direction, unlike min (which
        # under-reports genuine cost) or mean (which a single 1.7x
        # noise spike drags); the cold run is usually the max, so the
        # median lands on a warm run. first_run keeps the cold value.
        srt = sorted(runs)
        mid = len(srt) // 2
        med = srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2
        timings[name] = round(med, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Methodology fields so cross-round comparisons are
        # interpretable: rounds 1-2 were single-shot cold runs
        # (repeats=1); rounds 3-8 reported the warm min-of-2; round 9+
        # reports the median-of-3 (r8 verdict task #1 — min-of-2 is
        # under-powered against the measured 1.4-1.7x same-code noise
        # floor).  Compare totals only under the same repeats policy.
        "repeats": repeats,
        "timing": "median_of_repeats" if repeats > 1 else "single_shot",
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
            {**payload, "first_run": first_run, "runs": all_runs}, indent=2
        )
        + "\n"
    )

    line = fit_summary_line(payload)
    # Stop Spark BEFORE printing: the console progress bar writes
    # \r-frames to stdout and must not land after the summary line.
    spark.stop()
    print(line, flush=True)


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
