"""Per-job profile of one registered query: run it exactly as bench.py
does (noop sink, same session conf) with the Spark UI enabled, then
scrape the UI REST API for every job/stage this query ran — names,
durations, task counts — so the wall-clock can be attributed to jobs
(guide §1.1/§7.1: find where the time actually goes before changing
anything).

Usage: python tools/profile_query.py <query> [sf_dir] [repeats]

Prints one line per job (start-ordered): duration, stage count, task
count, description — and a tail summary: total wall per run, job-sum,
and the gap (driver-side time no job accounts for: planning, commit
protocol, filesystem work, Python round-trips).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from cdk_datalake_ingest_spark.queries import QUERIES
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    app = api(base, "/applications")[0]["id"]

    # warm: q01 (footers/JIT) then the target once, as the bench does
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    walls = []
    for rep in range(repeats):
        jobs_before = {j["jobId"] for j in api(base, f"/applications/{app}/jobs?status=succeeded")} | {
            j["jobId"] for j in api(base, f"/applications/{app}/jobs?status=failed")
        }
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        walls.append(wall)
        jobs = [
            j
            for j in api(base, f"/applications/{app}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["submissionTime"])
        if rep != repeats - 1:
            continue  # only print the last (warm) run
        job_sum = 0.0
        print(f"== {name} run {rep}: wall {wall:.3f}s, {len(jobs)} jobs ==")
        prev_end = None
        for j in jobs:
            st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            sub_ms = time.mktime(st) * 1000 + float(j["submissionTime"][20:23])
            ct = j.get("completionTime")
            if ct:
                et = time.strptime(ct[:19], "%Y-%m-%dT%H:%M:%S")
                end_ms = time.mktime(et) * 1000 + float(ct[20:23])
            else:
                end_ms = sub_ms
            dur = (end_ms - sub_ms) / 1000
            gap = (sub_ms - prev_end) / 1000 if prev_end is not None else 0.0
            prev_end = end_ms
            job_sum += dur
            desc = (j.get("description") or j["name"])[:100]
            gtxt = f" (+{gap:.3f}s gap)" if gap > 0.05 else ""
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s "
                f"stages={len(j['stageIds']):>2} tasks={j['numTasks']:>4}"
                f"{gtxt}  {desc}"
            )
        print(
            f"  -- wall {wall:.3f}s | job-sum {job_sum:.3f}s | "
            f"driver/gap {wall - job_sum:.3f}s"
        )
    print(f"walls: {[round(w, 3) for w in walls]}")
    spark.stop()


if __name__ == "__main__":
    main()
