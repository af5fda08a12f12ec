"""Sweep every bench query once (warm) and report, per query: wall,
job-sum, driver gap, and the slowest SINGLE-TASK job (the fan-out
smell: expression-heavy stages running on a one-partition fixture
scan — guide §2.5 input skew). Writes tools/hotspot_sweep.json.

Usage: python tools/hotspot_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def _dur(j) -> float:
    if not (j.get("completionTime") and j.get("submissionTime")):
        return 0.0
    f = "%Y-%m-%dT%H:%M:%S.%f"
    return (
        datetime.strptime(j["completionTime"][:-3], f)
        - datetime.strptime(j["submissionTime"][:-3], f)
    ).total_seconds()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from bench import bench_queries

    from cdk_datalake_ingest_spark.queries import QUERIES
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("hotspots", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        "http://localhost:"
        f"{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
    )
    app = api(base, "/applications")[0]["id"]

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    run("q01_pricing_summary")  # session warmup
    out: dict[str, dict] = {}
    for name in names or bench_queries():
        try:
            run(name)  # warm: staging memos, JIT
            seen = {j["jobId"] for j in api(base, f"/applications/{app}/jobs?limit=10000")}
            t0 = time.perf_counter()
            run(name)
            wall = time.perf_counter() - t0
            jobs = [
                j
                for j in api(base, f"/applications/{app}/jobs?limit=10000")
                if j["jobId"] not in seen
            ]
            jobsum = sum(_dur(j) for j in jobs)
            one = [(_dur(j), j["jobId"]) for j in jobs if j["numTasks"] == 1]
            one.sort(reverse=True)
            out[name] = {
                "wall": round(wall, 3),
                "job_sum": round(jobsum, 3),
                "gap": round(wall - jobsum, 3),
                "n_jobs": len(jobs),
                "max_1task_job": round(one[0][0], 3) if one else 0.0,
            }
            r = out[name]
            print(
                f"{name:42s} wall={r['wall']:7.3f} jobs={r['n_jobs']:3d} "
                f"jobsum={r['job_sum']:7.3f} gap={r['gap']:7.3f} "
                f"max1task={r['max_1task_job']:6.3f}",
                flush=True,
            )
        except Exception as ex:  # pragma: no cover - diagnostic tool
            print(f"{name}: ERROR {ex}", flush=True)
    Path(__file__).with_name("hotspot_sweep.json").write_text(
        json.dumps(out, indent=1, sort_keys=True)
    )


if __name__ == "__main__":
    main()
