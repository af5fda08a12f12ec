"""Split every bench query's wall into BUILD (the Python call that
assembles the DataFrame — driver-side expression construction, py4j
round trips, and any eager work the operator does internally) vs EXEC
(the noop-sink action on the returned plan).

Guide §1: measure first. The r14 finding this tool exists to quantify
is that at sf0.1 the data is small enough (~14 MB lineitem) that
driver-side plan CONSTRUCTION is a first-class cost — lambda-bearing
higher-order functions cost ~10-40 py4j round trips each, and a few
builders create dozens per query. A query with high build and low exec
is a construction target (convert to F.expr SQL assembly); high exec
with low build is a plan/shuffle target (guide §2-3).

Usage: python tools/construction_census.py [sf_dir] [repeats]
Writes tools/construction_census.json and prints the top offenders.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from bench import bench_queries

    from cdk_datalake_ingest_spark.queries import QUERIES
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("census")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict[str, float]] = {}
    for sweep in range(repeats):
        for name in bench_queries():
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rec = out.setdefault(name, {"build": [], "exec": []})
            rec["build"].append(round(t1 - t0, 3))
            rec["exec"].append(round(t2 - t1, 3))

    # steady-state: min across sweeps (build is deterministic driver
    # work; min strips JIT/GC noise)
    summary = {
        name: {
            "build": min(rec["build"]),
            "exec": min(rec["exec"]),
            "build_runs": rec["build"],
            "exec_runs": rec["exec"],
        }
        for name, rec in out.items()
    }
    path = Path(__file__).resolve().parent / "construction_census.json"
    path.write_text(json.dumps(summary, indent=2) + "\n")

    rows = sorted(summary.items(), key=lambda kv: -kv[1]["build"])
    tb = sum(v["build"] for v in summary.values())
    te = sum(v["exec"] for v in summary.values())
    print(f"TOTAL build {tb:.1f}s exec {te:.1f}s  ({len(rows)} queries)")
    for name, rec in rows[:25]:
        print(f"{name:45s} build {rec['build']:7.3f}  exec {rec['exec']:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
