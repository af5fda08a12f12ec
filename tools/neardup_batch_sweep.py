"""Batch-size sweep for the streaming near-dup ingest loop (r12
verdict task #1b): prove that the gate's per-drain cost is a
FIXED-COST floor amortizing with batch size, not O(table) growth.

Method: ingest the 10x rehearsal corpus (tools/scale_rehearsal.py's
/tmp/spark_graft_scale10/documents.parquet, ~50k docs — build it first
if absent) through `apply_ingest_step` at several batch sizes, same
total document count each time, and report wall clock and per-doc
cost. The streaming machinery itself (checkpoint bookkeeping) is
excluded on purpose: the claim under test is the per-BATCH dataflow's
fixed cost (codegen + scheduling + the three transactional commits),
and apply_ingest_step IS the foreachBatch body.

Expected shape: per-doc ms falls steeply from the smallest batch and
flattens at the compute floor; the largest batch pays ~the cost of the
equivalent batch operator plus three commits. Results land in the
PLANS.md sweep table.

Usage: python tools/neardup_batch_sweep.py [batch_sizes...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALE_DIR = "/tmp/spark_graft_scale10"


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1667, 5000, 16667, 50000]
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.session import get_spark
    from cdk_datalake_ingest_spark.streaming.neardup import (
        apply_ingest_step,
    )

    # 16g driver like the other scale tools (tools/scale_rehearsal.py):
    # at the 1g default, the grown index-sets relation auto-broadcasts
    # (under the 64 MB on-disk threshold, >1g inflated) and the build
    # OOMs around batch 25 of the smallest-batch config.
    spark = get_spark(
        "neardup-batch-sweep", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = f"{SCALE_DIR}/documents.parquet"
    if not Path(src).exists():
        print("10x corpus missing — run tools/scale_rehearsal.py first")
        sys.exit(1)
    docs = (
        spark.read.parquet(src)
        .select("doc_id", "text")
        .persist()
    )
    total = docs.count()
    # dense rank the ids once so range-slicing yields exact batch sizes
    # regardless of the id distribution
    from pyspark.sql import Window

    ranked = docs.withColumn(
        "__rk", F.row_number().over(Window.orderBy("doc_id")) - 1
    ).persist()
    ranked.count()
    results = []
    for bs in sizes:
        n_batches = (total + bs - 1) // bs
        tmp = tempfile.mkdtemp(prefix=f"ndup_sweep_{bs}_")
        t0 = time.time()
        for b in range(n_batches):
            batch = ranked.filter(
                (F.col("__rk") >= b * bs) & (F.col("__rk") < (b + 1) * bs)
            ).select("doc_id", "text")
            apply_ingest_step(
                spark,
                batch,
                b,
                f"{tmp}/kept",
                f"{tmp}/index",
                run_key="sweep",
            )
        wall = time.time() - t0
        from cdk_datalake_ingest_spark.operators.table import ManagedTable

        kept = ManagedTable(spark, f"{tmp}/kept").read().count()
        results.append(
            {
                "batch_size": bs,
                "n_batches": n_batches,
                "wall_s": round(wall, 2),
                "per_doc_ms": round(1000.0 * wall / total, 3),
                "per_batch_s": round(wall / n_batches, 2),
                "kept": kept,
            }
        )
        print(json.dumps(results[-1]))
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"total_docs": total, "sweep": results}))


if __name__ == "__main__":
    main()
