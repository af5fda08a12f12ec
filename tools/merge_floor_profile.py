"""Attribute the ManagedTable scoped-merge fixed floor (r13 verdict
task #8): the 100x rehearsal shows the merge family at ~3.7x on 100x
data — floor-dominated, which is the shape you want — but WHICH fixed
costs make up that floor (snapshot dir walk? manifest CAS? the write
job itself?) had not been measured. This profiles one scoped merge
end-to-end with per-phase timers at two table sizes so each
component's scaling is visible:

  pinned    — _pinned_snapshot: manifest read + spark.read file
              listing of the current snapshot (driver-side)
  leafwalk  — _leaf_partitions: the hive-leaf directory walk
              (once in the insert-only disjointness probe, once in
              _write_scoped)
  write     — the Spark parquet write job of the merged partitions
  link      — _link_tree hard-link carry of untouched partitions
  commit    — lock + CAS + manifest swap + history append
  other     — everything else in merge_upsert (plan building,
              touched-partition bookkeeping)

Scenario mirrors the streaming sinks: a table partitioned by an int
day column, merging one fresh partition with the
source_unique/touched_partitions hints (insert-only fast path) and
once without hints (computed-touched path).

Usage: python tools/merge_floor_profile.py [copies]
(copies multiplies the sf0.1 events table; default runs 1 and 10)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, copies: int) -> None:
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    if copies > 1:
        ev = ev.withColumn(
            "__c", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
        ).withColumn(
            "user_id", F.col("user_id") + F.col("__c") * 1_000_000
        ).drop("__c")
    ev = ev.withColumn(
        "day",
        F.date_format(F.col("ts"), "yyyyMMdd").cast("int"),
    ).select("user_id", "event_type", "ts", "value", "day")

    T: dict[str, float] = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.time()
            try:
                return fn(*a, **k)
            finally:
                T[name] = T.get(name, 0.0) + (time.time() - t0)

        return wrap

    class Timed(ManagedTable):
        def _pinned_snapshot(self):
            return timed("pinned", super()._pinned_snapshot)()

        def _leaf_partitions(self, data_dir, pby):  # type: ignore[override]
            return timed(
                "leafwalk", lambda: ManagedTable._leaf_partitions(data_dir, pby)
            )()

        def _link_tree(self, src, dst):  # type: ignore[override]
            return timed(
                "link", lambda: ManagedTable._link_tree(src, dst)
            )()

        def _commit(self, manifest, expected_version, op="write"):
            return timed(
                "commit",
                lambda: super(Timed, self)._commit(
                    manifest, expected_version, op=op
                ),
            )()

    tmp = tempfile.mkdtemp(prefix=f"merge_floor_{copies}_")
    base = ev.filter(F.col("day") < 20240125)
    batch = ev.filter(F.col("day") == 20240125).persist()
    batch.count()
    tbl = Timed(spark, f"{tmp}/events")
    tbl.write(base, partition_by=["day"])
    T.clear()

    import pyspark.sql.readwriter as rw

    orig_parquet = rw.DataFrameWriter.parquet
    rw.DataFrameWriter.parquet = timed("write", orig_parquet)
    for label, kwargs in (
        (
            "hinted",
            dict(
                source_unique=True,
                touched_partitions=[(20240125,)],
            ),
        ),
        ("computed", {}),
    ):
        T.clear()
        t0 = time.time()
        tbl.merge_upsert(
            batch,
            keys=["day", "user_id", "event_type"],
            **kwargs,
        )
        total = time.time() - t0
        T["other"] = total - sum(
            v for k, v in T.items() if k != "other"
        )
        print(
            json.dumps(
                {
                    "copies": copies,
                    "path": label,
                    "total_s": round(total, 3),
                    **{k: round(v, 3) for k, v in sorted(T.items())},
                }
            )
        )
    rw.DataFrameWriter.parquet = orig_parquet
    batch.unpersist()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sizes = (
        [int(sys.argv[1])] if len(sys.argv) > 1 else [1, 10]
    )
    for c in sizes:
        profile(spark, c)


if __name__ == "__main__":
    main()
