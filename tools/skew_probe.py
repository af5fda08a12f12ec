"""Skew-join rehearsal: measure the engine's three answers to a hot
key at shuffle-join scale, and verify they agree.

The fixtures are skew-free (events sf0.1: 100k rows over 1500 uniform
users), so the skew story — AQE skew-join splitting and the
salted_join operator (operators/skew.py) — had configuration and a
correctness gate but no MEASURED evidence. This probe synthesizes a
fact table big enough for the shuffle path to matter on local[32]
(default 20M rows, one user holding 50% of them — the "one whale
account" shape every 100 TB event lake has) and times a
fact-to-dimension join + aggregate under:

  static      AQE fully off, plain sort-merge join — the worst case:
              the hot key's entire row set lands on ONE reducer.
  aqe         engine defaults (session.py): AQE skew-join splits the
              hot partition into advisory-sized chunks at runtime.
  salted      salted_join(num_salts=32) with AQE off — the explicit
              rewrite for when even split shuffle blocks overwhelm a
              reducer (or the build side can't broadcast).

Broadcast is disabled throughout (the dimension would otherwise
broadcast and no skew would exist to mitigate — that's the FIRST
answer to skew, but not the one under test). Each condition runs
twice, min taken; all three aggregates are checksummed against each
other — salting and AQE splitting must be purely physical rewrites.

Usage: python tools/skew_probe.py [n_rows] [hot_share]
Prints one JSON line; paste the numbers into SCALE.md's skew section.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
HOT_SHARE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
N_USERS = 1500
HOT_USER = 7


def build(spark):
    """Skewed fact + uniform dim, materialized to parquet once so every
    condition reads identical input (and the scan cost is shared)."""
    fact_path = f"/tmp/spark_graft_skew_{N_ROWS}_{HOT_SHARE}"
    if not Path(fact_path).exists():
        hot_every = max(int(round(1 / HOT_SHARE)), 1)
        fact = spark.range(N_ROWS).select(
            F.when(F.col("id") % hot_every == 0, F.lit(HOT_USER))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
            .alias("user_id"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
                "event_type"
            ),
        )
        fact.write.mode("overwrite").parquet(fact_path)
    return fact_path


def _dim(spark):
    return spark.range(N_USERS).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg"), (F.col("id") % 7).cast("string")).alias(
            "segment"
        ),
    )


def run_condition(spark, fact_path: str, mode: str):
    aqe = "true" if mode == "aqe" else "false"
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    if mode == "aqe":
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # the fixture-scale thresholds are tuned for 128 MiB target
        # partitions; this probe's whole shuffle is ~hundreds of MiB,
        # so scale the advisory size down to make the splitter's
        # decision visible at probe scale (the RATIO config is the
        # same one production uses)
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4194304"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8388608",
        )
    def _plan():
        # a FRESH read per run: re-collecting the same DataFrame would
        # reuse the prior run's shuffle map outputs (same RDD lineage)
        # and time only the final reduce — measured 0.1 s for a 20M-row
        # join, i.e. nothing
        fact = spark.read.parquet(fact_path)
        dim = _dim(spark)
        if mode == "salted":
            from cdk_datalake_ingest_spark.operators.skew import salted_join

            joined = salted_join(fact, dim, on=["user_id"], num_salts=32)
        else:
            joined = fact.join(dim, on=["user_id"])
        return joined.groupBy("segment", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )

    best, rows, agg = None, None, None
    for _ in range(2):
        agg = _plan()
        t0 = time.monotonic()
        rows = agg.collect()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    checksum = (
        sum(r["n"] for r in rows),
        round(sum(r["total"] for r in rows), 3),
        len(rows),
    )
    skew_marks = None
    if mode == "aqe":
        plan = agg._jdf.queryExecution().executedPlan().toString()
        skew_marks = plan.count("skew=true")
    return best, checksum, skew_marks


def main():
    from cdk_datalake_ingest_spark.session import get_spark

    # the static worst case funnels the hot key's ~N/2 rows onto ONE
    # reducer — that's the condition under test, so give the single
    # JVM enough heap to survive it instead of OOMing before the
    # timing exists (the engine default inherits Spark's 1g driver
    # heap, fine for the fixture-scale gates)
    spark = get_spark(
        "skew-probe", extra_conf={"spark.driver.memory": "16g"}
    )
    fact_path = build(spark)
    out = {"n_rows": N_ROWS, "hot_share": HOT_SHARE, "conditions": {}}
    sums = {}
    for mode in ("static", "aqe", "salted"):
        best, checksum, skew_marks = run_condition(spark, fact_path, mode)
        out["conditions"][mode] = {
            "sec": round(best, 2),
            **({"skew_marks": skew_marks} if skew_marks is not None else {}),
        }
        sums[mode] = checksum
    if len(set(sums.values())) != 1:
        raise SystemExit(f"CHECKSUM MISMATCH across conditions: {sums}")
    out["checksum_agree"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
