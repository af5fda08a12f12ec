"""100x spot rehearsal (r11 verdict task #6): the four rows whose 10x
ratios looked superlinear-ish in SCALE.md — `merge_delete_window_events`
(4.2x at 10x), `merge_upsert_events` (3.7x), `table_restore_roundtrip_events`
(2.8x) and `scrub_boilerplate_docs` — re-measured at a synthesized 100x
to decide fixed-overhead-emerging vs real O(table) growth: if the 10x
ratio was fixed cost amortizing away, the 100x/10x ratio should approach
the data ratio (10) from BELOW and the 100x/1x ratio stay well under 100;
genuine superlinear growth would push 100x/10x ABOVE 10.

Corpus synthesis follows tools/scale_rehearsal.py exactly (shifted ids;
token-bijected per-copy suffixes for documents so per-copy dup/boilerplate
structure is preserved and cross-copy similarity collapses), extended to
100 copies with two-letter suffixes. Events/documents only — the four
queries touch nothing else. Plan-shape multisets are compared 1x vs 100x
like the 10x rehearsal.

Usage: python tools/scale100_probe.py   (prints rows; paste into SCALE.md)
"""

from __future__ import annotations

import os
import re
import sys
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BASE = "/root/testdata/sf0.1"
SCALE_DIR = "/tmp/spark_graft_scale100"
COPIES = 100
QUERIES = [
    "merge_upsert_events",
    "merge_delete_window_events",
    "table_restore_roundtrip_events",
    "scrub_boilerplate_docs",
]
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    if Path(SCALE_DIR, "_DONE").exists():
        return
    Path(SCALE_DIR).mkdir(parents=True, exist_ok=True)
    from cdk_datalake_ingest_spark.functions.text import STOPWORDS

    stop_union = sorted(set().union(*STOPWORDS.values()))
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for k in range(COPIES):
        if k == 0:
            text = F.col("text")
        else:
            suf = f"_q{chr(ord('a') + k // 26)}{chr(ord('a') + k % 26)}"
            toks = F.filter(
                F.split(F.col("text"), r"\s+"), lambda t: t != ""
            )
            text = F.array_join(
                F.transform(
                    toks,
                    lambda t: F.when(
                        F.lower(t).isin(stop_union), t
                    ).otherwise(F.concat(t, F.lit(suf))),
                ),
                " ",
            )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{SCALE_DIR}/documents.parquet"
    )

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    parts = []
    for k in range(COPIES):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(k * 1_000_000_000)).alias(
                    "event_id"
                ),
                "ts",
                (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{SCALE_DIR}/events.parquet"
    )

    for t in TABLES:
        dst = Path(SCALE_DIR, f"{t}.parquet")
        if not dst.exists():
            os.symlink(f"{BASE}/{t}.parquet", dst)
    Path(SCALE_DIR, "_DONE").touch()


def plan_shape(df) -> Counter:
    txt = df._jdf.queryExecution().executedPlan().toString()
    names = re.findall(r"^[\s:+*-]*([A-Za-z][A-Za-z0-9]+)", txt, re.M)
    drop = {"ReadSchema", "PushedFilters", "Batched", "Location", "Output"}
    return Counter(n for n in names if n not in drop)


def time_query(fn, spark, sf_dir: str, repeats: int = 2) -> tuple[float, Counter]:
    best, shape = float("inf"), None
    for _ in range(repeats):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        shape = plan_shape(df)
    return best, shape


def main() -> None:
    from cdk_datalake_ingest_spark import queries
    from cdk_datalake_ingest_spark.session import get_spark

    # 16g heap: the engine default (local-mode 1g) is the honest bench
    # constraint, but 100x scrub's posexplode working set needs real
    # executor memory — on a cluster this is ordinary executor sizing
    # (scale_profile documents 16 GB/executor), not a plan change.
    spark = get_spark(
        "scale100", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)

    print(f"{'query':35s} {'1x':>8s} {'100x':>9s} {'ratio':>7s}  shape-delta")
    for name in QUERIES:
        fn = queries.QUERIES[name]
        t1, s1 = time_query(fn, spark, BASE)
        t100, s100 = time_query(fn, spark, SCALE_DIR)
        delta = {
            k: s100.get(k, 0) - s1.get(k, 0)
            for k in set(s1) | set(s100)
            if s100.get(k, 0) != s1.get(k, 0)
        }
        print(
            f"{name:35s} {t1:8.2f} {t100:9.2f} {t100 / t1:7.2f}  "
            f"{delta if delta else 'identical'}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
