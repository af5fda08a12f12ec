"""Sessionizer scale probe: measure the Python-stateful sessionizer
(`streaming/sessionize.py`, applyInPandasWithState) against the
JVM-native count-only twin (`F.session_window` aggregate) at 1x
(sf0.1) and the synthesized 10x corpus (tools/scale_rehearsal.py).

For each (scale, variant) it reports wall seconds, input rows,
rows/sec, and the state-store metrics from the final streaming
progress (state rows + bytes) — the evidence behind SCALE.md's
sessionizer row and the crossover rule, which as of round 9 is CODE,
not a recommendation: `streaming/sessionize.py:sessionize(mode=
"auto")` dispatches aggregate-shaped payloads to the JVM
`session_window` aggregate and routes to the Python stateful
operator only for `emit_on_gap` / explicit `mode="stateful"` —
the Python topology earns its per-group Arrow overhead only when
the session semantics need it (emit-on-gap, per-element state,
in-batch event-order payloads).

Usage: python tools/sessionize_scale_probe.py  (prints one JSON line
per run; ~2 min).
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from cdk_datalake_ingest_spark.session import get_spark  # noqa: E402
from cdk_datalake_ingest_spark.sources.parquet import ts_us_expr  # noqa: E402
from cdk_datalake_ingest_spark.streaming.sessionize import (  # noqa: E402
    sessionize_stream,
)
from tools.scale_rehearsal import SCALE_DIR, build_corpus  # noqa: E402

FILES_PER_DROP = 4


def _stage_drop(spark, sf_dir: str) -> tuple[str, object, int]:
    """Stage the events table as a 3-slice time-ordered drop (same
    mechanics as the streaming_sessionize_events gate, queries.py)."""
    ev_raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev_raw.select(
        "event_id",
        "user_id",
        F.timestamp_micros(ts_us_expr(ev_raw)).alias("ts"),
        "value",
    )
    n_rows = ev.count()
    tmp = tempfile.mkdtemp(prefix="cdk_sess_probe_")
    drop = f"{tmp}/drop"
    os.makedirs(drop)
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(-1, -1, max_ts + dt.timedelta(days=2), 0.0)], schema=ev.schema
    )
    slices = [
        ev.filter(F.dayofmonth("ts") <= 10),
        ev.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)),
        ev.filter(F.dayofmonth("ts") > 20).unionByName(sentinel),
    ]
    for i, part in enumerate(slices):
        stage_dir = f"{tmp}/slice{i}"
        part.repartition(FILES_PER_DROP).write.parquet(stage_dir)
        for j, src_file in enumerate(
            sorted(glob.glob(f"{stage_dir}/part-*.parquet"))
        ):
            dst = f"{drop}/{i:03d}_{j}.parquet"
            os.rename(src_file, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    schema = ev.schema
    return tmp, schema, n_rows


def _drain(spark, result, tmp: str, tag: str) -> dict:
    q = (
        result.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{tmp}/out_{tag}")
        .option("checkpointLocation", f"{tmp}/cp_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p]
    input_rows = sum(p["numInputRows"] for p in progresses)
    state = {}
    for p in reversed(progresses):
        ops = p.get("stateOperators") or []
        if ops:
            state = {
                "state_rows": ops[0].get("numRowsTotal"),
                "state_bytes": ops[0].get("memoryUsedBytes"),
                "operator": ops[0].get("operatorName"),
            }
            break
    return {"input_rows": input_rows, **state}


def probe(spark, sf_dir: str, label: str) -> None:
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    tmp, schema, n_rows = _stage_drop(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        # Python-stateful sessionizer (full payload, exact total_value)
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(FILES_PER_DROP))
            .parquet(f"{tmp}/drop")
        )
        t0 = time.perf_counter()
        stats = _drain(
            spark, sessionize_stream(src, gap_minutes=30, ts_col="ts"),
            tmp, "pandas_state",
        )
        el = time.perf_counter() - t0
        print(json.dumps({
            "probe": "sessionize", "scale": label,
            "variant": "applyInPandasWithState",
            "sec": round(el, 2), "events": n_rows,
            "rows_per_sec": round(n_rows / el), **stats,
        }), flush=True)

        # JVM-native count-only twin: session_window aggregate
        src2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(FILES_PER_DROP))
            .parquet(f"{tmp}/drop")
        )
        counted = (
            src2.withWatermark("ts", "30 minutes")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").alias("n_events"))
        )
        t0 = time.perf_counter()
        stats = _drain(spark, counted, tmp, "session_window")
        el = time.perf_counter() - t0
        print(json.dumps({
            "probe": "sessionize", "scale": label,
            "variant": "session_window(JVM)",
            "sec": round(el, 2), "events": n_rows,
            "rows_per_sec": round(n_rows / el), **stats,
        }), flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main() -> None:
    spark = get_spark("sessionize-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe(spark, "/root/testdata/sf0.1", "1x")
    build_corpus(spark)
    probe(spark, SCALE_DIR, "10x")
    spark.stop()


if __name__ == "__main__":
    main()
