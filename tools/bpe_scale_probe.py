"""BPE cost vs model length — apply (r10) and train (r11) sides.

APPLY (default mode; the measurement behind the round-10
`bpe_tokenize` redesign, r9 verdict task #1): the inline path
interprets the merge chain per word OCCURRENCE inside a HOF lambda
(~6 expression nodes per merge per occurrence, never
whole-stage-codegen'd); the vocab path segments the DISTINCT-word
relation once per 32-merge stage and joins the map back, so growing
the model adds vocabulary-sized stages, never corpus-sized work.
This probe measures both shapes at sf0.1 as the model grows: the 6
trained merges padded with non-matching (digit-bearing, so never in a
letters-only word) no-op pairs — the conservative cost shape, since a
no-op merge still pays its full replace scan per stage without
shrinking any symbol string.

TRAIN (``--train``; r10 verdict task #4): `bpe_train_merges` does one
driver round-trip per merge (exact sequential BPE); at production
model sizes the fixed per-job cost dominates.  This mode measures
wall time vs n_merges for batch_size=1 (exact) and a batched run
(the r11 top-M disjoint relaxation) so the crossover is a committed
curve, not prose.  Training runs ONCE per point (min-of-2 would
double multi-minute points; the job-count story is deterministic).

Usage:
  python tools/bpe_scale_probe.py [lengths...]          # apply side
  python tools/bpe_scale_probe.py --train [lengths...]  # train side
  python tools/bpe_scale_probe.py --dir DIR [lengths...]  # other corpus
Apply defaults: 6 32 128 512 (r10 table) — pass e.g. 4096 32768 to
extend the curve to production model sizes (r12 verdict task #7: the
4k/32k points on the 10x corpus, --dir /tmp/spark_graft_scale10, pin
whether the BPE_EAGER_EVERY checkpoint cadence holds past 512).
Models >= 2048 merges run ONCE per point instead of min-of-2 (a 32k
apply is minutes; the stage-count story is deterministic).  Train
defaults: 64 256 1024.  Paste the rows into PLANS.md / SCALE.md
(tools/scale_rehearsal.py:_bpe_apply_section keeps the static apply
table surviving rehearsal rewrites).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
APPLY_LENGTHS = [6, 32, 128, 512]
TRAIN_LENGTHS = [64, 256, 1024]
TRAIN_BATCH = 16


def main() -> None:
    from cdk_datalake_ingest_spark.operators.corpus import (
        BPE_SEGMENT_MAX_MERGES,
        bpe_tokenize,
        bpe_train_merges,
    )
    from cdk_datalake_ingest_spark.session import get_spark

    args = sys.argv[1:]
    train_mode = "--train" in args
    sf_dir = SF_DIR
    if "--dir" in args:
        sf_dir = args[args.index("--dir") + 1]
    lengths = [int(a) for a in args if a.isdigit()] or (
        TRAIN_LENGTHS if train_mode else APPLY_LENGTHS
    )

    spark = get_spark("bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    if train_mode:
        for n in lengths:
            for batch in (1, TRAIN_BATCH):
                t0 = time.perf_counter()
                try:
                    got = bpe_train_merges(
                        docs, n_merges=n, batch_size=batch
                    ).collect()
                except ValueError as exc:  # vocabulary exhausted
                    print(
                        json.dumps(
                            {"n_merges": n, "batch_size": batch,
                             "error": str(exc)[:80]}
                        ),
                        flush=True,
                    )
                    continue
                print(
                    json.dumps(
                        {
                            "n_merges": n,
                            "batch_size": batch,
                            "train_sec": round(time.perf_counter() - t0, 2),
                            "rows": len(got),
                        }
                    ),
                    flush=True,
                )
        spark.stop()
        return

    trained = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_merges(docs, n_merges=6).collect()
    ]

    def model(n: int) -> list[tuple[str, str]]:
        pad = [(f"q{i}0", f"z{i}0") for i in range(n - len(trained))]
        return (trained + pad)[:n]

    def timed(mode: str, merges) -> float:
        reps = 1 if len(merges) >= 2048 else 2
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            bpe_tokenize(docs, merges, mode=mode).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    for n in lengths:
        m = model(n)
        row = {"n_merges": n, "vocab_sec": timed("vocab", m)}
        if n <= BPE_SEGMENT_MAX_MERGES:
            row["inline_sec"] = timed("inline", m)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
