"""BPE apply cost vs model length — the measurement behind the
round-10 `bpe_tokenize` redesign (r9 verdict task #1).

The inline path interprets the merge chain per word OCCURRENCE inside
a HOF lambda (~6 expression nodes per merge per occurrence, never
whole-stage-codegen'd); the vocab path segments the DISTINCT-word
relation once per 32-merge stage and joins the map back, so growing
the model adds vocabulary-sized stages, never corpus-sized work.
This probe measures both shapes at sf0.1 as the model grows: the 6
trained merges padded with non-matching (digit-bearing, so never in a
letters-only word) no-op pairs — the conservative cost shape, since a
no-op merge still pays its full replace scan per stage without
shrinking any symbol string.

Usage: python tools/bpe_scale_probe.py
Prints one JSON line per (mode, n_merges) with min-of-2 warm wall
seconds; paste the table into SCALE.md's static section
(tools/scale_rehearsal.py:_bpe_apply_section keeps it surviving
rehearsal rewrites).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
LENGTHS = [6, 32, 128, 512]


def main() -> None:
    from cdk_datalake_ingest_spark.operators.corpus import (
        BPE_SEGMENT_MAX_MERGES,
        bpe_tokenize,
        bpe_train_merges,
    )
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    trained = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_merges(docs, n_merges=6).collect()
    ]

    def model(n: int) -> list[tuple[str, str]]:
        pad = [(f"q{i}0", f"z{i}0") for i in range(n - len(trained))]
        return (trained + pad)[:n]

    def timed(mode: str, merges) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            bpe_tokenize(docs, merges, mode=mode).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    for n in LENGTHS:
        m = model(n)
        row = {"n_merges": n, "vocab_sec": timed("vocab", m)}
        if n <= BPE_SEGMENT_MAX_MERGES:
            row["inline_sec"] = timed("inline", m)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
