"""Attribute the three round-11 'weak movers' code-vs-box (r11 verdict
task #1): the driver's r11 bench read curate_documents 1.59x,
bpe_tokenize_docs 1.45x and scrub_boilerplate_docs 1.53x vs r10, while
the builder's quiet-box run on the same code read +0.4% overall. All
three gates consume ``operators.dedup.normalize_text``, whose body
changed in round 11 (Unicode parity sweep: SpecialCasing pre-translate
+ explicit ``[ \\t\\n\\x0B\\f\\r]`` class + btrim edge strip), so the
movers are confounded: named expression cost or box contamination.

This probe de-confounds them by running BOTH normalize bodies on the
SAME session, INTERLEAVED per sweep (r10 body, then r11 body, each over
all three gates, repeated) — paired samples under near-identical box
conditions, the fingerprint_probe.py pattern extended with the bench
harness's interleaving:

- ``r10`` — ``trim(regexp_replace(lower(col), '\\s+', ' '))`` — the
  round-10 body (WRONG cross-engine on İ/Σ/VT text by the r11 sweep's
  evidence; timing reference only).
- ``r11`` — the shipped body (translate + explicit class + btrim).

Output: per (gate, variant) raw runs in sweep order, medians, and the
r11/r10 median ratio per gate with a load-average column per sweep.
A ratio ~1.0 attributes the driver movers to box contamination; a
ratio matching the driver's 1.45-1.59x names the expression cost.

Usage: python tools/normalize_ab_probe.py [sf_dir] [sweeps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

GATES = ["curate_documents", "bpe_tokenize_docs", "scrub_boilerplate_docs"]


def r10_normalize(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from cdk_datalake_ingest_spark import queries
    from cdk_datalake_ingest_spark.functions import text as text_mod
    from cdk_datalake_ingest_spark.operators import dedup
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("normalize-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    r11_normalize = dedup.normalize_text
    variants = {"r10": r10_normalize, "r11": r11_normalize}

    def with_variant(fn):
        # queries.py imports normalize_text function-locally (resolves
        # from the dedup module at call time); text.py binds it at
        # module import — patch both, exactly like fingerprint_probe
        # patches word_shingles.
        dedup.normalize_text = fn
        text_mod.normalize_text = fn

    def run_gate(name: str) -> float:
        t0 = time.perf_counter()
        queries.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    results: dict[tuple[str, str], list[float]] = {
        (g, v): [] for g in GATES for v in variants
    }
    try:
        # warm pass: both variants once, untimed (JIT/footers)
        for v, fn in variants.items():
            with_variant(fn)
            for g in GATES:
                run_gate(g)
        for sweep in range(sweeps):
            load = os.getloadavg()[0]
            for v, fn in variants.items():
                with_variant(fn)
                for g in GATES:
                    results[(g, v)].append(run_gate(g))
            print(
                f"sweep {sweep}: load={load:.2f} "
                + " ".join(
                    f"{g}[{v}]={results[(g, v)][-1]:.2f}"
                    for g in GATES
                    for v in variants
                ),
                flush=True,
            )
    finally:
        with_variant(r11_normalize)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    print(f"\n{'gate':30s} {'r10_med':>8s} {'r11_med':>8s} {'r11/r10':>8s}")
    for g in GATES:
        m10 = median(results[(g, "r10")])
        m11 = median(results[(g, "r11")])
        print(
            f"{g:30s} {m10:8.3f} {m11:8.3f} {m11 / m10:8.3f}  "
            f"runs_r10={results[(g, 'r10')]} runs_r11={results[(g, 'r11')]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
