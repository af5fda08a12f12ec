"""Attribute the fingerprint_docs r10 bench move (1.58 -> 2.04 s, the
one mover both independent r10 runs agreed on) to its code change:
the r10 review added an empty/NULL-doc guard to
``operators.dedup.word_shingles`` (``count`` became a CaseWhen that
re-references the normalized-text regex), and ``fingerprint_docs``
evaluates that expression in SIX unconditional positions per row
(doc_fingerprint references the shingle array twice, the n_shingles
column once, and each reference expands count into slice bounds +
the final emptiness when).

This probe times the gate at sf0.1 under three interchangeable
``word_shingles`` bodies:

- ``current``   — the r10 guard as committed (CaseWhen count).
- ``pre_guard`` — the r9 body (no guard; WRONG for the n=1 edge on
  empty docs, identical output for n>=2 — timing reference only).
- ``hoisted``   — the guard folded into the token array itself
  (``when(length(norm) > 0, split(norm)).otherwise(array())``), so
  ``count`` returns to the r9 arithmetic shape and the conditional
  regex reference appears once per tokens-subtree instead of inside
  every count reference.  Output-identical to ``current`` for all n
  (NULL/empty norm -> empty tokens -> count 0 even at n=1).

Usage: python tools/fingerprint_probe.py [sf_dir] [repeats]
Prints one line per (variant, run) plus a median summary; verifies
all variants hash-agree on the fixture before timing.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _make_variants():
    def pre_guard(col, n: int = 3):
        tokens = F.split(
            F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " "
        )
        count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
        shingle = F.slice(tokens, n, count)
        for k in reversed(range(n - 1)):
            shifted = F.slice(tokens, k + 1, count)
            shingle = F.zip_with(
                shifted, shingle, lambda x, y: F.concat_ws(" ", x, y)
            )
        return F.when(count > 0, shingle).otherwise(
            F.array().cast("array<string>")
        )

    def hoisted(col, n: int = 3):
        norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
        tokens = F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
            F.array().cast("array<string>")
        )
        count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
        shingle = F.slice(tokens, n, count)
        for k in reversed(range(n - 1)):
            shifted = F.slice(tokens, k + 1, count)
            shingle = F.zip_with(
                shifted, shingle, lambda x, y: F.concat_ws(" ", x, y)
            )
        return F.when(count > 0, shingle).otherwise(
            F.array().cast("array<string>")
        )

    def branch_free(col, n: int = 3):
        # normalized text never contains an empty token EXCEPT as the
        # lone [''] split('') yields, so array_remove(tokens, '') is
        # exactly the empty-doc guard — with no conditional in the
        # expression tree (CaseWhen children are excluded from
        # whole-stage codegen subexpression elimination, so every
        # reference to a guarded count re-evaluates the normalize
        # regex; an unconditional tree is collapsed once per row).
        # NULL norm: tokens NULL -> size -1 (legacy sizeOfNull) ->
        # count greatest(-1-(n-1), 0) = 0 -> empty array, same output.
        norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
        tokens = F.array_remove(F.split(norm, " "), "")
        count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
        shingle = F.slice(tokens, n, count)
        for k in reversed(range(n - 1)):
            shifted = F.slice(tokens, k + 1, count)
            shingle = F.zip_with(
                shifted, shingle, lambda x, y: F.concat_ws(" ", x, y)
            )
        return F.when(count > 0, shingle).otherwise(
            F.array().cast("array<string>")
        )

    return {
        "pre_guard": pre_guard,
        "hoisted": hoisted,
        "branch_free": branch_free,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from cdk_datalake_ingest_spark import queries
    from cdk_datalake_ingest_spark.functions import text as text_mod
    from cdk_datalake_ingest_spark.operators import dedup
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("fingerprint-probe")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {"current": dedup.word_shingles, **_make_variants()}

    def run_gate():
        return queries.fingerprint_docs(spark, sf_dir)

    def with_variant(fn):
        # text.py binds word_shingles by name at import; patch both
        dedup.word_shingles = fn
        text_mod.word_shingles = fn

    original = variants["current"]
    try:
        # correctness first: all variants must agree on the fixture
        baseline = None
        for name, fn in variants.items():
            with_variant(fn)
            rows = sorted(
                (r["doc_id"], r["fingerprint"], r["n_shingles"])
                for r in run_gate().collect()
            )
            if baseline is None:
                baseline = rows
            assert rows == baseline, f"variant {name} diverges"
        print(f"variants agree on {len(baseline)} rows at {sf_dir}")

        # one warm pass (JIT/footers), then timed repeats per variant
        with_variant(original)
        run_gate().write.format("noop").mode("overwrite").save()
        results: dict[str, list[float]] = {}
        for name, fn in variants.items():
            with_variant(fn)
            runs = []
            for i in range(repeats):
                t0 = time.perf_counter()
                run_gate().write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            results[name] = runs
            print(f"{name}: runs={runs}")
        for name, runs in results.items():
            srt = sorted(runs)
            mid = len(srt) // 2
            med = srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2
            print(f"{name}: median={med:.3f} min={srt[0]:.3f}")
    finally:
        with_variant(original)


if __name__ == "__main__":
    main()
