"""Round-over-round bench comparison FROM COMMITTED ARTIFACTS ONLY.

The r8 verdict's one process defect: the PLANS.md round-over-round
analysis was computed from an uncommitted sibling run and disagreed
with the committed BENCH_DETAIL.json (+5.5% claimed vs +13.4%
committed). This tool closes that gap structurally: it reads two
BENCH_DETAIL/BENCH_r{N}-format JSON files — e.g. the previous round's
via `git show <commit>:BENCH_DETAIL.json > /tmp/prev.json` — and
prints the common-entry totals, the per-query ratio distribution, and
the worst movers. Every number in the PLANS.md comparison section is
this tool's output, so the analysis is reproducible by anyone with
the repo history.

Usage: python tools/bench_compare.py PREV.json CURR.json [--top N]

Note on methodology fields: the tool prints each file's `repeats` /
`timing` and warns when they differ (rounds 3-8 were warm min-of-2;
round 9+ is median-of-3 — totals across a methodology change are NOT
comparable, which the warning says out loud).
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> int:
    argv = sys.argv[1:]
    top = 8
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    prev, curr = load(args[0]), load(args[1])
    pq, cq = prev["queries"], curr["queries"]

    p_meth = (prev.get("repeats"), prev.get("timing"))
    c_meth = (curr.get("repeats"), curr.get("timing"))
    print(f"prev: sf={prev.get('sf')} repeats={p_meth[0]} timing={p_meth[1]}")
    print(f"curr: sf={curr.get('sf')} repeats={c_meth[0]} timing={c_meth[1]}")
    if p_meth != c_meth:
        print(
            "WARNING: methodology differs between the two files — totals "
            "are not directly comparable across a repeats/timing change"
        )

    common = sorted(set(pq) & set(cq))
    only_prev = sorted(set(pq) - set(cq))
    only_curr = sorted(set(cq) - set(pq))
    pt = sum(pq[k] for k in common)
    ct = sum(cq[k] for k in common)
    print(
        f"\ncommon {len(common)} entries: {pt:.1f} -> {ct:.1f} s "
        f"({(ct - pt) / pt * 100:+.1f}%)"
    )
    if only_prev:
        print(f"dropped ({len(only_prev)}): {', '.join(only_prev)}")
    if only_curr:
        new_cost = sum(cq[k] for k in only_curr)
        print(
            f"added ({len(only_curr)}, {new_cost:.1f} s): "
            f"{', '.join(only_curr)}"
        )

    ratios = sorted(
        ((cq[k] / pq[k] if pq[k] else float("inf")), k) for k in common
    )
    rvals = [r for r, _ in ratios]
    qs = statistics.quantiles(rvals, n=4)
    print(
        f"ratio distribution: min {rvals[0]:.2f} / q1 {qs[0]:.2f} / "
        f"median {statistics.median(rvals):.3f} / q3 {qs[2]:.2f} / "
        f"max {rvals[-1]:.2f}"
    )
    print(f"\nworst {top} regressions (curr/prev):")
    for r, k in ratios[-top:][::-1]:
        print(f"  {k}: {pq[k]:.2f} -> {cq[k]:.2f} s ({r:.2f}x)")
    print(f"\nbest {top} improvements:")
    for r, k in ratios[:top]:
        print(f"  {k}: {pq[k]:.2f} -> {cq[k]:.2f} s ({r:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
