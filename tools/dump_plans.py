"""Regenerate PLANS.md: formatted physical plans for the headline
queries, with a note on why each plan is the right one at 100 TB.

Usage: python tools/dump_plans.py  (writes /root/repo/PLANS.md)
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.001"

# query -> what to look at in the plan (the scale argument)
NOTES = {
    "q01_pricing_summary": (
        "Single scan, partial-aggregate before the one shuffle "
        "(HashAggregate x2), `l_shipdate` predicate in PushedFilters, "
        "ReadSchema pruned to the 7 used columns. Scales linearly."
    ),
    "q05_region_revenue": (
        "5-way star: every dimension side is a BroadcastHashJoin — the "
        "lineitem fact table is never shuffled for the joins; the only "
        "exchange is the final group-by. At 100 TB the fact scan streams "
        "once through the broadcast probes."
    ),
    "stage_pipeline_lineitem": (
        "The whole DSL column program collapses into two Projects over "
        "the scan (WholeStageCodegen), W1 dedup is one Exchange with "
        "WindowGroupLimit applied on BOTH sides of the shuffle (partial "
        "top-1 per key before data moves), write-order is "
        "sortWithinPartitions (no global sort / range exchange)."
    ),
    "incremental_between_events": (
        "The incremental extract: microsecond bounds restated in the "
        "scan's storage units (bigint ns or same-type timestamp "
        "literals) so PushedFilters carries the time range — the scan "
        "skips row groups / partitions instead of reading the table."
    ),
    "stratified_sample_docs": (
        "Deterministic interleave WITHOUT a global sort: per-shard "
        "row_number (shard = first hex byte of the hash sort key, a "
        "prefix — so shard-local order equals global order) plus a "
        "256-row offset aggregate. No task sees more than ~1/256 of "
        "the sample; the old plan funneled every row through one "
        "window task."
    ),
    "pack_sequences_docs": (
        "Token cumsum sharded by (lang, doc_id range): each window "
        "partition is at most PACK_SHARD_WIDTH rows, so a dominant "
        "language no longer serializes through one task; shard offsets "
        "come from a corpus/width-row aggregate, and the result is "
        "byte-identical to the global per-language cumsum."
    ),
    "decontaminate_docs": (
        "Eval-leak scan: the held-out slice's distinct 5-gram set "
        "broadcasts (benchmarks are MBs, corpora are TBs); the "
        "training text streams map-side through the broadcast probe — "
        "no SortMergeJoin, no shuffle of corpus text."
    ),
    "range_join_purchase_clicks": (
        "Interval join via bucket-explode + equi-join on (user_id, "
        "bucket): BroadcastHash at fixture size, SortMerge/ShuffledHash "
        "at scale — never BroadcastNestedLoopJoin, which is what a raw "
        "inequality join degenerates to. Explosion factor is "
        "ceil(span/bucket)+1 = 2 rows per interval."
    ),
    "asof_purchase_click": (
        "As-of join as union + window carry: one Exchange on the key, "
        "one Sort, no per-row probing; the window runs in a single pass "
        "per key group."
    ),
    "minhash_near_dup_docs": (
        "MinHash+LSH: signatures computed once (cached), band explosion "
        "shuffles on (band, hash-bucket) so only same-bucket candidates "
        "meet; the exact-verify join touches candidate pairs, not the "
        "n^2 cross product."
    ),
    "continuous_rollup_events": (
        "Incremental view maintenance: the refresh scan carries the "
        "watermark range predicate (PushedFilters), aggregation is "
        "partial before the shuffle, and the merge touches only "
        "lookback+new buckets of the rollup table."
    ),
    "q06_forecast_revenue": (
        "The canonical pushdown probe: both shipdate bounds, the "
        "quantity cap, AND the discount band all reach PushedFilters — "
        "the band filters exactly in DECIMAL (cast expressions cannot "
        "push down) with redundant wider raw-double bounds restated in "
        "storage units for the scan. ReadSchema is pruned to the 4 used "
        "columns; the only exchange is the 1-row final combine."
    ),
    "q19_bracket_revenue": (
        "Disjunctive brackets over a join: the shared p_partkey "
        "equi-condition keeps a BroadcastHashJoin (part is the built "
        "side) and the three (brand, size, quantity) OR-brackets "
        "evaluate as a post-join filter — never a nested-loop or "
        "cartesian plan (pinned in tests/test_plans.py)."
    ),
    "temperature_mixture_docs": (
        "Data mixing at scale: the ~|sources|-row rate table rejoins "
        "the corpus by BroadcastHashJoin and the md5-threshold keep "
        "decision is a stateless map — no Window, no global sort; the "
        "corpus is read twice (count pass + keep pass), both passes "
        "column-pruned to 3 columns."
    ),
    "q08_market_share": (
        "7-relation star with nation in two roles: part/nation/nation/"
        "region all BroadcastHashJoin, orders and customer hash-joined "
        "once each, lineitem never shuffled for a dimension; the "
        "conditional market-share ratio folds into the final per-year "
        "combine (2 rows). The widest relational plan in the suite — "
        "the one to watch when join reordering changes."
    ),
    "q21_waiting_suppliers": (
        "EXISTS + NOT EXISTS double correlation: both compile to "
        "hash semi/anti joins on the orderkey equi-condition with the "
        "suppkey inequality as a join-condition rider — no nested "
        "loop, no cartesian (pinned in tests/test_plans.py). The late "
        "set is filtered before either probe, so the semi/anti build "
        "sides are the small late fraction, not all of lineitem."
    ),
    "unigram_lm_docs": (
        "Two-pass corpus LM scoring: the exploded token stream "
        "shuffles once to build the Zipf-sized vocab; the probability "
        "relation then broadcasts back onto a RE-EXPLODED stream "
        "(BroadcastHashJoin — the corpus-sized side is never shuffled "
        "for the join), and the per-doc combine is the only remaining "
        "exchange. At 100 TB the vocab table is MBs, the stream TBs — "
        "the broadcast direction is the whole ballgame."
    ),
    "chunk_docs_sliding": (
        "Pure per-row generator: sequence → explode → slice with no "
        "Exchange, no Window, no Python eval (pinned in CI). Chunking "
        "100 TB is embarrassingly parallel and this plan keeps it so — "
        "it pipelines with the scan and the downstream write."
    ),
    "semantic_dedup_embeddings": (
        "SemDeDup: k-means assignment is a broadcast-literal narrow "
        "map (no join, one corpus scan per Lloyd iteration, k-row "
        "driver collect); the near-dup pair stage is an equi-join on "
        "cluster_id so candidate volume is sum(|cluster|^2), bounded "
        "by the k knob — never the corpus-global cross join the naive "
        "formulation implies."
    ),
    "q09_product_profit": (
        "Derived-partsupp profit rollup: partsupp is a zero-shuffle "
        "Generate over the part scan (no Exchange in its derivation), "
        "part/nation broadcast, the fact joins partsupp on the "
        "composite (partkey, suppkey) key as a hash join, and the "
        "decimal profit subtraction partial-aggregates before the one "
        "group-by exchange. At 100 TB only lineitem is big and it is "
        "scanned once."
    ),
    "substring_dedup_docs": (
        "Exact substring dedup (Lee et al. 2022): windows shuffle as "
        "16-byte md5 digests (never the L-token text — the exchange "
        "volume is tokens x 16 B), the duplicated-window relation "
        "joins back on the same key, and the rewrite is a native "
        "filter-by-position. The distributed stand-in for the paper's "
        "suffix array: two keyed exchanges, no Python, no cross join."
    ),
    "gopher_rules_docs": (
        "Gopher rule-based quality filter: every rule (word-count "
        "band, mean-word-length band, alpha-word fraction, stopword "
        "hits) is a native expression over one tokenize of one scan — "
        "no Exchange, no Window, no Python anywhere in the plan. "
        "Filtering 100 TB is a single pipelined map; it fuses with "
        "the scan and whatever writes the survivors."
    ),
    "nb_quality_filter_docs": (
        "Classifier-based quality filter, fastText shape with a "
        "closed-form Naive Bayes: one exploded-token shuffle builds "
        "the Zipf-sized (token, llr) model, scalar totals ride a "
        "broadcast one-row cross join into the model projection, and "
        "scoring re-explodes the corpus against the BROADCAST model "
        "(the corpus-sized stream is never shuffled for the join) "
        "before the per-doc combine. Same broadcast direction as the "
        "unigram LM: model in MBs, corpus in TBs."
    ),
    "incremental_minhash_ingest_docs": (
        "Crawl-ingest near-dup: only the incoming batch is shingled; "
        "its banded signatures are PINNED broadcast into the "
        "candidate join, so the persisted corpus index (bands + "
        "shingle sets) STREAMS through the probe without an index-"
        "side Exchange. The exact-verify join touches candidate ids "
        "only. At 100 TB corpus / GB-scale batches the per-batch cost "
        "is O(batch + index scan), not O(corpus shuffle) — re-keying "
        "the corpus on every snapshot is exactly what this avoids."
    ),
    "kmeans_train_hash_docs": (
        "The split-out quantizer training gate (the cost round 5's "
        "memoization hid): per Lloyd iteration one corpus scan, a "
        "k-row partial-aggregated centroid combine, and a k-row "
        "driver collect — assignment itself is a broadcast-literal "
        "narrow map (one Arrow kernel), no join, no Window. Iteration "
        "cost at 100 TB is scan-bound and the shuffle carries k rows. "
        "The dumped plan below is just the RESULT relation (the k x "
        "dim centroid table, driver-materialized by design — it IS "
        "the model); the per-iteration assignment/combine plans are "
        "the ones described above and are pinned in tests/"
        "test_plans.py."
    ),
    "ann_lsh_multiprobe_topk": (
        "Multi-probe LSH top-k: each query explodes to its own bucket "
        "plus the n_planes Hamming-1 neighbor buckets (9 probe keys "
        "at n_planes=8), and the query side — still tiny — broadcasts "
        "into the bucket equi-join, so the corpus is bucketed in a "
        "narrow projection and never shuffled ON THE BUCKET KEY. The "
        "corpus-side Exchange in this dump is the small-input "
        "parallelism shim (ensure_parallelism: round-robin only when "
        "partitions < slots — a no-op on a real multi-file table); "
        "the only keyed exchange is the per-query rank window over "
        "candidates, WindowGroupLimit on both sides so partial top-k "
        "runs before data moves. (n_planes+1)x recall probing without "
        "widening the corpus-side plan at all."
    ),
    "table_change_feed_events": (
        "Snapshot-diff change data feed (the Delta CDF table_changes "
        "role over ManagedTable's versioned snapshots): ONE full-outer "
        "join keyed on the merge keys, then each joined row maps to an "
        "array of tagged change structs that a single Generate "
        "explodes — insert/delete one struct, update a pre/post PAIR. "
        "A filter-union of four projections would have made Catalyst "
        "re-plan (and re-SCAN) the join per branch — 4x the snapshot "
        "reads; this dump shows each snapshot scanned ONCE. The "
        "unique-key invariant rides the same keyed shuffle as a "
        "raise_error woven into the key column — no extra pass. At "
        "100 TB the cost floor for any snapshot diff is O(old + new) "
        "through one keyed exchange per side — this plan is exactly "
        "that, never an all-pairs or full-row-key comparison."
    ),
}

#: appended verbatim — control-plane-dominated chain whose interesting
#: structure is the state machinery, not a Spark plan.
DMS_NOTE = """
## dms_full_load_pipeline_orders

Control-plane-dominated e2e gate (round 4): the instance/task state machine and
landing promotion are O(#tables)/O(#files) driver-side metadata; the data plane
is (a) a strided JDBC scan — `MaxFullLoadSubTasks` non-overlapping key-range
partitions, one connection each, the same parallel-unload shape DMS uses — into
a distributed gzip-CSV write, then (b) a schema-less CSV scan → partial
aggregate → one exchange. Neither pass materializes anything on the driver
beyond the 2-scalar min/max stride probe, so at 100 TB the chain is bounded by
the source RDBMS's read bandwidth, exactly like the service it models. No plan
dump: the interesting structure is the status/state machinery (pinned in
tests/test_replication_landing.py), not the trivially-shaped scans.
"""


def main() -> int:
    from cdk_datalake_ingest_spark.queries import QUERIES
    from cdk_datalake_ingest_spark.session import get_spark

    spark = get_spark("dump-plans", shuffle_partitions=8)
    out = [
        "# PLANS — physical plans of the headline queries\n",
        "Generated by `python tools/dump_plans.py` (sf0.001 fixtures; the plan\n"
        "shape, not the sizes, is the point). For each query: why this is the\n"
        "plan you want on a 1000-executor cluster at 100 TB.\n",
    ]
    for name, note in NOTES.items():
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + scan details, drop the (long) per-node
        # attribute dumps except scans (PushedFilters/ReadSchema live there)
        tree, _, details = plan.partition("\n\n")
        scan_bits = [
            b for b in details.split("\n\n")
            if "PushedFilters" in b or "ReadSchema" in b
        ]
        out.append(f"\n## {name}\n\n{note}\n")
        out.append("```\n" + tree.strip() + "\n")
        for b in scan_bits:
            out.append("\n" + b.strip() + "\n")
        out.append("```\n")
    out.append(DMS_NOTE)
    Path(__file__).resolve().parents[1].joinpath("PLANS.md").write_text(
        "".join(out)
    )
    print("wrote PLANS.md")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
