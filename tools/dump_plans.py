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
    "bpe_train_merges_docs": (
        "BPE tokenizer-merge training: the corpus is scanned ONCE into "
        "the Zipf-sized (word, freq) vocabulary (one exploded-token "
        "exchange with map-side partial aggregation); each of the 6 "
        "merge iterations then runs entirely over the vocabulary "
        "relation — adjacent-pair explode, one small keyed exchange, a "
        "1-row argmax collect (model-sized, the lloyd_kmeans "
        "convention), and a narrow whole-stage-codegen'd replace "
        "projection. At 100 TB the corpus pass is the only big job; "
        "vocabulary is millions of rows, not billions, which is why "
        "production BPE trainers (and this plan) never iterate over "
        "the corpus. The dumped plan is the merge-table RESULT "
        "relation (a k-row local table — it IS the model); the "
        "per-iteration vocabulary plans are the ones described above."
    ),
    "bpe_tokenize_docs": (
        "BPE apply at corpus scale (round 10 — the trainer's other "
        "half): the DISTINCT-word vocabulary is segmented once through "
        "the merge chain (vocabulary-sized Projects, checkpointed "
        "every 32 merges), then the word→segmentation map joins back "
        "onto the posexploded token stream — BroadcastHashJoin here "
        "(AQE flips it to shuffle-hash only if the vocabulary outgrows "
        "the threshold), so per word occurrence the cost is ONE probe, "
        "never an interpreted per-occurrence merge chain. One keyed "
        "Exchange on doc_id reassembles document order (array_sort on "
        "(pos, segs) structs — partial ObjectHashAggregate before the "
        "shuffle), one keyed rejoin re-attaches the payload. At 100 TB "
        "with a 32k-merge model: ~1000 vocabulary-sized stages + two "
        "corpus-keyed shuffles, vs the rejected inline shape's ~1000 "
        "full-corpus checkpoint cascades. The per-occurrence guard "
        "(RLIKE over a lambda variable) is pinned ABSENT in "
        "tests/test_plans.py."
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
    "ann_lsh_suite_topk": (
        "LSH top-k at both probe radii (round-9 fold; the union's two "
        "branches share one _lsh_topk_impl). probe0 is the plain "
        "bucket equi-join; for probe1 each query explodes to its own bucket "
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
    "table_restore_roundtrip_events": (
        "RESTORE-as-new-commit roundtrip: the v1 build is one keyed "
        "dedup window; the restore itself is O(#files) hard-link "
        "metadata with NO dataflow, so the dumped plan is just the "
        "restored snapshot's pruned parquet scan — rollback of a "
        "100 TB table costs directory metadata, never a rewrite, and "
        "the rolled-back-from version stays time-travelable."
    ),
    "zorder_layout_events": (
        "Z-order layout rewrite: one approxQuantile pass for the "
        "per-column rank boundaries (driver-side, boundaries become a "
        "broadcast literal), one range Exchange on the single "
        "interleaved bigint z-value, in-partition sort, write. The "
        "dumped plan is the rewritten table's scan; the payoff — "
        "file-level min/max pruning on EVERY z-dimension — is raised "
        "in-line by the gate and pinned vs linear clustering in "
        "tests/test_table_maintenance.py. At 100 TB the rewrite is "
        "one shuffle of the table on a narrow key; every selective "
        "scan afterwards reads a fraction of the files."
    ),
    "ann_pq_adc_topk": (
        "Product-quantization ANN: codebook training is one Arrow "
        "distance-kernel pass + one m*k-row partially-aggregated "
        "combine per Lloyd iteration (model-sized collects); encoding "
        "is a narrow shuffle-free projection to m small ints; search "
        "broadcasts the queries WITH their round-6 ADC tables so the "
        "encoded corpus streams through a BroadcastNestedLoop probe "
        "scoring M array lookups per pair, and the only keyed "
        "exchange is the per-query rank window. At 100 TB the big "
        "operand is the code column — ~30x smaller than the vectors "
        "it replaces."
    ),
    "ann_ivfadc_topk": (
        "IVFADC (routing x compression): the corpus is assigned to "
        "its coarse list in the SAME narrow encode projection (no "
        "extra pass), the exploded query probe set broadcasts, and "
        "the ADC fold runs only inside probed lists — the PQ gate's "
        "cross join becomes a broadcast equi-join on list id, "
        "cutting candidates to n_probe/n_lists of the corpus. "
        "Quantizers come from the process memos (training visible in "
        "ann_ivf_kmeans_topk / ann_pq_adc_topk); this plan is the "
        "production query path: scan codes once, probe, rank."
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



#: appended verbatim — round-8 measurement notes (stage costs,
#: bench comparison, noise calibration); keep these when adding
#: NOTES entries so regeneration never loses the analysis.
ROUND8_NOTES = """
## curate_documents — stage cost breakdown (round 8, VERDICT #5)

Steady-state wall times at sf0.1, local[32], warm JVM (profiled twice,
quiet machine; `BENCH_DETAIL.json` steady min for the whole gate was
6.19 s this round — the three-round 5.0→5.7→6.2 "drift" tracked the
same ~8% whole-suite environmental shift measured across all 107
code-unchanged entries, not a plan change):

| stage | wall | share | shape |
|---|---|---|---|
| 1. enrich (lang-ID, quality, tokens, md5) + eligibility filter + exact-dedup window | ~2.8 s | ~41% | ONE column-pruned text scan, narrow native-Column maps, one content-hash shuffle |
| 2. survivor re-join + shingle/MinHash/LSH pair build | ~2.0 s | ~29% | second pruned (doc_id,text) scan, banded join on (band,sig) |
| 3. connected components (large-star/small-star) | ~1.5 s | ~21% | iterative, bounded by 188-edge graph at this SF |
| 4. attach reps + self-filter + checkpoint | ~0.8 s | ~11% | broadcast-sized assignment join |

No stage exceeds the 40%-unexplained trigger: stage 1 is the
irreducible single pass over the corpus text (all four enrichment
columns computed in one projection — splitting them would re-scan),
and stages 2-4 shrink with the eligible-survivor set, which is the
filter-first design doing its job. At 100× the only superlinear risk
is stage 3's edge count; `connected_components` already banded and
capped (driver union-find only <1M edges).

## Round-8 bench vs round-7 (first same-order comparison)

CORRECTION (round 9, r8 verdict "What's wrong" #1): the +5.5% figure
below was computed from an earlier run that was NOT the committed
BENCH_DETAIL.json; the committed r8 artifact shows the common-107
total at 123.8 → 140.4 s (+13.4%), outside the stated ±6% band, with
1.4-1.7× swings on code-untouched queries. The noise analysis below
(and the isolated re-benches that WERE committed) still supports the
environmental-shift reading, but the number was not reproducible from
the artifact the driver records — a process defect, fixed in round 9:
bench.py now reports the median-of-3 (min-of-2 was under-powered
against the documented 1.4-1.7× single-query noise floor) and every
round-over-round section from round 9 on is computed FROM the
committed BENCH_DETAIL.json of both rounds.

`bench.py` has been alphabetical since late round 7, so this is the
first clean round-over-round read. Common 107 entries: 123.8 → 130.6 s
(+5.5%; committed artifact: 140.4 s / +13.4% — see correction above);
the per-query ratio distribution is a uniform shift (median
1.084, quartiles 0.85 / 0.99 / 1.08 / 1.18 / 1.30) across
code-untouched queries — environmental, not plan changes. Confirmed by
spot re-benching the worst apparent "regressions" in isolation
(3 repeats, quiet machine): `streaming_corpus_stats` 7.22 in-suite →
**5.86** isolated (below its r7 6.43 — the round-7 watch item closes),
`ann_cosine_topk` 1.01 → 0.74 (≈ r7's 0.71). The round-7 prediction
held: the ANN family reverted to ~r6 levels once order stabilized
(`ann_ivf_kmeans_topk` 3.18→2.09, `ann_lsh_topk` 2.28→1.67,
`kmeans_clusters_embeddings` 0.83→0.59, `decontaminate_docs`
2.24→1.91). The only CODE-attributable change is
`table_change_feed_events` 1.32→1.77: the erasure+backfill scenario
adds a per-user rollup aggregation (one extra small shuffle over the
post-window slice) and a larger classified diff — the price of making
all four change types structurally occur and oracle-verified.

Run-to-run noise calibration: two full same-code bench runs this round
(the committed BENCH_DETAIL.json is a later run that also carries the
four new gates — restore 0.9 s, zorder 2.4 s, PQ 5.8 s, IVFADC 3.1 s;
PQ retrains its quantizer every run — the visible-training gate, the
kmeans_train_hash_docs convention — while IVFADC reuses the memoized
quantizers and times routing + search) had a per-query median
ratio of 0.98 with single-query
outliers to 1.5× (`streaming_corpus_stats` 7.2 ↔ 11.0 s — isolated
3-repeat min 5.86 s; `q21` 1.20 ↔ 1.73 s). Read any per-query delta
under ~1.5× against this noise floor before calling it a regression;
totals are comparable only to ~±6%.
"""


#: appended verbatim — round-10 measurement notes. The round-over-round
#: numbers are `python tools/bench_compare.py /tmp/prev.json BENCH_DETAIL.json`
#: output with /tmp/prev.json = `git show 2a29cef:BENCH_DETAIL.json`
#: (the artifact the round-9 driver committed — its own r9 run, 146.8 s).
ROUND10_NOTES = """
## Round-10 bench vs round-9 — computed FROM the committed artifacts

Same methodology both sides (median-of-3, alphabetical order, sf0.1).
Baseline: the BENCH_DETAIL.json committed in the r9 tree (the driver's
own r9 run, total 146.8 s — the r9 verdict corroborated it at +4.5%
over the earlier-committed 140.4 s, inside the noise band; using the
tree's artifact keeps the comparison single-source). SEVEN full runs
this round as the code accumulated (BPE gate -> NULL-id guards ->
merge/table hardening -> dedup hardening -> similarity hardening),
totals 135.4 / 145.4 / 134.3 / 192.4 / 146.5 / 155.5 / 142.3 s — the
fourth ran on a visibly loaded box (15-min load avg 7.4; its worst
"movers" were 2.4-3.6x on entries with zero code change, so it is
disclosed and discarded as contaminated), the same box-state noise r9
calibrated at 175.0/147.9/152.0/140.4. The LAST run (final code) is
committed and every number below is bench_compare output against it.

- common 111 entries: 146.8 -> 138.8 s (-5.4% on the committed run;
  the same-round spread ran -11.0% to +3.3% — the spread IS the
  box); per-query ratio distribution min 0.65 / q1 0.82 /
  median 0.95 / q3 1.03 / max 1.30, no regression outside the
  calibrated 1.4-1.7x single-query noise floor attributable to code
  (worst: ann_cosine 1.03 -> 1.34 and fingerprint 1.58 -> 2.04, both
  inside their own historical swings).
- **the similarity sweep's IVF fix is a real win**: dropping the
  per-centroid norm(vec) fold from the assignment lambda (ranking-
  invariant; mirrored in both oracles) reads ann_ivf_topk
  2.21 (r9) -> 1.79 (0.81x) and ann_ivf_kmeans_topk 2.19 -> 1.92
  (0.87x) on the committed run. The zero-norm/dim guards are
  latent-cost (filters over already-computed norms).
- entry added: `bpe_tokenize_docs` median 3.45 s (the cold run
  carries JIT + the first 6-merge training; every repeat retrains
  visibly, the ann_pq_adc_topk convention). Registry 113 -> 114;
  headline total 142.3 s over 112 benched entries.
- the r9-flagged watch item `streaming_corpus_stats` read 6.7-7.2 s
  across the five usable runs (9.05 on the committed noisier one; vs
  7.25 driver r9) — code-unchanged, now ATTRIBUTED (see the stage
  table below) and closed: ~93% fixed micro-batch machinery, bounded
  per batch, 1.2x at 10x data.
- **the merge/table hardening is free**: merge_upsert 0.65 (r9) ->
  0.61, merge_delete_window 0.76 -> 0.60, schema_evolution_merge
  0.94 -> 0.62, salesforce_incremental_upsert 1.29 -> 1.10 — the
  null-safe anti-join conditions compile to the same keyed hash
  joins.
- **the dedup hardening is free**: under the fixed MinHash
  permutation (2^31-1 prime — same arithmetic shape, now actually
  affine and ANSI-portable) minhash_near_dup 1.28 (r9) -> 1.49,
  incremental_minhash_ingest 1.99 -> 1.82, curate_documents
  6.87 -> 6.27, near_dup_clusters 2.76 -> 2.19; simhash with the
  content-less-doc exclusion 0.63 -> 0.68. All inside the per-query
  noise floor, several improved.
- the NULL-id guards cost what the pushdown argument predicted —
  nothing visible beyond noise: each probe is an IsNull take(1) that
  parquet statistics answer from footers (scrub_boilerplate
  2.30 (r9) -> 2.47 on this run, 1.71/1.99 on the two earlier
  post-guard runs).

## streaming_corpus_stats — stage cost attribution (round 10, VERDICT #3)

Three rounds as the most expensive bench entry (7.0-7.3 s) with no
breakdown. `tools/corpus_stats_profile.py` (sf0.1, local[32], quiet
machine, median of 3) decomposes the gate:

| stage | median | what it is |
|---|---|---|
| A. staging (write_jsonl, 6 gzip shards) | 0.47 warm / 2.9 cold | memoized across bench repeats; first_run only |
| B. availableNow drain, maxFilesPerTrigger=2 (3 micro-batches) | 5.10 s | the gated topology |
| C. same drain, no trigger cap (1 micro-batch) | 3.08 s | isolates per-batch machinery |
| D. batch-mode equivalent (read.json + agg + parquet write) | 0.36 s | the pure data cost |
| E. final sink read-back | 0.31 s | driver hash input |

Derived: fixed micro-batch machinery ≈ 2.7 s for the first batch
(stream query start/stop, per-batch planning, HDFS-backed state-store
round-trip, commit/offset log) + ~1.0 s per additional micro-batch;
the gzip-JSONL scan + |lang|x|source|-sized aggregate is 0.36 s —
**~93% of the drain is fixed streaming machinery, ~7% is data**. That
is the expected profile for a complete-mode monitor whose state is
the report itself: at 100 TB the per-batch data term grows with shard
size while the machinery term stays constant per batch, so the
wall-clock ratio INVERTS at scale (see the streaming_corpus_stats 10x
rehearsal row in SCALE.md, added this round — a ratio well under 10x
is machinery-bound, exactly this attribution). The 3-batch topology
is deliberate (multi-batch
complete-mode re-emission is the contract under test); closing the
watch item — the cost is machinery, priced, and bounded per batch,
not a data-path defect.
"""


#: appended verbatim — round-9 measurement notes. Every number in the
#: round-over-round section is the output of
#: `python tools/bench_compare.py <(git show <r8-commit>:BENCH_DETAIL.json) BENCH_DETAIL.json`
#: or directly readable from the committed BENCH_DETAIL.json "runs"
#: map — the r8 verdict's evidence-pipeline fix, structural this time.
ROUND9_NOTES = """
## Round-9 bench vs round-8 — computed FROM the committed artifacts

Methodology changed this round (r8 verdict task #1): bench.py now
reports the MEDIAN of 3 repeats (was: min of 2) and BENCH_DETAIL.json
carries the raw per-run times under "runs", so every statistic —
including a min-of-first-2 reconstruction for same-methodology
comparison with rounds <= 8 — is recomputable from the committed
artifact. `tools/bench_compare.py` prints the comparison below from
the two committed files (`git show <r8-commit>:BENCH_DETAIL.json` vs
the committed r9 file); no headline number comes from an uncommitted
run.

Headline (committed r8 BENCH_DETAIL.json vs committed r9; quiet box,
full suite 140.4 s over 111 entries):

- common 108 entries: median-of-3 130.6 s vs r8's min-of-2 145.1 s —
  **-10.0% despite the median statistic sitting above the min by
  construction**. Same-methodology reconstruction from "runs": r9
  min-of-first-2 127.9 s (**-11.9%**), r9 min-of-3 117.8 s (-18.8%).
  Per-query ratio distribution (median/min basis): min 0.28 / q1 0.81
  / median 0.93 / q3 1.08 / max 1.53.
- entry changes: ann_lsh_topk (1.93) + ann_lsh_multiprobe_topk (2.28)
  folded into ann_lsh_suite_topk (both probe radii in one union);
  streaming_sessionize_native_events (4.80) replaced by
  streaming_sessionize_stateful_events (4.83, the quarter-cohort
  Python compat gate); bpe_train_merges_docs added (runs
  [3.38, 1.90, 1.74] — the corpus pass once, merge iterations
  vocabulary-sized).
- the one large CODE-attributable improvement:
  streaming_sessionize_events 10.28 -> 2.84 s (0.28x) — the default
  sessionizer is now the JVM session_window dispatch (r8 verdict task
  #3). Sessionize family lineup total: 15.08 s (python-default +
  jvm-twin) -> 7.67 s (jvm-default + cohort-scoped python compat).
- the one CODE-attributable regression: table_change_feed_events
  2.18 -> 3.06 s (1.41x) — the gate now ALSO writes a v1 replica,
  applies the change feed through the new apply_changes consumer, and
  raises unless the result equals the v2 read (two exceptAll counts).
  The produce->consume round-trip moved INTO the gate; the delta is
  the price of verifying it every run.
- streaming-gate medians now measure the STREAM: the staged input
  drop (a pure function of the read-only fixture) is memoized across
  repeats like the k-means quantizers, while checkpoints/sinks stay
  fresh per run (a reused availableNow checkpoint would emit
  nothing). The first_run column retains staging+stream (sessionize
  4.90 cold vs 2.84 median; corpus_stats 8.70 vs 7.03) — nothing is
  hidden, the repeat loop just stopped re-measuring parquet/JSONL
  write throughput. Repeat-identity of all five gates verified by
  result hash.
- semantic_dedup_hash_docs (the r8 verdict's missing isolated
  number): committed in-suite runs [4.827, 4.115, 3.656] — the
  min-of-3 (3.66) is BELOW the r7 acceptance value (3.82 min-of-2)
  and the median 4.12 is below r8's 4.74, so the r8 "regression" was
  the noise floor, not the dot_arrow change (an isolated cold-session
  3-repeat read [5.53, 5.39, 5.28]; isolated runs pay cold
  page-cache/codegen the alphabetical suite amortizes, which is why
  cross-round comparison uses in-suite numbers under a fixed order).
- remaining worst movers are all sub-second entries with no r9 code
  change (gap_fill 0.45->0.69, events_value_percentiles 0.35->0.52,
  exact_dedup 0.31->0.44) — per-query noise floor, auditable against
  their own committed "runs"; ann_pq_adc_topk is flat (5.76 -> 5.64
  median; an earlier busier-box run this round read 8.5 in-suite and
  6.29 isolated — the spread, not the code, moved).

Noise calibration, now visible IN the artifact: four same-code
median-of-3 full runs this round totaled 175.0 / 147.9 / 152.0 /
140.4 s (first immediately after a full parity run; last two on a
quiet box; the LAST is committed) — the committed "runs" lists carry
per-repeat spreads so any reader can check a mover against its own
repeats before calling it a regression. The median-of-3 headline
damps exactly this; the raw-runs map makes the damping auditable.
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
    out.append(ROUND10_NOTES)
    out.append(ROUND9_NOTES)
    out.append(ROUND8_NOTES)
    Path(__file__).resolve().parents[1].joinpath("PLANS.md").write_text(
        "".join(out)
    )
    print("wrote PLANS.md")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
