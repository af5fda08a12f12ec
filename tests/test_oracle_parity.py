"""Golden tests: a representative subset of the query registry against
the DuckDB oracle at sf0.001 (the full set runs via
tools/check_parity.py and the driver's own sf0.01 gate)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_parity import canon, compare, duck_conn

SUBSET = [
    "q01_pricing_summary",
    "stage_pipeline_lineitem",
    "dsl_magic_codes",
    "w1_latest_event",
    "merge_delete_window_events",
    "exact_dedup_docs",
    "text_metrics_docs",
    "ann_cosine_topk",
    "q21_waiting_suppliers",
    "unigram_lm_docs",
    "chunk_docs_sliding",
    "semantic_dedup_embeddings",
    "dq_validate_orders",
    "jsonl_roundtrip_docs",
    "gap_fill_user_hours",
    "decontaminate_multi_docs",
    "sql_interface_q13",
    "sql_interface_window",
    "sql_interface_setops",
    "kmeans_train_hash_docs",
    "semantic_dedup_hash_docs",
    # round-6 additions (now in the round-7 driver window; kept here
    # because they are the newest operator families)
    "q02_min_cost_supplier",
    "q09_product_profit",
    "substring_dedup_docs",
    "nb_quality_filter_docs",
    "incremental_minhash_ingest_docs",
    # round-7 gates, new this round
    "table_change_feed_events",
    # round-9: the default sessionizer path (auto → JVM session_window),
    # the cohort-scoped stateful compat mode, the folded LSH suite, and
    # the new BPE tokenizer-training gate
    "streaming_sessionize_events",
    "streaming_sessionize_stateful_events",
    "ann_lsh_suite_topk",
    "bpe_train_merges_docs",
    # round-8 gates: versioned-table RESTORE end to end; Z-order
    # layout rewrite (content-preserving, file-skipping invariant
    # raised in-line)
    "table_restore_roundtrip_events",
    "zorder_layout_events",
    "ann_pq_adc_topk",
    "ann_ivfadc_topk",
    # the 9 r5 entries the round-7 rotation left outside the 50-row
    # driver window (q01 is already above): their driver rows go two
    # rounds stale, so this local gate is their hard per-commit signal
    # (PARITY_LOCAL_r07.json carries the full-registry sf0.01 run)
    "q03_top_orders",
    "q05_region_revenue",
    "q10_returned_customers",
    "q12_priority_shipping",
    "q17_small_quantity_revenue",
    "orders_without_lineitems",
    "customers_with_open_orders",
    "returned_vs_finished_setops",
]


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duck_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, oracle, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, sf_dir).toPandas()
    ddf = oracle.execute(sql).df()
    problems = [p for p in compare(name, sdf, ddf) if not p.startswith("col ") or "WARN" not in p]
    assert len(sdf) > 0
    assert problems == [], problems


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 9


def test_registry_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    for k in entry_mod.oracle_sql():
        assert k in q


def test_money_guard_and_ws_class_uniform():
    """Source-level consistency pins for the two contracts that are
    textually replicated across oracle SQL strings (the review's
    maintenance concern — a future edit to one copy must not silently
    desynchronize the rest):

    - every DECIMAL money cast of the events value column carries the
      isnan + TRY_CAST guard (a bare CAST raises on inf in the oracle
      engine and diverges from Spark's NULL), and no unguarded form
      remains;
    - the pinned ASCII-whitespace class exists exactly once
      (operators/dedup.py:ASCII_WS) and no independent literal of it
      survives anywhere in the package.
    """
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parents[1] / "cdk_datalake_ingest_spark"
    qsrc = (pkg / "queries.py").read_text()

    bare = [
        m.group(0)
        for m in re.finditer(r"(?<!TRY_)CAST\((?:[a-z]\.)?value AS DECIMAL", qsrc)
    ]
    assert not bare, f"unguarded money cast(s): {bare}"
    guarded = re.findall(
        r"CASE WHEN isnan\((?:[a-z]\.)?value\) THEN NULL "
        r"ELSE TRY_CAST\((?:[a-z]\.)?value AS DECIMAL\(18,[26]\)\) END",
        qsrc,
    )
    trys = re.findall(r"TRY_CAST\((?:[a-z]\.)?value AS DECIMAL", qsrc)
    assert len(guarded) == len(trys) >= 12, (len(guarded), len(trys))

    ws_literal = re.compile(r"\[? ?\\+t\\+n\\+x0[bB]\\+f\\+r")
    offenders = []
    for p in pkg.rglob("*.py"):
        if p.name == "dedup.py":
            continue
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if line.lstrip().startswith(("#", "--")):
                continue  # prose may cite the class; code may not
            if ws_literal.search(line):
                offenders.append(f"{p.name}:{i}")
    assert not offenders, f"independent whitespace-class literal(s): {offenders}"
