"""Degenerate-relational parity sweep (round 11) — sweep #5, the
orders/lineitem/customer twin of the events sweep.

The TPC-H-ish fixtures are referentially intact and NULL-free, so the
join-heavy q-series' behavior on the inputs a real lake always has —
NULL join keys, NULL dates inside range predicates, NULL group keys,
NULL measures under SUM/AVG/CASE, dangling foreign keys, negative
amounts — was unverified against the oracles. The known cross-engine
traps at this grain: NULL group keys reaching a top-k LIMIT under the
engines' opposite NULL sort defaults (Spark ASC = NULLS FIRST, DuckDB
= NULLS LAST), and any oracle whose aggregate/flag logic assumed
NOT-NULL columns.

Builds doctored orders/lineitem/customer/supplier/part tables — real
sf0.001 rows PLUS NULL-key/NULL-date/NULL-measure/dangling-FK rows —
and runs all 22 TPC-H shapes plus the set-op/anti/semi, SQL-interface,
DSL-decode, and data-quality gates against their OWN registered
oracles.

Excluded deliberately: staging/pipeline gates (stage_pipeline,
salesforce_stage, dms_full_load, jdbc_roundtrip) — they exercise sink
machinery over the same DSL transforms the dsl_* gates pin here, and
their ManagedTable writes are not a NULL-semantics surface at this
grain; events/documents gates (covered by sweeps #1-#4).
"""

from __future__ import annotations

import datetime as dt
import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SRC = "/root/testdata/sf0.001"

GATES = [
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q03_top_orders",
    "q04_priority_exists",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_customers",
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_bracket_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "distinct_rows_lineitem",
    "orders_without_lineitems",
    "customers_with_open_orders",
    "returned_vs_finished_setops",
    "sql_interface_q13",
    "sql_interface_setops",
    "dq_validate_orders",
    "dsl_flags_orders",
    "dsl_magic_codes",
]

_TS = dt.datetime(1995, 6, 15)


def _doctor(spark, src: Path, dest: Path, extra_df) -> None:
    base = spark.read.parquet(str(src))
    staged = dest.parent / f"_staged_{dest.stem}"
    base.unionByName(extra_df).coalesce(1).write.mode("overwrite").parquet(
        str(staged)
    )
    part = next(staged.glob("part-*.parquet"))
    shutil.copy(part, dest)
    shutil.rmtree(staged)


@pytest.fixture(scope="module")
def edge_rel_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_rel")
    for t in ("region", "nation", "events", "documents", "embeddings"):
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")

    orders_extra = spark.createDataFrame(
        [
            # NULL custkey: drops out of every customer equi-join, but
            # stays in order-only aggregates
            (9000001, None, "O", 100.5, _TS, "1-URGENT"),
            # NULL everything-but-key: group keys, dates, measures
            (9000002, 1, None, None, None, None),
            # NULL orderkey: a NULL join key toward lineitem
            (None, 2, "F", 200.25, _TS, "2-HIGH"),
            # dangling FK: custkey that matches no customer row
            (9000004, 88888888, "F", 300.75, _TS, "5-LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    )
    _doctor(spark, Path(f"{SF_SRC}/orders.parquet"), d / "orders.parquet", orders_extra)

    li_extra = spark.createDataFrame(
        [
            # all-NULL measures/flags/date on a real extra order
            (9000001, None, None, 1, None, None, None, None, None, None, None),
            # NULL orderkey: never equi-joins to orders
            (None, 1, 1, 2, 10.0, 1000.0, 0.05, 0.02, "N", "O", _TS),
            # dangling part/supp FKs + negative qty and zero price (the
            # DQ gate's violation classes)
            (9000002, 77777777, 77777777, 3, -5.0, 0.0, 0.5, 0.0, "R", "F", _TS),
            # valid amounts, NULL shipdate (range predicates must drop
            # it on both engines)
            (9000004, 1, 1, 4, 7.0, 700.0, 0.03, 0.01, "A", "F", None),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz",
    )
    _doctor(spark, Path(f"{SF_SRC}/lineitem.parquet"), d / "lineitem.parquet", li_extra)

    cust_extra = spark.createDataFrame(
        [
            (8000001, None, None, None, None),
            (8000002, "Customer#Edge", 999, -10.5, "BUILDING"),
            (None, "Customer#NullKey", 1, 5.0, "AUTOMOBILE"),
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    _doctor(spark, Path(f"{SF_SRC}/customer.parquet"), d / "customer.parquet", cust_extra)

    supp_extra = spark.createDataFrame(
        [
            (7000001, None, None, None),
            (None, "Supplier#NullKey", 1, 10.0),
        ],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    _doctor(spark, Path(f"{SF_SRC}/supplier.parquet"), d / "supplier.parquet", supp_extra)

    part_extra = spark.createDataFrame(
        [
            (6000001, None, None, None, None, None),
            (None, "nullkey linen part", "Brand#55", "STANDARD TIN", 5, 901.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    _doctor(spark, Path(f"{SF_SRC}/part.parquet"), d / "part.parquet", part_extra)
    return str(d)


def test_relational_gates_match_oracles_on_degenerate_keys(
    spark, edge_rel_dir
):
    from check_parity import compare, duck_conn

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duck_conn(edge_rel_dir)
    failed = {}
    for name in GATES:
        try:
            sdf = qs[name](spark, edge_rel_dir).toPandas()
        except Exception as e:  # noqa: BLE001 - report which gate died
            failed[name] = [f"spark error: {e}"[:300]]
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed[name] = [f"duckdb error: {e}"[:300]]
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed[name] = problems
    assert not failed, failed
