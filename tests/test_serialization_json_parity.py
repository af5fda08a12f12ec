"""Serialization & semi-structured parity sweep (round 11) — sweep #6.

Three loss surfaces no earlier sweep covered:

1. **JSONL roundtrip** (`jsonl_roundtrip_docs`): the training-data
   delivery path writes documents as gzipped JSONL and re-reads them.
   NULL text (null vs missing key), embedded newlines/tabs (JSONL
   framing depends on \\n escaping), Unicode (escaping + UTF-8), and
   C0 controls must survive the hop byte-exactly — the oracle reads
   the parquet original, so any writer/reader loss shows as a
   value mismatch.
2. **gzip-CSV roundtrip** (`raw_csv_roundtrip_stage`): the S1/S7 raw
   zone path. CSV's classic ambiguity is NULL vs empty string; the
   doctored lineitem carries NULL measures/flags/dates through the
   write → schema-less re-read → stage pipeline.
3. **JSON extraction** (`events_props_json`): get_json_object vs the
   oracle's json_extract_string on the props column — malformed JSON,
   non-object roots, string-encoded and float numbers, booleans,
   JSON null, nested objects, case-mismatched keys, and Unicode
   values. Engines differ on lenient parsing; whatever the contract
   is, it must be pinned, not assumed.
"""

from __future__ import annotations

import datetime as dt
import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SRC = "/root/testdata/sf0.001"

#: (doc_id, text, lang) — serialization-hostile documents
DOC_ROWS = [
    (300001, None, "en"),  # NULL text: JSON null, not a missing field
    (300002, "", "en"),  # empty string: must NOT collapse to NULL
    (300003, "line1\nline2\nline3", "en"),  # JSONL framing hazard
    (300004, "tab\there\r\nand crlf", "en"),
    (300005, 'quotes " and \\ backslash \\" mix', "en"),
    (300006, "unicode: 春眠 🚀 café Straße Привет", "ja"),
    (300007, "control:\x01\x02\x1f end", "en"),  # C0 controls in JSON
    (300008, "trailing spaces   ", "en"),
    (300009, "   leading spaces", "en"),
    (300010, "null", "en"),  # the STRING 'null', not JSON null
    (None, "null doc_id row", "en"),
]

_T0 = dt.datetime(2024, 1, 2, 12, 0, 0)

#: (event_id, props) — JSON-edge props; other columns held valid
PROPS_ROWS = [
    (910001, "{bad json"),  # malformed
    (910002, '"scalar"'),  # valid JSON, non-object root
    (910003, "[1, 2, 3]"),  # array root
    (910004, '{"k": "12"}'),  # string-encoded number
    (910005, '{"k": 12.7}'),  # float where consumers cast to bigint
    (910006, '{"k": true}'),  # boolean
    (910007, '{"k": null}'),  # JSON null value
    (910008, '{"K": 5}'),  # case-mismatched key ($.k is case-sensitive)
    (910009, '{"k": {"x": 1}}'),  # nested object under k
    (910010, '{"k": 7, "extra": "пример 🚀"}'),  # Unicode elsewhere
    (910011, ""),  # empty string (not even malformed JSON)
    (910012, "   "),  # whitespace only
]

GATES_DOCS = ["jsonl_roundtrip_docs"]
GATES_EVENTS = ["events_props_json"]
GATES_LINEITEM = ["raw_csv_roundtrip_stage"]


@pytest.fixture(scope="module")
def serde_sf_dir(tmp_path_factory, spark):
    """One sf-dir carrying ALL THREE doctored tables (documents with
    serialization-hostile text, events with JSON-edge props, lineitem
    with NULL measures/flags/dates)."""
    d = tmp_path_factory.mktemp("serde_sf")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "embeddings"):
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")

    def _stage(base_df, extra_df, dest: Path):
        staged = d / f"_staged_{dest.stem}"
        base_df.unionByName(extra_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staged))
        shutil.copy(next(staged.glob("part-*.parquet")), dest)
        shutil.rmtree(staged)

    docs = spark.read.parquet(f"{SF_SRC}/documents.parquet").limit(60)
    _stage(
        docs,
        spark.createDataFrame(
            [
                (i, t, l, "edge", len(t) if t is not None else 0)
                for i, t, l in DOC_ROWS
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ),
        d / "documents.parquet",
    )

    ev = spark.read.parquet(f"{SF_SRC}/events.parquet")
    _stage(
        ev,
        spark.createDataFrame(
            [(eid, _T0, 3, "click", 1.5, props) for eid, props in PROPS_ROWS],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        ),
        d / "events.parquet",
    )

    li = spark.read.parquet(f"{SF_SRC}/lineitem.parquet")
    _stage(
        li,
        spark.createDataFrame(
            [
                # all-NULL measures/flags/date (the CSV NULL-vs-'' trap)
                (9100001, None, None, 1, None, None, None, None, None, None, None),
                # valid numerics, NULL strings only
                (9100002, 1, 1, 2, 3.0, 300.0, 0.01, 0.0, None, None, _T0),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp_ntz",
        ),
        d / "lineitem.parquet",
    )
    return str(d)


def _run(spark, sf_dir, gates):
    from check_parity import compare, duck_conn

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duck_conn(sf_dir)
    failed = {}
    for name in gates:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
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
    return failed


def test_jsonl_roundtrip_survives_hostile_text(spark, serde_sf_dir):
    assert not _run(spark, serde_sf_dir, GATES_DOCS)


def test_csv_roundtrip_survives_null_fields(spark, serde_sf_dir):
    assert not _run(spark, serde_sf_dir, GATES_LINEITEM)


def test_json_extraction_contract_on_edge_props(spark, serde_sf_dir):
    assert not _run(spark, serde_sf_dir, GATES_EVENTS)
