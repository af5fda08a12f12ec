"""Command-line entry point — the operational surface the reference
exposes through Glue job invocations / Step Functions inputs, here as
one module runnable with ``python -m cdk_datalake_ingest_spark``.

Subcommands:
  query <name> [--sf-dir DIR] [--limit N] [--explain]
      Run a registry query (one per operator; see ``list``) and print
      rows as JSON lines — or the formatted physical plan.
  sql <file-or-text> [--sf-dir DIR] [--limit N]
      Run raw ANSI SQL over the registered lake tables (sql.py).
  list
      List registry query names.
  validate [--sf-dir DIR]
      Run the data-quality expectation report for orders.
  table <path> {versions|history|restore V|clone TARGET|vacuum|
                compact [N]|changes FROM [TO] [--keys k1,k2]|
                apply-changes SOURCE FROM [TO] --keys k1,k2}
      Versioned-table maintenance over a ManagedTable path: list
      snapshot versions, RESTORE to an earlier version, shallow-CLONE,
      vacuum superseded snapshots, bin-pack compact, or print the
      change data feed between two versions as JSON lines.

Exit code is 0 on success, 1 on a failed query — scriptable the same
way the reference's job status checks are.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(shuffle: int | None):
    from cdk_datalake_ingest_spark.session import get_spark

    return get_spark("cdk-datalake-ingest-cli", shuffle_partitions=shuffle)


def _emit(df, limit: int | None) -> None:
    # `is not None`, not truthiness: --limit 0 means zero rows, not all
    it = df.limit(limit).toJSON() if limit is not None else df.toJSON()
    for line in it.toLocalIterator():
        print(line)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cdk_datalake_ingest_spark")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run a registry query by name")
    q.add_argument("name")
    q.add_argument("--limit", type=int, default=None)
    q.add_argument("--explain", action="store_true")

    s = sub.add_parser("sql", help="run raw SQL (text or @file)")
    s.add_argument("text")
    s.add_argument("--limit", type=int, default=None)

    sub.add_parser("list", help="list registry query names")
    sub.add_parser("validate", help="orders data-quality report")

    t = sub.add_parser(
        "table", help="versioned-table maintenance (ManagedTable)"
    )
    t.add_argument("path")
    t.add_argument(
        "action",
        choices=[
            "versions", "detail", "history", "restore", "clone", "vacuum",
            "compact", "changes", "apply-changes",
        ],
    )
    t.add_argument("args", nargs="*")
    t.add_argument(
        "--keys", default=None,
        help="comma-separated key columns for `changes` / `apply-changes`",
    )
    t.add_argument("--keep", type=int, default=1, help="vacuum keep count")
    t.add_argument("--limit", type=int, default=None)

    a = ap.parse_args(argv)

    if a.cmd == "list":
        from cdk_datalake_ingest_spark.queries import QUERIES

        for name in QUERIES:
            print(name)
        return 0

    spark = _spark(a.shuffle_partitions)
    try:
        if a.cmd == "query":
            from cdk_datalake_ingest_spark.queries import QUERIES

            if a.name not in QUERIES:
                print(f"unknown query: {a.name}", file=sys.stderr)
                return 1
            df = QUERIES[a.name](spark, a.sf_dir)
            if a.explain:
                df.explain("formatted")
            else:
                _emit(df, a.limit)
        elif a.cmd == "sql":
            from cdk_datalake_ingest_spark.sql import run_sql

            text = a.text
            if text.startswith("@"):
                with open(text[1:]) as fh:
                    text = fh.read()
            _emit(run_sql(spark, a.sf_dir, text), a.limit)
        elif a.cmd == "table":
            from cdk_datalake_ingest_spark.operators.table import (
                ManagedTable,
            )

            _USAGE = {
                "restore": (1, "table <path> restore <version>"),
                "clone": (1, "table <path> clone <dest>"),
                "changes": (1, "table <path> changes <from> [to]"),
                "apply-changes": (
                    2,
                    "table <path> apply-changes <source_path> <from> [to] "
                    "--keys k1,k2  (note: on a real Delta target the "
                    "feed applies as TWO commits — delete-merge, then "
                    "upsert-merge — so readers can observe the "
                    "intermediate version; the versioned-parquet "
                    "target applies it as one CAS snapshot write)",
                ),
            }
            need = _USAGE.get(a.action)
            if need is not None and len(a.args) < need[0]:
                print(f"usage: {need[1]}", file=sys.stderr)
                return 1

            tbl = ManagedTable(spark, a.path)
            if a.action == "versions":
                print(json.dumps(tbl.versions()))
            elif a.action == "detail":
                print(json.dumps(tbl.detail(), default=str))
            elif a.action == "history":
                for entry in tbl.history(a.limit):
                    print(json.dumps(entry, default=str))
            elif a.action == "restore":
                print(json.dumps({"version": tbl.restore(int(a.args[0]))}))
            elif a.action == "clone":
                c = tbl.clone(a.args[0])
                print(json.dumps({"cloned_to": str(c.path)}))
            elif a.action == "vacuum":
                print(json.dumps({"removed": tbl.vacuum(a.keep)}))
            elif a.action == "compact":
                tbl.compact(int(a.args[0]) if a.args else None)
                print(json.dumps({"version": tbl.versions()[-1]}))
            elif a.action == "changes":
                frm = int(a.args[0])
                to = int(a.args[1]) if len(a.args) > 1 else None
                keys = a.keys.split(",") if a.keys else None
                _emit(tbl.changes_between(frm, to, key_cols=keys), a.limit)
            elif a.action == "apply-changes":
                # consume another table's keyed change feed into <path>
                if not a.keys:
                    print(
                        "apply-changes needs --keys (the merge keys the "
                        "feed was classified by)", file=sys.stderr,
                    )
                    return 1
                src_tbl = ManagedTable(spark, a.args[0])
                frm = int(a.args[1])
                to = int(a.args[2]) if len(a.args) > 2 else None
                keys = a.keys.split(",")
                feed = src_tbl.changes_between(frm, to, key_cols=keys)
                tbl.apply_changes(feed, keys)
                print(json.dumps({"version": tbl.versions()[-1]}))
        elif a.cmd == "validate":
            from cdk_datalake_ingest_spark.queries import dq_validate_orders

            rows = dq_validate_orders(spark, a.sf_dir).collect()
            worst = 0.0
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
                # NULL rate = empty table (0/0): zero violations
                worst = max(worst, r["violation_rate"] or 0.0)
            return 0 if worst == 0 else 1
        return 0
    except Exception as e:  # surface as job failure, not a stack dump
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
