"""Unit tests for operators/quality.py (expectations, quarantine, FK
checks) and sources/jsonl.py (training-data delivery roundtrip)."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.quality import (
    Rule,
    fk_violations,
    quarantine,
    validation_report,
)
from cdk_datalake_ingest_spark.sources.jsonl import read_jsonl, write_jsonl


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "A"),
            (3, None, "B"),
            (4, 7.5, "Z"),
        ],
        "id long, amount double, code string",
    )


RULES = [
    Rule("amount_positive", "amount > 0"),
    Rule("code_known", "code IN ('A','B')"),
]


def test_report_counts_nulls_as_violations(spark, dirty):
    rows = {
        r["rule"]: r for r in validation_report(dirty, RULES).collect()
    }
    # amount: -5 fails, NULL fails (unknown is not a pass)
    assert rows["amount_positive"]["n_violations"] == 2
    assert rows["amount_positive"]["n_rows"] == 4
    assert rows["amount_positive"]["violation_rate"] == 0.5
    assert rows["code_known"]["n_violations"] == 1


def test_report_requires_rules(spark, dirty):
    with pytest.raises(ValueError):
        validation_report(dirty, [])


def test_quarantine_routes_and_names_failures(spark, dirty):
    good, bad = quarantine(dirty, RULES)
    assert sorted(r["id"] for r in good.collect()) == [1]
    bad_rows = {r["id"]: r["__failed_rules"] for r in bad.collect()}
    assert bad_rows[2] == ["amount_positive"]
    assert bad_rows[3] == ["amount_positive"]
    assert bad_rows[4] == ["code_known"]
    # quarantine preserves the original columns
    assert set(good.columns) == {"id", "amount", "code"}


def test_fk_violations_catches_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, pid int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    bad = fk_violations(child, parent, {"pid": "pk"})
    assert sorted(r["id"] for r in bad.collect()) == [2, 3]


def test_rule_evaluation_is_jvm_native(spark, dirty):
    """The report plan must contain no Python evaluation — rules fuse
    into the scan."""
    plan = validation_report(dirty, RULES)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jsonl_roundtrip_exact(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, 'tricky "quoted" text\twith\ttabs', 3),
            (2, "unicode: ünïcodé — ok", None),
            (3, "", 0),
        ],
        "id long, text string, n int",
    )
    path = str(tmp_path / "docs")
    write_jsonl(df, path, shards=2)
    back = read_jsonl(spark, path, "id long, text string, n int")
    got = sorted(map(tuple, back.collect()))
    assert got == sorted(map(tuple, df.collect()))
    # deterministic shard count
    import glob

    assert len(glob.glob(f"{path}/part-*.gz")) == 2


def test_jsonl_schema_explicit_keeps_long_ids(spark, tmp_path):
    df = spark.createDataFrame([(2**40, "x")], "id long, text string")
    path = str(tmp_path / "big")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "id long, text string")
    assert back.collect()[0]["id"] == 2**40
    assert dict(back.dtypes)["id"] == "bigint"


def test_cli_list_query_sql_validate(spark, sf_dir):
    """The __main__ CLI surface: list names, run a query, run raw SQL,
    and the validate exit contract (non-zero when any rule fails)."""
    import contextlib
    import io

    from cdk_datalake_ingest_spark.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["list"]) == 0
    assert "q13_order_count_distribution" in buf.getvalue().split()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            ["--sf-dir", sf_dir, "query", "q15_top_supplier"]
        )
    assert rc == 0
    import json as _json

    rows = [_json.loads(l) for l in buf.getvalue().splitlines()]
    assert rows and "total_revenue" in rows[0]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            ["--sf-dir", sf_dir, "sql", "SELECT COUNT(*) AS n FROM nation"]
        )
    assert rc == 0
    assert _json.loads(buf.getvalue())["n"] == 25

    # unknown query -> failure exit, not a stack dump
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert main(["query", "nope"]) == 1
    assert "unknown query" in err.getvalue()

    # orders fixture genuinely violates price_cap/recent_order -> 1
    with contextlib.redirect_stdout(io.StringIO()):
        assert main(["--sf-dir", sf_dir, "validate"]) == 1

    # --limit 0 means ZERO rows, not "no limit" (0 is falsy but set)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            ["--sf-dir", sf_dir, "sql", "--limit", "0",
             "SELECT n_name FROM nation"]
        )
    assert rc == 0
    assert buf.getvalue().strip() == ""


def test_rule_name_must_be_identifier():
    """Rule names are spliced into generated column names and a
    stack() expression — non-identifier names are rejected up front
    instead of failing (or injecting) downstream."""
    Rule("ok_name_1", "x > 0")
    for bad in ("price-cap", "has space", "quo'te", "1leading", ""):
        with pytest.raises(ValueError):
            Rule(bad, "x > 0")


def test_hash_embed_null_text_is_zero_vector(spark):
    from cdk_datalake_ingest_spark.functions.embed import (
        hash_embed,
        hash_embed_counts,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, "a b")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            hash_embed_counts(F.col("text"), 8).alias("c"),
            hash_embed(F.col("text"), 8).alias("v"),
        ).collect()
    }
    assert rows[1]["c"] == [0.0] * 8  # not NULL
    assert rows[1]["v"] == [0.0] * 8
    assert sum(rows[2]["c"]) == 2.0


def test_quarantine_requires_rules(spark, dirty):
    with pytest.raises(ValueError):
        quarantine(dirty, [])


def test_cli_table_maintenance_roundtrip(spark, tmp_path):
    """The `table` subcommand drives the full maintenance surface:
    versions -> changes (keyed CDF as JSON lines) -> restore -> clone
    -> vacuum, all through the CLI with scriptable JSON output."""
    import contextlib
    import io
    import json as _json

    from cdk_datalake_ingest_spark.__main__ import main
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    p = str(tmp_path / "cli_tbl")
    t = ManagedTable(spark, p)
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.write(spark.createDataFrame([(1, "a2")], "id long, v string"))

    def run(args):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(args)
        return rc, buf.getvalue()

    rc, out = run(["table", p, "versions"])
    assert rc == 0 and _json.loads(out) == [1, 2]

    rc, out = run(["table", p, "changes", "1", "2", "--keys", "id"])
    assert rc == 0
    types = sorted(
        _json.loads(l)["_change_type"] for l in out.splitlines()
    )
    assert types == ["delete", "update_postimage", "update_preimage"]

    rc, out = run(["table", p, "restore", "1"])
    assert rc == 0 and _json.loads(out)["version"] == 3

    clone_path = str(tmp_path / "cli_clone")
    rc, out = run(["table", p, "clone", clone_path])
    assert rc == 0 and _json.loads(out)["cloned_to"] == clone_path
    assert ManagedTable(spark, clone_path).read().count() == 2

    rc, out = run(["table", p, "vacuum"])
    assert rc == 0 and _json.loads(out)["removed"] == ["v00001", "v00002"]

    # bad version -> failure exit with a message, not a stack dump
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert main(["table", p, "restore", "99"]) == 1
    assert "does not exist" in err.getvalue()


def test_cli_table_missing_args_clean_usage(spark, tmp_path):
    """`table <path> restore|clone|changes` without the positional arg
    must print a usage line and exit 1, not dump an IndexError
    (round-8 ADVICE)."""
    import contextlib
    import io

    from cdk_datalake_ingest_spark.__main__ import main
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    p = str(tmp_path / "cli_usage")
    ManagedTable(spark, p).write(spark.range(1))

    for action in ("restore", "clone", "changes"):
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = main(["table", p, action])
        assert rc == 1, action
        assert err.getvalue().startswith("usage: table <path> "), action


def test_cli_apply_changes_replicates(spark, tmp_path):
    """`table <replica> apply-changes <source> FROM [TO] --keys ...`
    consumes the source's keyed change feed into the replica — the CDC
    fan-out workflow, scriptable end to end."""
    import contextlib
    import io
    import json as _json

    from cdk_datalake_ingest_spark.__main__ import main
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    src_p = str(tmp_path / "cli_src")
    rep_p = str(tmp_path / "cli_rep")
    src = ManagedTable(spark, src_p)
    src.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    rep = ManagedTable(spark, rep_p)
    rep.write(src.read(version=1))
    src.merge_upsert(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        ["id"],
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            ["table", rep_p, "apply-changes", src_p, "1", "2", "--keys", "id"]
        )
    assert rc == 0 and _json.loads(buf.getvalue())["version"] == 2
    got = sorted(tuple(r) for r in ManagedTable(spark, rep_p).read().collect())
    want = sorted(tuple(r) for r in src.read(version=2).collect())
    assert got == want

    # missing --keys -> clean message, exit 1
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = main(["table", rep_p, "apply-changes", src_p, "1", "2"])
    assert rc == 1 and "--keys" in err.getvalue()

    # missing positionals -> usage line, exit 1
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = main(["table", rep_p, "apply-changes", src_p])
    assert rc == 1 and err.getvalue().startswith("usage: table <path> ")


def test_read_jsonl_refuses_corrupt_lines(spark, tmp_path):
    """A corrupt shard line under Spark's default PERMISSIVE json mode
    silently becomes an ALL-NULL corpus row — zero signal, one
    poisoned document per corrupt line. The delivery-path reader
    defaults to FAILFAST (corruption stops the job); PERMISSIVE stays
    an explicit opt-in for triaging a damaged delivery."""
    import pytest

    from cdk_datalake_ingest_spark.sources.jsonl import read_jsonl

    p = tmp_path / "shards"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "good"}\n'
        '{"doc_id": 2, "text": CORRUPT}\n'
    )
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        read_jsonl(spark, str(p), "doc_id long, text string").collect()
    rows = read_jsonl(
        spark, str(p), "doc_id long, text string", mode="PERMISSIVE"
    ).collect()
    assert len(rows) == 2  # opt-in keeps the old triage behavior
