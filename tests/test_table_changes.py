"""changes_between — the Delta Change Data Feed role over
ManagedTable's versioned snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.table import ManagedTable


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "cdc")
    t.write(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, val double",
        )
    )
    return t


def test_keyed_cdc_classifies_insert_update_delete(spark, table):
    # v2: update id=2, delete id=3, insert id=4
    table.write(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)],
            "id long, name string, val double",
        )
    )
    ch = table.changes_between(1, 2, key_cols=["id"])
    got = {
        (r["id"], r["_change_type"]): (r["name"], r["val"])
        for r in ch.collect()
    }
    assert got == {
        (4, "insert"): ("d", 40.0),
        (3, "delete"): ("c", 30.0),
        (2, "update_preimage"): ("b", 20.0),
        (2, "update_postimage"): ("b2", 21.0),
    }
    assert {r["_commit_version"] for r in ch.collect()} == {2}
    # unchanged id=1 emits nothing


def test_keyed_cdc_null_keys_and_null_values(spark, table):
    # NULL keys are legitimate values under eqNullSafe: one NULL-key
    # row persists unchanged, one changes a value to NULL
    table.write(
        spark.createDataFrame(
            [(None, "nk", 1.0), (1, "a", None)],
            "id long, name string, val double",
        )
    )
    table.write(
        spark.createDataFrame(
            [(None, "nk", 1.0), (1, "a", 5.0)],
            "id long, name string, val double",
        )
    )
    ch = table.changes_between(2, 3, key_cols=["id"]).collect()
    types = sorted(r["_change_type"] for r in ch)
    assert types == ["update_postimage", "update_preimage"]
    assert all(r["id"] == 1 for r in ch)  # NULL-key row unchanged


def test_keyed_cdc_schema_evolution_pads_null(spark, table):
    table.write(
        spark.createDataFrame(
            [(1, "a", 10.0, "x"), (2, "b", 20.0, "y")],
            "id long, name string, val double, extra string",
        )
    )
    ch = table.changes_between(1, 2, key_cols=["id"])
    assert "extra" in ch.columns
    got = {
        (r["id"], r["_change_type"]): r["extra"] for r in ch.collect()
    }
    # id=3 deleted (old snapshot has no 'extra' -> NULL); id 1,2 gain
    # a non-null extra -> update pairs with NULL preimage extra
    assert got[(3, "delete")] is None
    assert got[(1, "update_preimage")] is None
    assert got[(1, "update_postimage")] == "x"
    assert got[(2, "update_postimage")] == "y"


def test_keyless_cdc_is_multiset_exact(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "cdc2")
    t.write(
        spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b")], "id long, name string"
        )
    )
    # drop ONE of the duplicate rows, add one new
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
        )
    )
    ch = t.changes_between(1, 2)
    got = sorted(
        (r["id"], r["name"], r["_change_type"]) for r in ch.collect()
    )
    assert got == [(1, "a", "delete"), (3, "c", "insert")]


def test_keyed_cdc_duplicate_key_raises(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "cdc3")
    t.write(
        spark.createDataFrame(
            [(1, "a"), (1, "b")], "id long, name string"
        )
    )
    t.write(spark.createDataFrame([(1, "a")], "id long, name string"))
    with pytest.raises(Exception, match="duplicate key"):
        t.changes_between(1, 2, key_cols=["id"]).collect()
    # opt-out when the invariant is enforced upstream
    rows = t.changes_between(
        1, 2, key_cols=["id"], check_unique_keys=False
    ).collect()
    assert len(rows) > 0


def test_changes_default_to_current_and_vacuumed_raises(spark, table):
    table.write(
        spark.createDataFrame([(1, "a", 99.0)], "id long, name string, val double")
    )
    ch = table.changes_between(1, key_cols=["id"])  # to=current (2)
    assert {r["_commit_version"] for r in ch.collect()} == {2}
    with pytest.raises(FileNotFoundError, match="does not exist"):
        table.changes_between(7)
