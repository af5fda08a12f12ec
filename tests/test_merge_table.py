import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.merge import merge_dataframes
from cdk_datalake_ingest_spark.operators.table import (
    ManagedTable,
    NoDataToMigrateException,
)


def test_merge_dataframes_upsert(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="old1"), Row(k=2, v="old2"), Row(k=3, v="old3")]
    )
    source = spark.createDataFrame([Row(k=2, v="new2"), Row(k=4, v="new4")])
    got = {r.k: r.v for r in merge_dataframes(target, source, ["k"]).collect()}
    assert got == {1: "old1", 2: "new2", 3: "old3", 4: "new4"}


def test_merge_dedups_source_deterministically(spark):
    target = spark.createDataFrame([Row(k=1, d="2024-01-01", v="old")])
    source = spark.createDataFrame(
        [Row(k=1, d="2024-01-03", v="latest"), Row(k=1, d="2024-01-02", v="stale")]
    )
    got = merge_dataframes(target, source, ["k"], order_by=["d"]).collect()
    assert len(got) == 1 and got[0].v == "latest"


def test_merge_delete_window(spark):
    target = spark.createDataFrame(
        [
            Row(k=1, period=202401, v="jan"),
            Row(k=2, period=202402, v="feb"),
            Row(k=3, period=None, v="nullp"),
        ]
    )
    source = spark.createDataFrame([Row(k=9, period=202402, v="new")])
    got = {
        r.k: r.v
        for r in merge_dataframes(
            target,
            source,
            ["k"],
            delete_predicate=F.col("period") >= 202402,
        ).collect()
    }
    # feb deleted by the window; NULL period kept (Delta DELETE semantics)
    assert got == {1: "jan", 3: "nullp", 9: "new"}


def test_managed_table_roundtrip_and_merge(spark, tmp_path):
    path = tmp_path / "stage" / "t1"
    t = ManagedTable(spark, path)
    assert not t.exists
    t.write(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    assert t.exists
    assert {r.k for r in t.read().collect()} == {1, 2}

    t.merge_upsert(
        spark.createDataFrame([Row(k=2, v="b2"), Row(k=3, v="c")]), keys=["k"]
    )
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}

    # merge idempotence: re-applying the same batch is a no-op
    t.merge_upsert(
        spark.createDataFrame([Row(k=2, v="b2"), Row(k=3, v="c")]), keys=["k"]
    )
    assert {r.k: r.v for r in t.read().collect()} == got

    t.delete_where(F.col("k") == 1)
    assert {r.k for r in t.read().collect()} == {2, 3}

    removed = t.vacuum(keep_snapshots=1)
    assert removed  # superseded snapshots dropped
    assert {r.k for r in t.read().collect()} == {2, 3}


def test_managed_table_schema_evolution(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "t2")
    t.write(spark.createDataFrame([Row(k=1, v="a")]))
    t.merge_upsert(
        spark.createDataFrame([Row(k=2, v="b", extra=10)]), keys=["k"]
    )
    rows = {r.k: (r.v, r.extra) for r in t.read().collect()}
    assert rows == {1: ("a", None), 2: ("b", 10)}


def test_empty_batch_preserves_existing(spark, tmp_path):
    from cdk_datalake_ingest_spark.plans.pipeline import StagePipeline
    from cdk_datalake_ingest_spark.specs import ColumnSpec, TableSpec

    path = str(tmp_path / "t3")
    t = ManagedTable(spark, path)
    df = spark.createDataFrame([Row(k=1, v="keep")])
    t.write(df)
    pipe = StagePipeline(
        spark,
        TableSpec("T3", load_type="full"),
        [ColumnSpec("k", 1, "bigint", "k"), ColumnSpec("v", 2, "string", "v")],
        retry_sleep_base=0.0,
    )
    with pytest.raises(NoDataToMigrateException):
        pipe.write(df.limit(0), path)
    # deliberate divergence from the reference: existing data survives
    assert {r.k for r in t.read().collect()} == {1}


def test_time_travel_and_versions(spark, tmp_path):
    from pyspark.sql import Row

    t = ManagedTable(spark, tmp_path / "tt")
    t.write(spark.createDataFrame([Row(id=1, v="old")]))
    t.write(spark.createDataFrame([Row(id=1, v="new"), Row(id=2, v="x")]))
    assert t.versions() == [1, 2]
    assert {r.v for r in t.read().collect()} == {"new", "x"}
    assert [r.v for r in t.read(version=1).collect()] == ["old"]
    t.vacuum()
    assert t.versions() == [2]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read(version=1)
