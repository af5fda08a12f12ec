"""S6 empty relation, S7 multi-slice append union-at-storage, S12
single-file compaction, C1/C2 catalog registration."""

from __future__ import annotations

from pyspark.sql import Row

from cdk_datalake_ingest_spark.operators.table import ManagedTable
from cdk_datalake_ingest_spark.sources.csv import (
    empty_relation,
    read_raw_csv,
    write_raw_csv,
)


def test_empty_relation_with_schema(spark):
    df = empty_relation(spark, "id bigint, name string")
    assert df.count() == 0
    assert [f.name for f in df.schema] == ["id", "name"]


def test_empty_relation_schemaless(spark):
    assert empty_relation(spark).isEmpty()


def test_multi_slice_append_is_union_at_storage(spark, tmp_path):
    """The reference's threaded extraction appends per-slice CSV files
    into one prefix (S7); readers see the implicit union-all."""
    path = str(tmp_path / "raw")
    write_raw_csv(spark.createDataFrame([Row(id="1", v="a")]), path)
    write_raw_csv(spark.createDataFrame([Row(id="2", v="b")]), path, mode="append")
    write_raw_csv(spark.createDataFrame([Row(id="3", v="c")]), path, mode="append")
    got = {r.id for r in read_raw_csv(spark, path).collect()}
    assert got == {"1", "2", "3"}


def test_single_file_compaction(spark, tmp_path):
    path = tmp_path / "tbl"
    t = ManagedTable(spark, path)
    t.write(spark.createDataFrame([Row(id=i) for i in range(10)]),
            coalesce_single_file=True)
    m = (path / "_manifest.json").read_text()
    import json

    data_dir = path / json.loads(m)["data_dir"]
    parts = [p for p in data_dir.iterdir() if p.name.endswith(".parquet")]
    assert len(parts) == 1


def test_catalog_registration(spark, tmp_path):
    """C1/C2: the writer registers its own table — replacing the
    reference's Glue crawler jobs (crawlers_job.py:173-258)."""
    t = ManagedTable(spark, tmp_path / "cat_tbl")
    t.write(spark.createDataFrame([Row(id=1, v="x"), Row(id=2, v="y")]))
    t.register("stage_cat_tbl")
    got = spark.sql("SELECT count(*) AS n FROM stage_cat_tbl").first().n
    assert got == 2
    spark.catalog.dropTempView("stage_cat_tbl")


def test_ts_us_expr_both_fixture_vintages(spark):
    """ts_us_expr must map bigint-nanosecond and timestamp(us) inputs
    to the same bigint UTC microseconds (the DuckDB epoch_us twin)."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.sources.parquet import ts_us_expr

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    us = 1705276800123456  # 2024-01-15 00:00:00.123456 UTC
    as_ns = spark.createDataFrame([Row(ts=us * 1000)])
    got_ns = as_ns.select(ts_us_expr(as_ns).alias("u")).first()["u"]
    naive = dt.datetime(2024, 1, 15, 0, 0, 0, 123456)
    as_ts = spark.createDataFrame([Row(ts=naive)])
    got_ts = as_ts.select(ts_us_expr(as_ts).alias("u")).first()["u"]
    assert got_ns == got_ts == us
    # ns floor: 999 extra nanoseconds truncate, never round up
    as_ns2 = spark.createDataFrame([Row(ts=us * 1000 + 999)])
    assert as_ns2.select(ts_us_expr(as_ns2).alias("u")).first()["u"] == us


def test_scale_profile_sizing_and_application(spark):
    """The single 100 TB session profile (session.scale_profile): sizing
    rules hold, and the runtime-settable knobs apply to a live session."""
    from cdk_datalake_ingest_spark.session import scale_profile

    p = scale_profile(data_tb=100, executors=1000, cores_per_executor=4)
    # 100 TB / 128 MB = 819200 shuffle partitions — above the 2x-cores
    # floor of 8000, so the data-volume rule wins
    assert int(p["spark.sql.shuffle.partitions"]) == (100 << 40) // (128 << 20)
    # tiny data: the 2-per-core floor wins (AQE coalesces down from it)
    small = scale_profile(data_tb=0.001, executors=2, cores_per_executor=4)
    assert int(small["spark.sql.shuffle.partitions"]) == 16
    assert int(p["spark.sql.autoBroadcastJoinThreshold"]) == 64 << 20
    assert int(p["spark.sql.adaptive.advisoryPartitionSizeInBytes"]) == 128 << 20
    assert int(p["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"]) == 256 << 20
    # every key is runtime-settable on a live session except the two
    # scan/shuffle-partition knobs (settable too) — apply and read back
    before = {k: spark.conf.get(k, None) for k in p}
    try:
        for k, v in p.items():
            spark.conf.set(k, v)
        for k, v in p.items():
            assert spark.conf.get(k) == v
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_raw_csv_hop_is_lossless_for_hostile_text(spark, tmp_path):
    """The S1/S7 raw-zone pair must round-trip the text a real DMS
    extract contains. Two writer/reader defaults silently broke that:
    the default reader splits records on raw newlines regardless of
    quoting (a newline-bearing VARCHAR became a corrupt extra row),
    and the default WRITER trims leading/trailing whitespace (byte
    loss). multiLine + trim-off fix both; the one documented
    canonicalization is '' -> NULL (CSV cannot portably carry the
    distinction, and the reference's primary source dialect, Oracle,
    erases it source-side)."""
    rows = [
        (1, "line1\nline2"),
        (2, "crlf\r\nhere"),
        (3, 'quote " inside'),
        (4, None),
        (5, ""),
        (6, "unicode 春 🚀 café"),
        (7, "tab\tand,comma"),
        (8, "\\backslash"),
        (9, " pad both ends "),
    ]
    df = spark.createDataFrame(
        [(str(a), b) for a, b in rows], "id string, txt string"
    )
    p = str(tmp_path / "raw")
    write_raw_csv(df, p, mode="overwrite")
    got = sorted(
        (tuple(r) for r in read_raw_csv(spark, p).collect()),
        key=lambda t: int(t[0]),
    )
    want = sorted(
        ((str(a), None if b == "" else b) for a, b in rows),
        key=lambda t: int(t[0]),
    )
    assert got == want
