"""ManagedTable maintenance: compaction (bin-packing) and clustered
rewrite (min/max data skipping)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.table import ManagedTable


def _fill(spark, path, n=5000, files=20):
    t = ManagedTable(spark, path)
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            # write in key-shuffled order so clustering has work to do
            F.xxhash64("id").alias("noise"),
        )
        .orderBy("noise")
        .repartition(files)
    )
    t.write(df)
    return t


def _files_of(t):
    return (
        t.read()
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )


def test_compact_reduces_files_preserves_data(spark, tmp_path):
    t = _fill(spark, tmp_path / "t")
    assert len(_files_of(t)) == 20
    before = sorted(r.k for r in t.read().collect())
    t.compact(num_files=2)
    assert len(_files_of(t)) == 2
    assert sorted(r.k for r in t.read().collect()) == before
    # pre-compaction snapshot still readable (time travel until vacuum)
    versions = t.versions()
    assert len(versions) >= 2
    assert t.read(version=versions[-2]).count() == len(before)


def test_compact_auto_sizing(spark, tmp_path):
    t = _fill(spark, tmp_path / "t2")
    t.compact(target_file_bytes=10**9)  # everything fits one file
    assert len(_files_of(t)) == 1


def test_optimize_clusters_key_ranges_disjoint(spark, tmp_path):
    t = _fill(spark, tmp_path / "t3")
    # before: shuffled write -> every file spans ~the whole key range
    spans = _files_of(t)
    assert any(r.hi - r.lo > 4000 for r in spans)
    t.optimize(cluster_by=["k"], num_files=8)
    spans = sorted(_files_of(t), key=lambda r: r.lo)
    assert len(spans) == 8
    for a, b in zip(spans, spans[1:]):  # pairwise-disjoint min/max
        assert a.hi < b.lo
    # data unchanged
    assert t.read().count() == 5000


def test_optimize_enables_file_pruning_shape(spark, tmp_path):
    """After clustering, a narrow range predicate overlaps few files'
    [min,max] — the static stand-in for footer-stats pruning."""
    t = _fill(spark, tmp_path / "t4")
    t.optimize(cluster_by=["k"], num_files=10)
    spans = _files_of(t)
    lo, hi = 100, 200
    overlapping = [r for r in spans if r.lo <= hi and r.hi >= lo]
    assert len(overlapping) <= 2


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partition pruning on a partitioned ManagedTable: a
    filter on the partition column must reach the scan as a partition
    filter (scanning one directory, not the table)."""
    import contextlib
    import io

    t = ManagedTable(spark, tmp_path / "part")
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("day"),
    )
    t.write(df, partition_by=["day"])
    got = t.read().filter(F.col("day") == "3")
    assert got.count() == len([i for i in range(1000) if i % 7 == 3])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # exactly one of the seven partition dirs is read
    files = got.select(F.input_file_name().alias("f")).distinct().collect()
    assert all("day=3" in r.f for r in files)


def test_compact_hot_partitions_scoped(spark, tmp_path):
    """Only partitions over the file-count threshold are rewritten
    (to one file); cold partitions are hard-linked forward."""
    import os

    from pyspark.sql import Row

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "hot")
    # hot partition (20240101): many files via a wide repartition;
    # cold partition (20240102): a single file
    hot = spark.createDataFrame(
        [Row(k=i, period=20240101, v=i * 1.0) for i in range(64)]
    ).repartition(16)
    cold = spark.createDataFrame(
        [Row(k=100 + i, period=20240102, v=0.0) for i in range(4)]
    ).coalesce(1)
    t.write(hot.unionByName(cold), partition_by=["period"])
    snap1 = t.path / "v00001"
    n_hot_before = sum(
        1 for _ in (snap1 / "period=20240101").rglob("*.parquet"))
    assert n_hot_before > 8
    cold_inodes = {
        p.name: os.stat(p).st_ino
        for p in (snap1 / "period=20240102").rglob("*.parquet")
    }

    compacted = t.compact_hot_partitions(max_files=8)
    assert compacted == [("20240101",)]
    snap2 = t.path / "v00002"
    assert sum(1 for _ in (snap2 / "period=20240101").rglob("*.parquet")) == 1
    after = {
        p.name: os.stat(p).st_ino
        for p in (snap2 / "period=20240102").rglob("*.parquet")
    }
    assert after == cold_inodes  # cold partition linked, not rewritten
    # data unchanged
    got = {(r.k, r.period) for r in t.read().collect()}
    assert got == {(i, 20240101) for i in range(64)} | {
        (100 + i, 20240102) for i in range(4)}
    # below-threshold table: no-op
    assert t.compact_hot_partitions(max_files=8) == []


# ---------------------------------------------------------------------------
# restore — Delta RESTORE TO VERSION AS OF over versioned snapshots
# ---------------------------------------------------------------------------


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    import pytest

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "rt")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.write(spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string"))
    new_v = t.restore(1)
    assert new_v == 3
    # restored content == v1, committed as v3; history preserved
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b")]
    assert sorted(map(tuple, t.read(version=2).collect())) == [
        (1, "a2"), (3, "c")
    ]
    assert t.versions() == [1, 2, 3]
    with pytest.raises(FileNotFoundError, match="does not exist"):
        t.restore(9)


def test_restore_is_zero_copy_and_cdf_visible(spark, tmp_path):
    """The restore commit hard-links the old snapshot's files (no data
    rewrite), and a CDF consumer sees the rollback as ordinary row
    changes."""
    import os

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "rt2")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.write(spark.createDataFrame([(1, "a2")], "id long, v string"))
    t.restore(1)
    linked = [
        f
        for f in (t.path / "v00003").rglob("*.parquet")
        if os.stat(f).st_nlink > 1
    ]
    assert linked, "restore should hard-link, not rewrite"
    ch = {
        (r["id"], r["_change_type"]): r["v"]
        for r in t.changes_between(2, 3, key_cols=["id"]).collect()
    }
    assert ch == {
        (2, "insert"): "b",              # the un-delete comes back
        (1, "update_preimage"): "a2",    # the undone update, as a pair
        (1, "update_postimage"): "a",
    }


def test_restore_recovers_old_partition_layout(spark, tmp_path):
    """Restoring across a re-partitioning infers partition_by from the
    restored snapshot's hive layout, so the manifest (and with it the
    scoped-merge fast path) matches the data on disk."""
    import json

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "rt3")
    t.write(
        spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20)], "id long, part string, v int"
        ),
        partition_by=["part"],
    )
    t.write(
        spark.createDataFrame([(9, "z", 90)], "id long, part string, v int")
    )  # unpartitioned overwrite
    t.restore(1)
    m = json.loads((t.path / "_manifest.json").read_text())
    assert m["partition_by"] == ["part"]
    # partitioned reads append the partition column last — compare by name
    got = sorted(
        (r["id"], r["part"], r["v"]) for r in t.read().collect()
    )
    assert got == [(1, "x", 10), (2, "y", 20)]


# ---------------------------------------------------------------------------
# clone — Delta shallow CLONE (zero-copy independent table copy)
# ---------------------------------------------------------------------------


def test_clone_is_zero_copy_and_divergent(spark, tmp_path):
    """The clone shares data blocks via hard links but histories are
    fully independent: writes and vacuum on either side never change
    what the other reads."""
    import os

    import pytest

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "src")
    t.write(
        spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20)], "id long, part string, v int"
        ),
        partition_by=["part"],
    )
    c = t.clone(tmp_path / "dev")
    assert sorted((r["id"], r["part"], r["v"]) for r in c.read().collect()) \
        == [(1, "x", 10), (2, "y", 20)]
    # zero-copy: cloned files share inodes with the source
    linked = [
        f for f in (c.path / "v00001").rglob("*.parquet")
        if os.stat(f).st_nlink > 1
    ]
    assert linked
    # partition layout carried over -> scoped merges work on the clone
    import json
    m = json.loads((c.path / "_manifest.json").read_text())
    assert m["partition_by"] == ["part"]

    # divergence: write to the clone, source unchanged; vacuum source,
    # clone still reads (links hold the blocks)
    c.merge_upsert(
        spark.createDataFrame([(1, "x", 99)], "id long, part string, v int"),
        ["id"],
    )
    assert sorted(r["v"] for r in c.read().collect()) == [20, 99]
    assert sorted(r["v"] for r in t.read().collect()) == [10, 20]
    t.write(spark.createDataFrame([(7, "q", 7)], "id long, part string, v int"))
    t.vacuum()
    assert sorted(r["v"] for r in c.read().collect()) == [20, 99]

    with pytest.raises(FileExistsError, match="already a ManagedTable"):
        t.clone(tmp_path / "dev")


def test_history_logs_every_commit_op(spark, tmp_path):
    """DESCRIBE HISTORY role: one entry per commit, newest first, with
    the operation that produced it — across overwrite, merge (scoped
    and full), delete, compact, restore and clone; order == commit
    order because the log is appended inside the commit critical
    section, and history survives vacuum."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "h")
    t.write(spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0)], "id long, part string, v double"
    ), partition_by=["part"])
    t.merge_upsert(
        spark.createDataFrame([(1, "x", 99.0)], "id long, part string, v double"),
        ["id"],
    )
    t.delete_where(F.col("id") == 2)
    t.compact(1)
    t.restore(1)
    c = t.clone(tmp_path / "h_clone")

    ops = [(e["version"], e["op"]) for e in t.history()]
    assert ops == [
        (5, "restore(v1)"),
        (4, "compact"),
        (3, "delete"),
        (2, "merge"),
        (1, "overwrite"),
    ]
    assert all(e["timestamp"] for e in t.history())
    assert t.history(limit=2) == t.history()[:2]
    clone_ops = [(e["version"], e["op"]) for e in c.history()]
    assert clone_ops == [(1, f"clone({t.path})")]

    # history survives vacuum (describes versions whose data is gone)
    t.vacuum()
    assert [e["version"] for e in t.history()] == [5, 4, 3, 2, 1]

    # pre-log tables synthesize from on-disk versions
    (t.path / "_history.jsonl").unlink()
    assert [(e["version"], e["op"]) for e in t.history()] == [(5, "unknown")]


def test_history_merges_prelog_versions_with_new_log(spark, tmp_path):
    """A pre-log table that takes one logged commit must still show its
    older on-disk versions (synthesized 'unknown'), not a one-entry
    history (round-8 ADVICE)."""
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "h2")
    t.write(spark.range(1))
    t.write(spark.range(2))
    (t.path / "_history.jsonl").unlink()  # simulate a pre-log table
    t.write(spark.range(3))  # first logged commit
    hist = [(e["version"], e["op"]) for e in t.history()]
    assert hist == [(3, "overwrite"), (2, "unknown"), (1, "unknown")]
    # limit applies to the merged, newest-first view
    assert [e["version"] for e in t.history(limit=2)] == [3, 2]


def test_optimize_zorder_skips_files_on_trailing_column(spark, tmp_path):
    """Z-order vs linear clustering on two independent uniform keys:
    after linear optimize on x, a predicate on y alone can prune
    nothing (every file spans y's full range); after zorder on (x, y),
    per-file min/max prunes most files for BOTH single-column box
    predicates — and the rewrite is content-preserving."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    n, files = 8192, 8
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        F.pmod(F.hash(F.col("id")), F.lit(64)).alias("y"),
    )

    def candidate_files(t, col, lo, hi):
        stats = (
            t.read()
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        )
        total = len(stats)
        cand = sum(1 for r in stats if r.hi >= lo and r.lo <= hi)
        return cand, total

    lin = ManagedTable(spark, tmp_path / "lin")
    lin.write(base)
    lin.optimize(["x"], num_files=files)
    z = ManagedTable(spark, tmp_path / "zord")
    z.write(base)
    z.optimize(["x", "y"], num_files=files, zorder=True)

    # content preserved exactly
    assert z.read().exceptAll(base).count() == 0
    assert base.exceptAll(z.read()).count() == 0
    assert [e["op"] for e in z.history(limit=1)] == ["zorder"]

    cand_lin_y, tot_lin = candidate_files(lin, "y", 10, 17)
    cand_z_y, tot_z = candidate_files(z, "y", 10, 17)
    cand_z_x, _ = candidate_files(z, "x", 10, 17)
    assert tot_lin == files and tot_z == files
    # linear-on-x cannot prune on y at all; zorder must prune ~HALF the
    # files on BOTH dimensions — the same structural bound the driver
    # gate raises on in-line (queries.py:zorder_layout_events): with 8
    # quantile-range files the top 3 z-bits split 2:1 between the dims,
    # so the top-bit owner (y here) prunes to <= half and the other to
    # <= half+1 (octants non-contiguous in z-range -> one straddling
    # range boundary).  `< files` would pass on pruning one file; this
    # is the bound that shows the layout MATTERS.
    assert cand_lin_y == files
    assert cand_z_y <= files // 2
    assert cand_z_x <= files // 2 + 1
    # and Z strictly beats linear where linear is blind: the trailing
    # dimension
    assert cand_z_y < cand_lin_y


def test_exact_hash_salts_match_spark_partitioning(spark):
    """The z-octant routing (optimize zorder, power-of-two num_files)
    maps cell ids through _exact_hash_salts so `repartition(n, salt)`
    routes cell i to partition i EXACTLY — which is only true if the
    Python murmur3 replica computes the same hash Spark's
    HashPartitioning does.  Pin the whole salt table against a live
    ``pmod(hash(...), n)`` for every file count the API accepts."""
    from cdk_datalake_ingest_spark.operators.table import (
        _exact_hash_salts,
        _murmur3_hash_int32,
    )

    for n in (2, 4, 8, 16, 32):
        salts = _exact_hash_salts(n)
        exprs = ", ".join(
            f"pmod(hash({s}), {n})" for s in salts
        )
        got = list(spark.sql(f"SELECT {exprs}").first())
        assert got == list(range(n)), (n, salts, got)
    # and the raw hash replica itself, across sign/extremes
    vals = [0, 1, 7, 42, -1, 2**31 - 1, -(2**31)]
    exprs = ", ".join(f"hash(cast({v} as int))" for v in vals)
    got = list(spark.sql(f"SELECT {exprs}").first())
    assert got == [_murmur3_hash_int32(v) for v in vals]


def test_optimize_zorder_rejects_unrankable_and_bad_bits(spark, tmp_path):
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "zbad")
    t.write(spark.range(4).select("id", F.lit("s").alias("name")))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rankable"):
        t.optimize(["name"], zorder=True)
    with _pytest.raises(ValueError, match="not in schema"):
        t.optimize(["nope"], zorder=True)
    with _pytest.raises(ValueError, match="zorder_bits"):
        t.optimize(["id"], zorder=True, zorder_bits=0)
    with _pytest.raises(ValueError, match=">=1 column"):
        t.optimize([], zorder=True)


def test_optimize_zorder_nulls_and_time_travel(spark, tmp_path):
    """NULL z-keys rank into bucket 0 (rows survive the rewrite), and
    the pre-optimize version stays time-travelable."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "znull")
    df = spark.range(100).select(
        "id",
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("x"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    t.write(df)
    t.optimize(["x", "v"], num_files=4, zorder=True)
    assert t.read().count() == 100
    assert t.read().filter(F.col("x").isNull()).count() == 10
    assert t.read(version=1).exceptAll(df).count() == 0


def test_detail_describes_current_snapshot(spark, tmp_path):
    """DESCRIBE DETAIL role: version, partitioning, file count, bytes,
    and surviving snapshot count — and it tracks maintenance ops."""
    import contextlib
    import io
    import json as _json

    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.__main__ import main
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "det")
    t.write(
        spark.range(100).withColumn("p", F.col("id") % 2),
        partition_by=["p"],
    )
    d = t.detail()
    assert d["version"] == 1 and d["partition_by"] == ["p"]
    assert d["num_files"] >= 2 and d["size_bytes"] > 0
    assert d["num_snapshots"] == 1

    t.compact(1)
    d2 = t.detail()
    assert d2["version"] == 2 and d2["num_snapshots"] == 2
    assert d2["num_files"] <= d["num_files"]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["table", str(t.path), "detail"]) == 0
    assert _json.loads(buf.getvalue())["version"] == 2

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        ManagedTable(spark, tmp_path / "nope").detail()


def test_compact_hot_partitions_with_zorder_clusters_in_file(spark, tmp_path):
    """OPTIMIZE WHERE ... ZORDER BY: the hot partition's rewritten file
    holds rows clustered by the interleaved z-value (monotone z in file
    order), content is preserved, and cold partitions still hard-link
    forward."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "hotz")
    hot = spark.createDataFrame(
        [
            Row(k=i, period=20240101, x=i % 32, y=(i * 37) % 32)
            for i in range(256)
        ]
    ).repartition(16)
    cold = spark.createDataFrame(
        [Row(k=1000 + i, period=20240102, x=0, y=0) for i in range(4)]
    ).coalesce(1)
    t.write(hot.unionByName(cold), partition_by=["period"])
    cold_inodes = {
        os.stat(p).st_ino
        for p in (t.path / "v00001" / "period=20240102").rglob("*.parquet")
    }

    compacted = t.compact_hot_partitions(max_files=8, zorder_by=["x", "y"])
    assert compacted == [("20240101",)]
    # content preserved exactly
    before = sorted(
        tuple(r) for r in t.read(version=1).select("k", "x", "y").collect()
    )
    after = sorted(
        tuple(r) for r in t.read().select("k", "x", "y").collect()
    )
    assert after == before
    # single rewritten file, rows inside it z-clustered: recompute the
    # z-value in file order and require monotone non-decreasing
    hot_dir = t.path / "v00002" / "period=20240101"
    assert sum(1 for _ in hot_dir.rglob("*.parquet")) == 1
    zc = ManagedTable._zvalue_column(
        t.read().filter(F.col("period") == 20240101), ["x", "y"], 6
    )
    rows = (
        spark.read.parquet(str(hot_dir))
        .withColumn("__z", zc)
        .select("__z")
        .collect()
    )
    zs = [r["__z"] for r in rows]
    assert zs == sorted(zs), "file rows are not z-clustered"
    # cold partition hard-linked forward
    after_inodes = {
        os.stat(p).st_ino
        for p in (t.path / "v00002" / "period=20240102").rglob("*.parquet")
    }
    assert after_inodes == cold_inodes


def test_orphan_claims_are_not_versions(spark, tmp_path):
    """A snapshot dir NEWER than the manifest (a CAS-losing writer's
    orphan, or an in-flight claim) is uncommitted: it must not appear
    in versions(), must not be readable as time travel, must not
    synthesize into history as the newest entry — and vacuum reclaims
    it only via the explicit age-gated opt-in."""
    import pytest

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "orphan")
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    # simulate a writer that claimed v00002, wrote data, lost the CAS
    orphan = t.path / "v00002"
    orphan.mkdir()
    (orphan / "part-orphan.parquet").write_bytes(b"not committed")
    assert t.versions() == [1]
    with pytest.raises(FileNotFoundError, match="not committed"):
        t.read(version=2)
    assert t.history()[0]["version"] == 1
    # default vacuum never touches claims (may be a live writer's)
    assert t.vacuum() == []
    assert orphan.is_dir()
    # explicit opt-in with age threshold 0 reclaims it
    assert t.vacuum(drop_aborted_after_s=0.0) == ["v00002"]
    assert not orphan.exists()
    assert t.read().count() == 1


def test_vacuum_rejects_keep_zero(spark, tmp_path):
    """keep_snapshots=0 would rmtree the CURRENT snapshot out from
    under the manifest — rejected."""
    import pytest

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    t = ManagedTable(spark, tmp_path / "keepzero")
    t.write(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="keep_snapshots"):
        t.vacuum(keep_snapshots=0)
    assert t.read().count() == 1


def test_partition_value_fidelity(spark, tmp_path):
    """Hostile partition VALUES through the hive-partitioned snapshot
    layout: Unicode/space/slash/equals/ampersand values round-trip via
    directory-name escaping and NULL survives the hive default
    partition; the one documented canonicalization is '' -> NULL (both
    serialize to __HIVE_DEFAULT_PARTITION__ — a layout property every
    hive-layout engine shares, not a bug here)."""
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    rows = [
        (1, "a", 1.0),
        (2, None, 2.0),
        (3, "", 3.0),  # canonicalizes to NULL
        (4, "sp ace", 4.0),
        (5, "uni春🚀", 5.0),
        (6, "slash/colon:", 6.0),
        (7, "eq=amp&", 7.0),
    ]
    df = spark.createDataFrame(rows, "id long, part string, v double")
    t = ManagedTable(spark, str(tmp_path / "pfid"))
    t.write(df, partition_by=["part"])
    got = sorted(
        ((r.id, r.part, r.v) for r in t.read().collect()),
        key=lambda x: x[0],
    )
    want = sorted(
        ((i, None if p == "" else p, v) for i, p, v in rows),
        key=lambda x: x[0],
    )
    assert got == want
