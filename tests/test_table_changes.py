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


# ---------------------------------------------------------------------------
# Property: keyed diff == direct Python reference == keyless exceptAll
# (same pattern as substring dedup's direct-Python twin)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),   # key
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),        # name
    st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),  # val
)
_snap = st.lists(_row, min_size=0, max_size=8)


def _write_versions(spark, tmp, old_rows, new_rows, evolve):
    import tempfile

    t = ManagedTable(spark, tempfile.mkdtemp(dir=tmp, prefix="cdc_prop_"))
    t.write(
        spark.createDataFrame(old_rows, "k int, name string, val int")
        if old_rows
        else spark.createDataFrame([], "k int, name string, val int")
    )
    if evolve:
        rows2 = [(k, n, v, None if v is None else str(v)) for k, n, v in new_rows]
        schema2 = "k int, name string, val int, extra string"
    else:
        rows2, schema2 = new_rows, "k int, name string, val int"
    t.write(
        spark.createDataFrame(rows2, schema2)
        if rows2
        else spark.createDataFrame([], schema2)
    )
    return t


@given(old=_snap, new=_snap, evolve=st.booleans())
@settings(max_examples=12, deadline=None)
def test_keyed_cdc_matches_python_reference(spark, tmp_path_factory, old, new, evolve):
    """Random snapshot pairs (NULL keys/values, schema evolution,
    duplicate keys): duplicate keys must raise; otherwise the keyed
    diff must equal a direct Python classification AND be content-
    equivalent to the keyless exceptAll diff (keyed update_pre/post ==
    keyless delete/insert of the same rows)."""
    tmp = tmp_path_factory.mktemp("cdcprop")
    t = _write_versions(spark, tmp, old, new, evolve)

    def as_map(rows, extra):
        m = {}
        for r in rows:
            k, n, v = r
            m[k] = (n, v, (None if v is None else str(v)) if extra else None)
        return m

    dup = len({r[0] for r in old}) < len(old) or len({r[0] for r in new}) < len(new)
    if dup:
        with pytest.raises(Exception, match="duplicate key"):
            t.changes_between(1, 2, key_cols=["k"]).collect()
        return

    got = t.changes_between(1, 2, key_cols=["k"]).collect()
    cols = ["k", "name", "val"] + (["extra"] if evolve else [])
    got_set = {
        (tuple(r[c] for c in cols), r["_change_type"]) for r in got
    }
    assert all(r["_commit_version"] == 2 for r in got)

    # evolve pads old's missing `extra` with NULL — mirror that
    o = as_map(old, False)   # old never has extra; pad None below
    n = as_map(new, evolve)
    want = set()
    for k in n:
        row_n = (k, n[k][0], n[k][1]) + ((n[k][2],) if evolve else ())
        if k not in o:
            want.add((row_n, "insert"))
        else:
            row_o = (k, o[k][0], o[k][1]) + ((None,) if evolve else ())
            if row_o[1:] != row_n[1:]:
                want.add((row_o, "update_preimage"))
                want.add((row_n, "update_postimage"))
    for k in o:
        if k not in n:
            row_o = (k, o[k][0], o[k][1]) + ((None,) if evolve else ())
            want.add((row_o, "delete"))
    assert got_set == want

    # keyless multiset diff: same rows, coarser labels
    keyless = t.changes_between(1, 2).collect()

    def key_(rows):
        return sorted(
            rows, key=lambda r: tuple((x is None, str(x)) for x in r)
        )

    kl_ins = [
        tuple(r[c] for c in cols) for r in keyless
        if r["_change_type"] == "insert"
    ]
    kl_del = [
        tuple(r[c] for c in cols) for r in keyless
        if r["_change_type"] == "delete"
    ]
    kd_ins = [
        row for row, ct in got_set if ct in ("insert", "update_postimage")
    ]
    kd_del = [
        row for row, ct in got_set if ct in ("delete", "update_preimage")
    ]
    assert key_(kl_ins) == key_(kd_ins)
    assert key_(kl_del) == key_(kd_del)


def test_changes_rejects_reversed_version_range(spark, table):
    table.write(
        spark.createDataFrame(
            [(1, "a", 10.0)], "id long, name string, val double"
        )
    )
    with pytest.raises(ValueError, match="must not exceed"):
        table.changes_between(2, 1, key_cols=["id"])


def test_gate_emits_all_four_change_types(spark):
    """The registry gate's erasure+backfill scenario must produce every
    _change_type at fixture SFs — a delete predicate correlated with
    the source window silently starves the insert/delete branches of
    oracle coverage (round-8 ADVICE)."""
    from cdk_datalake_ingest_spark.queries import table_change_feed_events

    df = table_change_feed_events(spark, "/root/testdata/sf0.001")
    kinds = {r._change_type for r in df.select("_change_type").distinct().collect()}
    assert kinds == {"insert", "delete", "update_preimage", "update_postimage"}


def test_apply_changes_roundtrips_to_v2(spark, tmp_path):
    """apply_changes (the APPLY CHANGES INTO consumer) replays a
    changes_between feed onto a v1 replica and reproduces v2 exactly —
    inserts, updates, deletes, and the history op label."""
    t = ManagedTable(spark, tmp_path / "src")
    t.write(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, val double",
        )
    )
    t.merge_upsert(
        spark.createDataFrame(
            [(2, "B", 21.0), (4, "d", 40.0)],
            "id long, name string, val double",
        ),
        ["id"],
        delete_predicate=F.col("id") == 3,
    )
    feed = t.changes_between(1, 2, key_cols=["id"])
    replica = ManagedTable(spark, tmp_path / "replica")
    replica.write(t.read(version=1))
    replica.apply_changes(feed, ["id"])
    assert _rows(replica.read()) == _rows(t.read(version=2))
    assert replica.history(limit=1)[0]["op"] == "apply_changes"


def test_apply_changes_under_schema_evolution(spark, tmp_path):
    """A feed from a schema-evolved diff carries v2's new column; the
    replica evolves on apply, with pre-existing rows taking the same
    NULLs the snapshot diff compared against."""
    t = ManagedTable(spark, tmp_path / "src")
    t.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    )
    t.merge_upsert(
        spark.createDataFrame(
            [(2, "B", 2.5), (3, "c", 3.5)], "id long, name string, score double"
        ),
        ["id"],
    )
    feed = t.changes_between(1, 2, key_cols=["id"])
    replica = ManagedTable(spark, tmp_path / "replica")
    replica.write(t.read(version=1))
    replica.apply_changes(feed, ["id"])
    assert sorted(replica.read().columns) == sorted(t.read(version=2).columns)
    assert _rows(replica.read().select("id", "name", "score")) == _rows(
        t.read(version=2).select("id", "name", "score")
    )


def test_apply_changes_null_keyed_rows(spark, tmp_path):
    """NULL is a legitimate key value: an update/delete for a
    NULL-keyed row must evict the stale preimage (eqNullSafe
    anti-join, matching changes_between's classification).  A
    name-list anti-join never matches NULL keys and leaves both
    (None, 'a') and (None, 'A') in the replica — the ADVICE r9
    repro."""
    t2 = ManagedTable(spark, tmp_path / "src2")
    t2.write(
        spark.createDataFrame(
            [(None, "a"), (1, "x")], "id long, name string"
        )
    )
    t2.write(
        spark.createDataFrame(
            [(None, "A"), (1, "x")], "id long, name string"
        )
    )
    feed = t2.changes_between(1, 2, key_cols=["id"])
    replica = ManagedTable(spark, tmp_path / "replica")
    replica.write(t2.read(version=1))
    replica.apply_changes(feed, ["id"])
    got = {(r["id"], r["name"]) for r in replica.read().collect()}
    assert got == {(1, "x"), (None, "A")}
    assert replica.read().count() == 2  # stale (None,'a') evicted
    # exact v2 equality both directions
    assert replica.read().exceptAll(t2.read(version=2)).count() == 0
    assert t2.read(version=2).exceptAll(replica.read()).count() == 0
    # and a NULL-keyed delete
    t2.write(
        spark.createDataFrame([(1, "x")], "id long, name string")
    )
    feed2 = t2.changes_between(2, 3, key_cols=["id"])
    replica.apply_changes(feed2, ["id"])
    assert [tuple(r) for r in replica.read().collect()] == [(1, "x")]


def test_apply_changes_requires_feed_shape(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "src")
    t.write(spark.createDataFrame([(1, "a")], "id long, name string"))
    with pytest.raises(ValueError, match="_change_type"):
        t.apply_changes(t.read(), ["id"])


def test_changes_between_requires_keys_in_both_snapshots(spark, tmp_path):
    """A key column present in only one snapshot would be NULL-padded
    for every row of the other side, firing the unique-key guard
    spuriously (or collapsing all rows into one NULL key group with
    the guard off) — rejected up front with the side named. Schema
    evolution stays supported for DATA columns."""
    t = ManagedTable(spark, tmp_path / "keysboth")
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20)], "id long, v string, b long"
        )
    )
    with pytest.raises(ValueError, match="v_from.*version 1"):
        t.changes_between(1, 2, key_cols=["b"])
    # data-column evolution still diffs fine on a spanning key
    out = t.changes_between(1, 2, key_cols=["id"])
    types = {r["_change_type"] for r in out.collect()}
    assert types == {"update_preimage", "update_postimage"}
