"""Full-load replication lifecycle (S13/R3) + landing promotion (S15).

The gated query dms_full_load_pipeline_orders exercises the happy path
end-to-end against the driver's oracle; these tests pin the control
plane's contracts — state machine sequences, mapping/settings parsing,
failure discrimination, rename semantics — including the branches the
happy path never takes.
"""

from __future__ import annotations

import datetime as dt
import gzip
import json

import pytest
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.landing import (
    PrefixStore,
    add_time_stamp_to_file_name,
    promote,
)
from cdk_datalake_ingest_spark.operators.replication import (
    FULL_LOAD_FINISHED,
    FullLoadSettings,
    ReplicationEngine,
    build_selection_query,
    check_task_creation,
    check_task_status,
    parse_table_mappings,
    run_full_load,
)
from cdk_datalake_ingest_spark.sources.csv import read_raw_csv
from cdk_datalake_ingest_spark.specs import EndpointSpec

MAPPINGS = {
    "rules": [
        {
            "rule-type": "selection",
            "rule-action": "include",
            "rule-id": 0,
            "rule-name": "app-t-t-task",
            "object-locator": {"schema-name": "APP", "table-name": "T1"},
            "filters": [
                {
                    "filter-type": "source",
                    "column-name": "K",
                    "filter-conditions": [
                        {"filter-operator": "between", "start-value": 2,
                         "end-value": 5}
                    ],
                }
            ],
        },
        {
            "rule-type": "table-settings",
            "object-locator": {"schema-name": "APP", "table-name": "T1"},
            "parallel-load": {"type": "ranges", "columns": ["K"]},
        },
    ]
}


# ---------------------------------------------------------------------------
# mapping / settings parsing
# ---------------------------------------------------------------------------


def test_parse_table_mappings_selection_and_parallel_load():
    rules = parse_table_mappings(json.dumps(MAPPINGS))
    assert len(rules) == 1
    r = rules[0]
    assert (r.schema_name, r.table_name) == ("APP", "T1")
    assert (r.filter_column, r.filter_start, r.filter_end) == ("K", 2, 5)
    assert r.partition_column == "K"


def test_parse_table_mappings_rejects_exclude_and_injection():
    bad = {"rules": [{"rule-type": "selection", "rule-action": "exclude",
                      "object-locator": {"schema-name": "A", "table-name": "B"}}]}
    with pytest.raises(ValueError):
        parse_table_mappings(bad)
    inj = {"rules": [{"rule-type": "selection", "rule-action": "include",
                      "object-locator": {"schema-name": "A",
                                         "table-name": "B; DROP TABLE X"}}]}
    with pytest.raises(ValueError):
        parse_table_mappings(inj)
    with pytest.raises(ValueError):
        parse_table_mappings({"rules": []})


def _sel(rule_id=None, locator=True, filters=None, **over):
    r = {"rule-type": "selection", "rule-action": "include"}
    if locator:
        r["object-locator"] = {"schema-name": "APP", "table-name": "T1"}
    if rule_id is not None:
        r["rule-id"] = rule_id
    if filters is not None:
        r["filters"] = filters
    r.update(over)
    return r


def test_parse_table_mappings_hostile_inputs():
    # duplicate rule-ids shadow a table selection → rejected
    with pytest.raises(ValueError, match="duplicate rule-id"):
        parse_table_mappings({"rules": [_sel(rule_id=7), _sel(rule_id=7)]})
    # missing object-locator (and partial locators) → config error,
    # never a raw KeyError
    with pytest.raises(ValueError, match="object-locator"):
        parse_table_mappings({"rules": [_sel(locator=False)]})
    with pytest.raises(ValueError, match="object-locator"):
        parse_table_mappings(
            {"rules": [_sel(**{"object-locator": {"schema-name": "A"}})]}
        )
    # table-settings rules are held to the same locator contract
    with pytest.raises(ValueError, match="object-locator"):
        parse_table_mappings(
            {"rules": [
                _sel(rule_id=1),
                {"rule-type": "table-settings",
                 "parallel-load": {"type": "ranges", "columns": ["K"]}},
            ]}
        )
    # truncated/overfull filter-conditions → rejected, not misread
    with pytest.raises(ValueError, match="exactly one filter-condition"):
        parse_table_mappings(
            {"rules": [_sel(filters=[
                {"filter-type": "source", "column-name": "K",
                 "filter-conditions": []}])]}
        )
    with pytest.raises(ValueError, match="exactly one filter-condition"):
        parse_table_mappings(
            {"rules": [_sel(filters=[
                {"filter-type": "source", "column-name": "K",
                 "filter-conditions": [
                     {"filter-operator": "between", "start-value": 1,
                      "end-value": 2},
                     {"filter-operator": "between", "start-value": 3,
                      "end-value": 4}]}])]}
        )
    # between condition missing its bounds or column
    with pytest.raises(ValueError, match="missing"):
        parse_table_mappings(
            {"rules": [_sel(filters=[
                {"filter-type": "source", "column-name": "K",
                 "filter-conditions": [
                     {"filter-operator": "between", "start-value": 1}]}])]}
        )
    with pytest.raises(ValueError, match="missing"):
        parse_table_mappings(
            {"rules": [_sel(filters=[
                {"filter-type": "source",
                 "filter-conditions": [
                     {"filter-operator": "between", "start-value": 1,
                      "end-value": 2}]}])]}
        )
    # top-level shape errors
    with pytest.raises(ValueError):
        parse_table_mappings({"rules": "not-a-list"})
    with pytest.raises(ValueError):
        parse_table_mappings([])  # not an object


def test_auto_rule_id_never_steals_a_later_explicit_id():
    """An id-less rule placed BEFORE an explicit rule must not
    auto-claim the explicit id (which would spuriously reject a valid
    document as a duplicate). Assignment is two-pass: explicit ids
    claim first, autos fill the free slots."""
    rules = parse_table_mappings(
        {"rules": [_sel(), _sel(rule_id=0), _sel(rule_id=2), _sel()]}
    )
    ids = [r.rule_id for r in rules]
    assert len(ids) == len(set(ids)) == 4
    assert 0 in ids and 2 in ids  # explicit ids honored verbatim
    # genuine duplicate EXPLICIT ids still rejected
    with pytest.raises(ValueError, match="duplicate rule-id"):
        parse_table_mappings({"rules": [_sel(rule_id=3), _sel(rule_id=3)]})


def test_parse_table_mappings_never_raises_raw_keyerror():
    """Property: over randomly mangled rule docs the parser either
    parses or raises ValueError — no KeyError/IndexError/TypeError
    leaks from a hostile document."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # scalars INCLUDE the magic discriminator values so the fuzz
    # actually reaches the selection / table-settings / source-filter /
    # between branches (plain short text never spells "selection")
    scalar = st.one_of(
        st.none(),
        st.integers(-5, 5),
        st.text(max_size=6),
        st.sampled_from(
            ["selection", "table-settings", "include", "exclude",
             "source", "between", "APP", "T1", "K"]
        ),
    )
    frag = st.recursive(
        scalar,
        lambda c: st.one_of(
            st.lists(c, max_size=3),
            st.dictionaries(
                st.sampled_from(
                    ["rule-type", "rule-action", "rule-id", "rule-name",
                     "object-locator", "schema-name", "table-name",
                     "filters", "filter-type", "filter-conditions",
                     "filter-operator", "start-value", "end-value",
                     "column-name", "parallel-load", "columns", "rules"]
                ),
                c,
                max_size=4,
            ),
        ),
        max_leaves=12,
    )

    @given(st.dictionaries(st.just("rules"), st.lists(frag, max_size=4)))
    @settings(max_examples=150, deadline=None)
    def run(doc):
        try:
            parse_table_mappings(doc)
        except ValueError:
            pass

    run()


def test_selection_query_rendering():
    rules = parse_table_mappings(MAPPINGS)
    assert build_selection_query(rules[0]) == (
        "SELECT * FROM APP.T1 WHERE K BETWEEN 2 AND 5"
    )
    # string filter values are quoted with embedded quotes doubled
    m = {"rules": [{"rule-type": "selection", "rule-action": "include",
                    "object-locator": {"schema-name": "A", "table-name": "B"},
                    "filters": [{"filter-type": "source", "column-name": "C",
                                 "filter-conditions": [
                                     {"filter-operator": "between",
                                      "start-value": "a'x",
                                      "end-value": "z"}]}]}]}
    assert "BETWEEN 'a''x' AND 'z'" in build_selection_query(
        parse_table_mappings(m)[0]
    )


def test_full_load_settings_from_reference_json():
    s = FullLoadSettings.from_task_settings(
        '{"Logging": {"EnableLogging": true}, "FullLoadSettings": {'
        '"TargetTablePrepMode": "DROP_AND_CREATE", "MaxFullLoadSubTasks": 6,'
        ' "CommitRate": 10000}}'
    )
    assert s.target_table_prep_mode == "DROP_AND_CREATE"
    assert s.max_full_load_sub_tasks == 6
    assert s.commit_rate == 10000
    assert FullLoadSettings.from_task_settings(None).commit_rate == 10000


# ---------------------------------------------------------------------------
# state machine + supervisor
# ---------------------------------------------------------------------------


@pytest.fixture()
def derby_engine(spark, tmp_path):
    """Engine over a Derby DB holding APP.T1 with keys 1..8."""
    db = str(tmp_path / "db")
    rows = [(k, f"v{k}") for k in range(1, 9)]
    spark.createDataFrame(rows, "K INT, V STRING").write.jdbc(
        url=f"jdbc:derby:{db};create=true",
        table="APP.T1",
        mode="overwrite",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    ep = EndpointSpec(endpoint_name="derby-t", bd_type="derby", db_name=db)
    return ReplicationEngine(spark, ep, landing_root=str(tmp_path / "store"))


def test_instance_and_task_status_sequences(derby_engine):
    eng = derby_engine
    inst = eng.create_replication_instance("repl-inst")
    assert inst.identifier.startswith("repl-inst-")  # timestamp suffix
    assert inst.describe()["Status"] == "creating"
    assert inst.describe()["Status"] == "available"

    arn = eng.create_replication_task("t1", MAPPINGS, inst)
    task = eng._tasks[arn]
    assert task.identifier == "ETLTask" + "t1"
    assert eng.describe_replication_task(arn)["Status"] == "ready"
    assert eng.start_replication_task(arn) == "RUNNING"
    # poller observes running, then stopped with the full-load sentinel
    assert eng.describe_replication_task(arn)["Status"] == "running"
    desc = eng.describe_replication_task(arn)
    assert desc["Status"] == "stopped"
    assert desc["StopReason"] == FULL_LOAD_FINISHED


def test_cdc_task_and_bad_start_rejected(derby_engine):
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    with pytest.raises(ValueError):
        eng.create_replication_task("t", MAPPINGS, inst, migration_type="cdc")
    arn = eng.create_replication_task("t", MAPPINGS, inst)
    assert eng.start_replication_task(arn, "resume-processing") == "FAILED"
    assert eng.start_replication_task("task:none") == "FAILED"


def test_supervisor_loads_and_filters(derby_engine, spark):
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    arn = eng.create_replication_task("t1", MAPPINGS, inst)
    out = run_full_load(eng, [arn])
    assert out == {"result": "SUCCESS", "failed_task": [], "load_status": "LOADED"}
    # landing layout + between filter honored: keys 2..5 only
    back = read_raw_csv(spark, eng._landing_path(eng._tasks[arn].rules[0]))
    assert sorted(int(r["K"]) for r in back.collect()) == [2, 3, 4, 5]


def test_supervisor_flags_failed_table(derby_engine):
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    missing = {"rules": [{"rule-type": "selection", "rule-action": "include",
                          "object-locator": {"schema-name": "APP",
                                             "table-name": "NO_SUCH"}}]}
    arn = eng.create_replication_task("bad", missing, inst)
    out = run_full_load(eng, [arn])
    assert out["result"] == "FAILED"
    assert out["failed_task"] == [arn]
    assert eng._tasks[arn].status == "failed"


def test_check_task_status_mapping(derby_engine):
    """CheckDMSReplicationTaskStatus.py:30-46 discrimination: in-flight
    → CREATING; stopped+sentinel → LOADED clean; stopped otherwise /
    failed → LOADED + failed_task."""
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    arn = eng.create_replication_task("t", MAPPINGS, inst)
    t = eng._tasks[arn]
    failed: list[str] = []
    # in-flight: poller keeps looping
    t.status = "starting"
    assert check_task_status(eng, arn, failed) == "CREATING"  # →running
    t.rules = []  # no-op load so running→stopped lands the sentinel
    t.status = "running"
    assert check_task_status(eng, arn, failed) == "LOADED"
    assert failed == []
    # a stop without the full-load sentinel counts as failed
    t.status = "stopped"
    t.stop_reason = "Stop Reason RECOVERABLE_ERROR"
    failed2: list[str] = []
    assert check_task_status(eng, arn, failed2) == "LOADED"
    assert failed2 == [arn]


def test_connection_probe_live_and_bypass(derby_engine, spark, tmp_path):
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    assert eng.test_connection(inst) == "SUCCESS"
    assert eng.test_connection("legacy_glue") == "SUCCESS"
    bad = ReplicationEngine(
        spark,
        EndpointSpec(endpoint_name="nope", bd_type="derby",
                     db_name=str(tmp_path / "missing-db")),
        landing_root=str(tmp_path / "s"),
    )
    assert bad.test_connection(bad.create_replication_instance("i")) == "FAILED"


def test_check_task_creation_discrimination(derby_engine):
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    arn = eng.create_replication_task("t", MAPPINGS, inst)
    # creating → first describe lands ready → SUCCESS
    assert check_task_creation(eng, arn, "CREATING") == "SUCCESS"
    eng._tasks[arn].status = "failed"
    assert check_task_creation(eng, arn, "CREATING") == "FAILED"
    eng._tasks[arn].status = "starting"  # in-flight: prior result kept
    assert check_task_creation(eng, arn, "PENDING") == "PENDING"
    assert check_task_creation(eng, "task:missing", "X") == "FAILED"


def test_empty_partitioned_full_load_succeeds(derby_engine, spark):
    """A selection matching zero rows with a partition column set must
    finish like DMS (FULL_LOAD_ONLY_FINISHED), not crash the stride
    probe: MIN/MAX come back NULL and the load falls back to the
    unpartitioned read, landing an empty (header-only) output."""
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    empty = json.loads(json.dumps(MAPPINGS))
    empty["rules"][0]["filters"][0]["filter-conditions"] = [
        {"filter-operator": "between", "start-value": 100, "end-value": 200}
    ]
    arn = eng.create_replication_task("t-empty", empty, inst)
    out = run_full_load(eng, [arn])
    assert out == {"result": "SUCCESS", "failed_task": [], "load_status": "LOADED"}
    back = read_raw_csv(spark, eng._landing_path(eng._tasks[arn].rules[0]))
    assert back.count() == 0


def test_do_nothing_prep_mode_appends(derby_engine, spark):
    eng = derby_engine
    inst = eng.create_replication_instance("i")
    settings = '{"FullLoadSettings": {"TargetTablePrepMode": "DO_NOTHING"}}'
    a1 = eng.create_replication_task("t1", MAPPINGS, inst,
                                     replication_task_settings=settings)
    a2 = eng.create_replication_task("t2", MAPPINGS, inst,
                                     replication_task_settings=settings)
    assert run_full_load(eng, [a1, a2])["result"] == "SUCCESS"
    back = read_raw_csv(spark, eng._landing_path(eng._tasks[a1].rules[0]))
    assert back.count() == 8  # 4 keys x 2 appended loads


# ---------------------------------------------------------------------------
# landing promotion (S15)
# ---------------------------------------------------------------------------


def _seed_landing(store: PrefixStore, n_files: int = 3) -> None:
    for i in range(n_files):
        p = store.root / "temp/derby/APP/ORDERS_FL"
        p.mkdir(parents=True, exist_ok=True)
        with gzip.open(p / f"part-{i:05d}.csv.gz", "wt") as f:
            f.write("K,V\n%d,x\n" % i)


def test_timestamp_rename_keeps_last_extension_only():
    now = dt.datetime(2026, 8, 14, 1, 2, 3, 456789)
    assert add_time_stamp_to_file_name("part-0.csv.gz", now) == (
        "20260814-010203456789.gz"
    )
    assert add_time_stamp_to_file_name("LOAD001", now) == "20260814-010203456789"


def test_promote_moves_renames_and_cleans_source(tmp_path):
    store = PrefixStore(str(tmp_path))
    _seed_landing(store, 3)
    clock = lambda: dt.datetime(2026, 8, 14, 5, 30, 0, 0)  # noqa: E731
    out = promote(store, project="dl", bd_type="derby", endpoint="ep",
                  source_schema="APP", source_table="orders_fl", clock=clock)
    assert out["result"] == "SUCCESS"
    assert out["target_path"] == "dl/derby/ep/orders_fl/2026/08/14/"
    moved = store.list_prefix(out["target_path"])
    assert len(moved) == 3
    # coarse clock: microsecond tick keeps names unique; last ext only
    names = [k.split("/")[-1] for k in moved]
    assert len(set(names)) == 3 and all(n.endswith(".gz") for n in names)
    # case-insensitive table match consumed the source
    assert store.list_prefix("temp/") == []


def test_promote_unresolved_source_is_idempotent_success(tmp_path):
    # no landing prefix matches the table → the reference takes the
    # "table data is already load" branch and returns SUCCESS/Complete
    # (MigrateData.py:144-149); a re-run after promotion must not fail
    store = PrefixStore(str(tmp_path))
    out = promote(store, project="dl", bd_type="derby", endpoint="ep",
                  source_schema="APP", source_table="ORDERS_FL")
    assert out["result"] == "SUCCESS" and out["status"] == "Complete"


def test_promote_rerun_after_success_is_success(tmp_path):
    store = PrefixStore(str(tmp_path))
    _seed_landing(store, 2)
    clock = lambda: dt.datetime(2026, 8, 14, 5, 30, 0, 0)  # noqa: E731
    kw = dict(project="dl", bd_type="derby", endpoint="ep",
              source_schema="APP", source_table="orders_fl", clock=clock)
    first = promote(store, **kw)
    assert first["result"] == "SUCCESS"
    moved = store.list_prefix(first["target_path"])
    assert len(moved) == 2
    # second run: source consumed → idempotent SUCCESS. (The reference
    # clears the target prefix unconditionally before resolving the
    # source, so the step-function's retry semantics rely on the DMS
    # task re-landing files — we reproduce that contract exactly.)
    second = promote(store, **kw)
    assert second["result"] == "SUCCESS" and second["status"] == "Complete"


def test_promote_matched_but_empty_prefix_fails(tmp_path):
    # a key whose 4th segment matches the table as a FILE (no deeper
    # objects) resolves source_path, but the prefix itself lists
    # nothing → the reference's keys==[] FAILED branch
    # (MigrateData.py:119-123)
    store = PrefixStore(str(tmp_path))
    f = store.root / "temp/derby/APP/ORDERS_FL"
    f.parent.mkdir(parents=True)
    f.write_bytes(b"x")
    out = promote(store, project="dl", bd_type="derby", endpoint="ep",
                  source_schema="APP", source_table="orders_fl")
    assert out == {"result": "FAILED", "reason": "nothing to move on"}


def test_promote_clears_stale_target_and_maps_mssql(tmp_path):
    store = PrefixStore(str(tmp_path))
    # stale object under today's target prefix must be deleted even
    # when the promotion itself lands nothing new (reference clears the
    # target before resolving the source)
    clock = lambda: dt.datetime(2026, 8, 14, 5, 30)  # noqa: E731
    stale = "dl/sqlserver/ep/T1/2026/08/14/old.gz"
    (store.root / stale).parent.mkdir(parents=True)
    (store.root / stale).write_bytes(b"x")
    out = promote(store, project="dl", bd_type="mssql", endpoint="ep",
                  source_schema="S", source_table="T1", clock=clock)
    assert out["result"] == "SUCCESS"  # unresolved source → idempotent
    assert store.list_prefix("dl/") == []


def test_prefix_store_hides_markers_and_blocks_escape(tmp_path):
    store = PrefixStore(str(tmp_path))
    d = store.root / "temp/derby/S/T"
    d.mkdir(parents=True)
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".part-0.crc").write_bytes(b"")
    (d / "part-0.csv.gz").write_bytes(b"x")
    assert store.list_prefix("temp/") == ["temp/derby/S/T/part-0.csv.gz"]
    with pytest.raises(ValueError):
        store.copy("../escape", "x")


def test_table_mappings_mixed_explicit_and_auto_rule_ids():
    """An omitted rule-id must auto-assign a FREE id — the old
    positional default (len(rules)) collided with explicit ids and
    spuriously rejected valid documents."""
    from cdk_datalake_ingest_spark.operators.replication import (
        parse_table_mappings,
    )

    doc = {
        "rules": [
            {
                "rule-type": "selection",
                "rule-id": 1,
                "rule-action": "include",
                "object-locator": {"schema-name": "s", "table-name": "a"},
            },
            {
                # no rule-id: would default to len(rules)=1 and clash
                "rule-type": "selection",
                "rule-action": "include",
                "object-locator": {"schema-name": "s", "table-name": "b"},
            },
        ]
    }
    rules = parse_table_mappings(doc)
    assert len(rules) == 2
    assert len({r.rule_id for r in rules}) == 2
    # explicit duplicates still rejected
    doc["rules"][1]["rule-id"] = 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate rule-id"):
        parse_table_mappings(doc)


# ---------------------------------------------------------------------------
# AppFlow flow-status polling (DescriptSalesforceLanding.py:22-57)
# ---------------------------------------------------------------------------


def test_appflow_flow_name_variants():
    from cdk_datalake_ingest_spark.operators.landing import appflow_flow_name

    # UPSERT_LOAD -> hourly variant, everything else -> daily
    assert appflow_flow_name("Order", "UPSERT_LOAD") == "ajedtlk-orderhr"
    assert appflow_flow_name("Order", "FULL_LOAD") == "ajedtlk-orderda"
    assert appflow_flow_name("Account", "incremental") == "ajedtlk-accountda"
    assert (
        appflow_flow_name("Case", "UPSERT_LOAD", prefix="mylake")
        == "mylake-casehr"
    )


def test_check_flow_status_discrimination():
    from cdk_datalake_ingest_spark.operators.landing import check_flow_status

    assert check_flow_status(lambda f: "InProgress", "x") == "CREATING"
    assert check_flow_status(lambda f: "Successful", "x") == "SUCCESS"
    # every non-InProgress/Successful execution status is FAILED
    for status in ("Error", "CancelStarted", "Canceled", ""):
        assert check_flow_status(lambda f, s=status: s, "x") == "FAILED"

    def boom(flow):
        raise ConnectionError("appflow api down")

    # documented deviation: a raising describe is a FAILED poll, not
    # the reference's None (which NoChoiceMatched-kills the SFN).
    assert check_flow_status(boom, "x") == "FAILED"


def test_poll_flow_waits_through_creating_then_terminal():
    from cdk_datalake_ingest_spark.operators.landing import poll_flow

    seen = []

    def scripted(flow):
        seen.append(flow)
        return ["InProgress", "InProgress", "Successful"][len(seen) - 1]

    assert poll_flow(scripted, "ajedtlk-orderhr") == "SUCCESS"
    assert len(seen) == 3  # polled exactly until the terminal answer

    fails = iter(["InProgress", "Error"])
    assert poll_flow(lambda f: next(fails), "x") == "FAILED"


def test_poll_flow_budget_exhaustion_is_failed():
    from cdk_datalake_ingest_spark.operators.landing import poll_flow

    naps = []
    out = poll_flow(
        lambda f: "InProgress",
        "x",
        max_polls=4,
        sleeper=naps.append,
        poll_interval=0.5,
    )
    assert out == "FAILED"  # stuck flow == SFN execution timeout
    # N polls sleep only BETWEEN polls: the exhausted path must not
    # pay one final wasted interval after the last check
    assert naps == [0.5] * 3


def test_require_flow_ready_raises_on_creating_returns_on_terminal():
    """r13 planner-envelope poll: CREATING raises FlowNotReadyError
    (the planner requeues), SUCCESS and FAILED both return (the
    reference's Choice state routes both onward)."""
    import pytest

    from cdk_datalake_ingest_spark.operators.landing import (
        require_flow_ready,
    )
    from cdk_datalake_ingest_spark.plans.planner import FlowNotReadyError

    with pytest.raises(FlowNotReadyError, match="CREATING"):
        require_flow_ready(lambda f: "InProgress", "ajedtlk-accounthr")
    assert (
        require_flow_ready(lambda f: "Successful", "ajedtlk-accounthr")
        == "SUCCESS"
    )
    assert (
        require_flow_ready(lambda f: "Error", "ajedtlk-accounthr")
        == "FAILED"
    )
