"""Schedule triggers (I5) and catalog grants (C3) — control plane."""

from __future__ import annotations

import datetime as dt

import pytest

from cdk_datalake_ingest_spark.operators.grants import (
    ALL,
    ASSOCIATE,
    GrantRegistry,
    Resource,
    bootstrap_stage_grants,
)
from cdk_datalake_ingest_spark.plans.schedule import (
    CronSchedule,
    RateSchedule,
    TriggerRule,
    due_runs,
    expand_payload,
    reference_rules,
)

T0 = dt.datetime(2026, 8, 10, 0, 0)  # a Monday


# ---------------------------------------------------------------------------
# I5 — schedules
# ---------------------------------------------------------------------------


def test_cron_0530_daily_next_fire():
    """The reference's general-load rule: cron(minute=30, hour=5)."""
    c = CronSchedule(minute="30", hour="5")
    assert c.next_fire(T0) == dt.datetime(2026, 8, 10, 5, 30)
    # strictly-after semantics: at the fire minute, next is tomorrow
    assert c.next_fire(dt.datetime(2026, 8, 10, 5, 30)) == dt.datetime(
        2026, 8, 11, 5, 30
    )
    assert c.next_fire(dt.datetime(2026, 8, 10, 5, 29, 59)) == dt.datetime(
        2026, 8, 10, 5, 30
    )


def test_cron_field_constraints():
    # EventBridge day-of-week numbering: 1-7 = SUN-SAT, so Monday is 2
    c = CronSchedule(minute="0", hour="12", day_of_week="2")  # Mondays noon
    nxt = c.next_fire(T0)
    assert nxt == dt.datetime(2026, 8, 10, 12, 0)  # 2026-08-10 is a Monday
    assert c.next_fire(nxt) == dt.datetime(2026, 8, 17, 12, 0)
    # Sunday=1 and Saturday=7 pin the numbering at both ends
    sun = CronSchedule(minute="0", hour="0", day_of_week="1")
    assert sun.next_fire(T0) == dt.datetime(2026, 8, 16, 0, 0)  # next Sunday
    sat = CronSchedule(minute="0", hour="0", day_of_week="7")
    assert sat.next_fire(T0) == dt.datetime(2026, 8, 15, 0, 0)  # next Saturday
    lists = CronSchedule(minute="0", hour="6,18")
    assert lists.next_fire(T0).hour == 6
    assert lists.next_fire(dt.datetime(2026, 8, 10, 7, 0)).hour == 18


def test_rate_schedules_anchor_and_interval():
    r5 = RateSchedule.hours(5, anchor=T0)
    assert r5.next_fire(T0 - dt.timedelta(hours=1)) == T0
    assert r5.next_fire(T0) == T0 + dt.timedelta(hours=5)
    assert r5.next_fire(T0 + dt.timedelta(hours=11)) == T0 + dt.timedelta(hours=15)
    r1d = RateSchedule.days(1, anchor=T0)
    assert r1d.next_fire(T0 + dt.timedelta(minutes=1)) == T0 + dt.timedelta(days=1)


def test_due_runs_orders_firings_with_payload():
    rules = reference_rules(anchor=T0)
    firings = due_runs(rules, since=T0, now=T0 + dt.timedelta(days=1))
    names = [n for _, n, _ in firings]
    # 5h rate fires at +5h,+10h,+15h,+20h; cron at 05:30; daily at +1d
    assert names.count("salesforce-5h") == 4
    assert names.count("salesforce-daily") == 1
    assert names.count("start load rule") == 1
    assert firings == sorted(firings, key=lambda x: (x[0], x[1]))
    cron_fire = next(f for f in firings if f[1] == "start load rule")
    assert cron_fire[0] == dt.datetime(2026, 8, 10, 5, 30)
    assert cron_fire[2] == {"PROCESS_ID_TO_LOAD": "01", "COUNTRIES_TO_LOAD": "ALL"}


def test_payload_expansion_crosses_processes_and_countries():
    """StartWorkFlow semantics: comma-lists crossed, ALL = unrestricted."""
    assert expand_payload(
        {"PROCESS_ID_TO_LOAD": "01,02", "COUNTRIES_TO_LOAD": "PE,CO"}
    ) == [("01", "PE"), ("01", "CO"), ("02", "PE"), ("02", "CO")]
    assert expand_payload(
        {"PROCESS_ID_TO_LOAD": "01", "COUNTRIES_TO_LOAD": "ALL"}
    ) == [("01", None)]
    assert expand_payload({"PROCESS_ID_TO_LOAD": "01"}) == [("01", None)]
    assert expand_payload({}) == []


def test_scheduler_drives_the_planner():
    """I5 wired into R1: a cron firing's payload expands into planner
    selections — the full trigger → selection chain the reference runs
    through EventBridge + StartWorkFlow."""
    from cdk_datalake_ingest_spark.plans.planner import RunPlanner
    from cdk_datalake_ingest_spark.specs import (
        ConfigCatalog,
        EndpointSpec,
        TableSpec,
    )

    catalog = ConfigCatalog(
        tables=[
            TableSpec("T1", endpoint="PEBD", process_id="01"),
            TableSpec("T2", endpoint="COBD", process_id="01"),
            TableSpec("T3", endpoint="PEBD", process_id="02"),
        ],
        endpoints=[
            EndpointSpec("PEBD", bd_type="mssql"),
            EndpointSpec("COBD", bd_type="oracle"),
        ],
    )
    rules = [
        TriggerRule(
            "start load rule",
            CronSchedule(minute="30", hour="5"),
            {"PROCESS_ID_TO_LOAD": "01", "COUNTRIES_TO_LOAD": "PE"},
        )
    ]
    firings = due_runs(rules, since=T0, now=T0 + dt.timedelta(days=1))
    assert len(firings) == 1
    planner = RunPlanner(catalog, base_sleep=0.0)
    planned = {}
    for _, _, payload in firings:
        for process_id, prefix in expand_payload(payload):
            planned.update(planner.plan(process_id, prefix))
    assert set(planned) == {("mssql", "PEBD")}
    assert [t.target_table_name for t in planned[("mssql", "PEBD")]] == ["T1"]


def test_trigger_rule_window_is_half_open():
    r = TriggerRule("t", CronSchedule(minute="0", hour="0"))
    fires = list(r.fires_between(T0, T0 + dt.timedelta(days=2)))
    # (since, now]: T0 midnight itself excluded, next two midnights in
    assert fires == [T0 + dt.timedelta(days=1), T0 + dt.timedelta(days=2)]


# ---------------------------------------------------------------------------
# C3 — grants
# ---------------------------------------------------------------------------


def test_direct_database_grant_and_inheritance():
    g = GrantRegistry()
    db = Resource("database", "stage_db")
    g.grant_permissions("role/etl", db, [ALL], [ALL])
    g.check("role/etl", "SELECT", db)  # ALL implies everything
    # tables inherit database grants
    g.check("role/etl", "SELECT", Resource("table", "stage_db.t1"))
    with pytest.raises(PermissionError):
        g.check("role/other", "SELECT", db)
    assert g.can_grant("role/etl", ALL, db)
    assert not g.can_grant("role/other", ALL, db)


def test_tag_based_access_path():
    """The LF-tag path: grant on Level=Stage, tag the database, access
    flows through the tag — and ASSOCIATE alone is not data access."""
    g = GrantRegistry()
    db = Resource("database", "stage_db")
    g.grant_tag_permissions("role/reader", "Level", ["Stage"], ["SELECT"])
    with pytest.raises(PermissionError):
        g.check("role/reader", "SELECT", db)  # tag not attached yet
    g.add_tags_to_resource(db, {"Level": "Stage"})
    g.check("role/reader", "SELECT", db)
    g.check("role/reader", "SELECT", Resource("table", "stage_db.t9"))
    # ASSOCIATE-only principal cannot read
    g.grant_tag_permissions("role/tagger", "Level", ["Stage"], [ASSOCIATE])
    with pytest.raises(PermissionError):
        g.check("role/tagger", "SELECT", db)


def test_associate_is_not_data_access_on_either_path():
    """ASSOCIATE only authorizes tag attachment: a DIRECT ASSOCIATE
    grant must fail check() exactly like a tag-path one (the exclusion
    is uniform), while tagging still works through _tag_grants."""
    g = GrantRegistry()
    db = Resource("database", "d")
    g.grant_permissions("role/direct", db, [ASSOCIATE])
    with pytest.raises(PermissionError):
        g.check("role/direct", ASSOCIATE, db)
    with pytest.raises(PermissionError):
        g.check("role/direct", "SELECT", db)


def test_tag_path_grant_option_reaches_can_grant():
    """A grant option given via grant_tag_permissions must be visible
    to can_grant once the resource carries the tag (previously it was
    merged into effective permissions but never recorded)."""
    g = GrantRegistry()
    db = Resource("database", "d")
    g.grant_tag_permissions(
        "role/lead", "Level", ["Stage"], ["SELECT"],
        permissions_with_grant_option=["SELECT"],
    )
    assert not g.can_grant("role/lead", "SELECT", db)  # tag not attached
    g.add_tags_to_resource(db, {"Level": "Stage"})
    assert g.can_grant("role/lead", "SELECT", db)
    # inherited by tables of the tagged database
    assert g.can_grant("role/lead", "SELECT", Resource("table", "d.t1"))
    # but not a permission that lacked the option
    assert not g.can_grant("role/lead", "INSERT", db)


def test_tagging_requires_associate():
    g = GrantRegistry()
    db = Resource("database", "d")
    with pytest.raises(PermissionError):
        g.add_tags_to_resource(db, {"Level": "Stage"}, principal="role/x")
    g.grant_tag_permissions("role/x", "Level", ["Stage"], [ASSOCIATE])
    g.add_tags_to_resource(db, {"Level": "Stage"}, principal="role/x")


def test_governed_table_registration(spark, tmp_path):
    """C3 wired into C2: registration through ManagedTable.register is
    enforced when a registry+principal are supplied — the LF role the
    reference's crawler bootstrap plays."""
    from pyspark.sql import Row

    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    g = GrantRegistry()
    bootstrap_stage_grants(g, "role/etl", "stage_db")
    t = ManagedTable(spark, tmp_path / "gov_tbl")
    t.write(spark.createDataFrame([Row(id=1)]))
    with pytest.raises(PermissionError):
        t.register("stage_db.gov_tbl", grants=g, principal="role/nobody")
    t.register("stage_db.gov_tbl", grants=g, principal="role/etl")
    assert spark.sql("SELECT count(*) AS n FROM stage_db__gov_tbl").first().n == 1
    spark.catalog.dropTempView("stage_db__gov_tbl")


def test_bootstrap_stage_grants_sequence():
    """crawlers_job.py:109-170 in order: ALL on db (+grant option),
    ASSOCIATE on Level=Stage, tag the db."""
    g = GrantRegistry()
    bootstrap_stage_grants(g, "role/glue-job", "stage_db")
    db = Resource("database", "stage_db")
    g.check("role/glue-job", "CREATE_TABLE", db)
    assert g.can_grant("role/glue-job", ALL, db)
    # a second principal granted via the same tag now sees the db
    g.grant_tag_permissions("role/analyst", "Level", ["Stage"], ["SELECT"])
    g.check("role/analyst", "SELECT", db)
