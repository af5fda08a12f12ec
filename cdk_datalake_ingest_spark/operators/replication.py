"""Full-load replication lifecycle (S13 + R3).

The reference provisions AWS DMS per run: create a replication instance
(CreateReplicationInstance.py:14-52), create one ``full-load`` task per
table batch from DynamoDB config rows rendered into DMS TableMappings
JSON — selection rules with an ``object-locator`` and optional
``between`` source filters (CreateReplicationTaskForTable.py:91-123) —
then a Step Functions loop starts each task
(StartReplicationTask.py:12-21) and polls status until the full load
finishes (CheckDMSReplicationTaskStatus.py:12-46), collecting failed
tasks, and finally deletes task + instance. The task settings JSON pins
``TargetTablePrepMode='DROP_AND_CREATE'``, ``MaxFullLoadSubTasks`` and
``CommitRate=10000`` (CreateReplicationTaskForTable.py:124).

Spark-first equivalent: the *control plane* is a small in-process state
machine with the same status vocabulary and the same supervisor
semantics (status mapping, failed-task accumulation), and the *data
plane* is a partitioned JDBC read (sources/jdbc.py) writing gzip CSV
into the same ``temp/{bd_type}/{schema}/{TABLE}/`` landing layout the
reference's DMS S3 target used — so ``operators/landing.py`` (S15) can
promote it to the raw zone and the existing raw CSV source (S1) reads
it, reproducing the reference's raw-zone chain end-to-end.

Settings mapping, documented per knob:
  - ``MaxFullLoadSubTasks`` — DMS parallelism per task → JDBC
    ``numPartitions`` (strided, non-overlapping; each stride is one
    connection, exactly DMS's per-segment unload).
  - ``CommitRate`` — rows per batch → JDBC ``fetchsize``.
  - ``TargetTablePrepMode`` — DROP_AND_CREATE → overwrite the landing
    prefix; DO_NOTHING → append.

At 100 TB the control plane is O(#tables) driver-side metadata; every
byte of data moves through the partitioned JDBC scan → distributed CSV
write, with no driver materialization (the only driver lookup is the
2-scalar min/max stride probe per partitioned table).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import SparkSession

from cdk_datalake_ingest_spark.sources.csv import write_raw_csv
from cdk_datalake_ingest_spark.sources.jdbc import (
    read_jdbc,
    validate_identifier,
)
from cdk_datalake_ingest_spark.specs import EndpointSpec

# ---------------------------------------------------------------------------
# Table mappings (CreateReplicationTaskForTable.py:91-123)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SelectionRule:
    """One ``rule-type: selection`` entry of a DMS TableMappings doc."""

    rule_id: int
    rule_name: str
    schema_name: str
    table_name: str
    filter_column: str | None = None
    filter_start: str | int | None = None
    filter_end: str | int | None = None
    # engine extension mirroring DMS table-settings parallel-load:
    # stride the read on this numeric column with MaxFullLoadSubTasks
    # partitions (bounds come from a min/max probe).
    partition_column: str | None = None


def parse_table_mappings(mappings: str | dict) -> list[SelectionRule]:
    """Parse the reference's TableMappings JSON: ``selection`` rules
    with ``object-locator`` and optional single-column ``between``
    source filters (the only filter shape the reference emits,
    CreateReplicationTaskForTable.py:100-117). ``table-settings``
    rules may carry a ``parallel-load`` partition column."""
    doc = json.loads(mappings) if isinstance(mappings, str) else mappings
    if not isinstance(doc, dict) or not isinstance(doc.get("rules", []), list):
        raise ValueError("TableMappings must be an object with a 'rules' list")

    def locator(rule: dict) -> tuple[str, str]:
        """object-locator with both names present — a hostile/truncated
        doc raises a config error, never a raw KeyError."""
        loc = rule.get("object-locator")
        if (
            not isinstance(loc, dict)
            or "schema-name" not in loc
            or "table-name" not in loc
        ):
            raise ValueError(
                f"rule {rule.get('rule-id', rule.get('rule-name', '?'))!r} "
                f"missing object-locator with schema-name/table-name"
            )
        return (
            validate_identifier(loc["schema-name"], "schema-name"),
            validate_identifier(loc["table-name"], "table-name"),
        )

    partition_cols: dict[tuple[str, str], str] = {}
    for rule in doc.get("rules", []):
        if not isinstance(rule, dict) or rule.get("rule-type") != "table-settings":
            continue
        pl = rule.get("parallel-load") or {}
        if not isinstance(pl, dict):
            raise ValueError("parallel-load must be an object")
        cols = pl.get("columns") or []
        if cols and not isinstance(cols, list):
            raise ValueError("parallel-load columns must be a list")
        if cols:
            partition_cols[locator(rule)] = validate_identifier(
                cols[0], "parallel-load column"
            )
    selection_rules = [
        rule
        for rule in doc.get("rules", [])
        if isinstance(rule, dict) and rule.get("rule-type") == "selection"
    ]
    # Two-pass id assignment: claim every EXPLICIT rule-id first so an
    # auto-assigned rule earlier in the document can never steal an id an
    # explicit rule later declares (which would spuriously reject the doc
    # as a duplicate).
    seen_ids: set[int] = set()
    for rule in selection_rules:
        if "rule-id" not in rule:
            continue
        try:
            rid = int(rule["rule-id"])
        except (TypeError, ValueError) as e:
            raise ValueError(f"rule-id must be an integer: {e}") from e
        if rid in seen_ids:
            # DMS requires unique rule-ids; a duplicate EXPLICIT id
            # is a copy-paste error that would shadow a table
            # selection
            raise ValueError(f"duplicate rule-id: {rid}")
        seen_ids.add(rid)
    rules: list[SelectionRule] = []
    for rule in selection_rules:
        if rule.get("rule-action", "include") != "include":
            # the reference only ever emits include rules; excludes are
            # a config error here rather than silently dropped tables
            raise ValueError(f"unsupported rule-action: {rule.get('rule-action')}")
        schema, table = locator(rule)
        fcol: str | None = None
        fstart: str | int | None = None
        fend: str | int | None = None
        filters = rule.get("filters") or []
        if not isinstance(filters, list) or not all(
            isinstance(f, dict) for f in filters
        ):
            raise ValueError(
                f"filters on {schema}.{table} must be a list of objects"
            )
        for flt in filters:
            if flt.get("filter-type") != "source":
                continue
            conds = flt.get("filter-conditions") or []
            if not isinstance(conds, list) or not all(
                isinstance(c, dict) for c in conds
            ):
                raise ValueError(
                    f"filter-conditions on {schema}.{table} must be a "
                    f"list of objects"
                )
            if len(conds) != 1:
                # the reference emits exactly one between condition per
                # filter; fewer means a truncated doc, more would be
                # silently dropped — both are config errors
                raise ValueError(
                    f"source filter on {schema}.{table} must carry exactly "
                    f"one filter-condition, got {len(conds)}"
                )
            cond = conds[0]
            if cond.get("filter-operator") != "between":
                raise ValueError(
                    f"unsupported filter-operator: {cond.get('filter-operator')}"
                )
            if "column-name" not in flt or not all(
                k in cond for k in ("start-value", "end-value")
            ):
                raise ValueError(
                    f"between filter on {schema}.{table} missing "
                    f"column-name/start-value/end-value"
                )
            fcol = validate_identifier(flt["column-name"], "filter column-name")
            fstart, fend = cond["start-value"], cond["end-value"]
        if "rule-id" in rule:
            rid = int(rule["rule-id"])  # validated in the pre-pass
        else:
            # auto-assign the next free id AFTER all explicit ids are
            # claimed — a positional default (len(rules)) can collide
            # with an explicit id elsewhere in the doc and spuriously
            # reject a valid mapping
            rid = 0
            while rid in seen_ids:
                rid += 1
            seen_ids.add(rid)
        rules.append(
            SelectionRule(
                rule_id=rid,
                rule_name=rule.get("rule-name", f"rule-{len(rules)}"),
                schema_name=schema,
                table_name=table,
                filter_column=fcol,
                filter_start=fstart,
                filter_end=fend,
                partition_column=partition_cols.get((schema, table)),
            )
        )
    if not rules:
        raise ValueError("TableMappings contains no selection rules")
    return rules


@dataclass(frozen=True)
class FullLoadSettings:
    """The FullLoadSettings knobs the reference pins
    (CreateReplicationTaskForTable.py:124)."""

    target_table_prep_mode: str = "DROP_AND_CREATE"
    max_full_load_sub_tasks: int = 8
    commit_rate: int = 10000

    @classmethod
    def from_task_settings(cls, settings: str | dict | None) -> "FullLoadSettings":
        if settings is None:
            return cls()
        doc = json.loads(settings) if isinstance(settings, str) else settings
        fl = doc.get("FullLoadSettings", {})
        return cls(
            target_table_prep_mode=fl.get("TargetTablePrepMode", "DROP_AND_CREATE"),
            max_full_load_sub_tasks=int(fl.get("MaxFullLoadSubTasks", 8)),
            commit_rate=int(fl.get("CommitRate", 10000)),
        )


def build_selection_query(rule: SelectionRule) -> str:
    """Render one selection rule as the unload SELECT. Filter values are
    rendered as numeric literals when numeric, quoted (with embedded
    quotes doubled) otherwise — same trust model as
    sources/jdbc.py:build_incremental_query."""
    q = f"SELECT * FROM {rule.schema_name}.{rule.table_name}"
    if rule.filter_column:

        def lit(v: str | int) -> str:
            if isinstance(v, (int, float)):
                return str(v)
            return "'" + str(v).replace("'", "''") + "'"

        q += (
            f" WHERE {rule.filter_column} BETWEEN"
            f" {lit(rule.filter_start)} AND {lit(rule.filter_end)}"
        )
    return q


# ---------------------------------------------------------------------------
# Instance / task state machines
# ---------------------------------------------------------------------------

#: DMS status vocabulary the reference's poller discriminates on
#: (CheckDMSReplicationTaskStatus.py:42-55).
_IN_FLIGHT = {"starting", "modifying", "creating", "running", "stopping", "deleting"}

FULL_LOAD_FINISHED = "Stop Reason FULL_LOAD_ONLY_FINISHED"


@dataclass
class ReplicationInstance:
    identifier: str
    instance_class: str = "dms.t3.medium"
    status: str = "creating"

    def describe(self) -> dict:
        # creating → available on first describe: locally, provisioning
        # latency is zero, but the supervisor still observes the same
        # two-state sequence the reference polls through.
        out = {"ReplicationInstanceIdentifier": self.identifier, "Status": self.status}
        if self.status == "creating":
            self.status = "available"
        return out


@dataclass
class ReplicationTask:
    arn: str
    identifier: str
    rules: list[SelectionRule]
    settings: FullLoadSettings
    migration_type: str = "full-load"
    status: str = "creating"
    stop_reason: str = ""
    error: str = ""
    loaded_rows: dict[str, int] = field(default_factory=dict)


class ReplicationEngine:
    """Local stand-in for the DMS control plane + S3 target.

    ``landing_root`` is the object-store root the reference's DMS S3
    target endpoint pointed at: each table's full load lands under
    ``temp/{bd_type}/{schema}/{TABLE}/`` as gzip CSV, ready for
    landing-zone promotion (operators/landing.py).
    """

    def __init__(
        self,
        spark: SparkSession,
        endpoint: EndpointSpec,
        landing_root: str,
        clock: Callable[[], "object"] | None = None,
    ) -> None:
        import datetime as _dt

        self.spark = spark
        self.endpoint = endpoint
        self.landing_root = landing_root.rstrip("/")
        self._clock = clock or _dt.datetime.now
        self._instances: dict[str, ReplicationInstance] = {}
        self._tasks: dict[str, ReplicationTask] = {}
        self._seq = 0

    # -- instance lifecycle (CreateReplicationInstance.py:14-52) ----------

    def create_replication_instance(
        self, identifier: str, instance_class: str = "dms.t3.medium"
    ) -> ReplicationInstance:
        # the reference suffixes a '%d%m%Y%H%M%S%f' timestamp so
        # repeated runs never collide on the identifier
        stamped = identifier + "-" + self._clock().strftime("%d%m%Y%H%M%S%f")
        inst = ReplicationInstance(identifier=stamped, instance_class=instance_class)
        self._instances[stamped] = inst
        return inst

    def delete_replication_instance(self, identifier: str) -> None:
        self._instances.pop(identifier, None)

    # -- task lifecycle ----------------------------------------------------

    def create_replication_task(
        self,
        replication_task_identifier: str,
        table_mappings: str | dict,
        replication_instance: ReplicationInstance,
        migration_type: str = "full-load",
        replication_task_settings: str | dict | None = None,
    ) -> str:
        """Returns the task 'arn' (a local handle). Mirrors
        create_replication_task_for_table: identifier is prefixed
        ``ETLTask`` and only ``full-load`` is supported — the reference
        never creates CDC tasks."""
        if migration_type != "full-load":
            raise ValueError(f"unsupported MigrationType: {migration_type}")
        if replication_instance.identifier not in self._instances:
            raise ValueError("replication instance not found")
        self._seq += 1
        arn = f"task:{self._seq}:{replication_task_identifier}"
        self._tasks[arn] = ReplicationTask(
            arn=arn,
            identifier="ETLTask" + replication_task_identifier,
            rules=parse_table_mappings(table_mappings),
            settings=FullLoadSettings.from_task_settings(replication_task_settings),
        )
        return arn

    def start_replication_task(
        self, arn: str, start_type: str = "start-replication"
    ) -> str:
        """StartReplicationTask.py:12-21 — returns RUNNING/FAILED."""
        task = self._tasks.get(arn)
        if task is None or start_type != "start-replication":
            return "FAILED"
        if task.status not in ("ready", "creating", "stopped"):
            return "FAILED"
        task.status = "starting"
        return "RUNNING"

    def describe_replication_task(self, arn: str) -> dict:
        """The poll target. Each describe advances the local state
        machine one step (creating→ready, starting→running→stopped), so
        a supervisor observes the same status sequence the reference's
        Step Functions loop sees from DMS. The full load itself
        executes during the running→stopped transition."""
        task = self._tasks[arn]
        if task.status == "creating":
            task.status = "ready"
        elif task.status == "starting":
            task.status = "running"
        elif task.status == "running":
            try:
                self._execute_full_load(task)
                task.status = "stopped"
                task.stop_reason = FULL_LOAD_FINISHED
            except Exception as exc:  # noqa: BLE001 — surfaced via status
                task.status = "failed"
                task.error = str(exc)
        return {
            "ReplicationTaskIdentifier": task.identifier,
            "Status": task.status,
            "StopReason": task.stop_reason,
        }

    def delete_replication_task(self, arn: str) -> None:
        self._tasks.pop(arn, None)

    def test_connection(self, instance: ReplicationInstance | str) -> str:
        """TestReplicationInstance.py:36-53 — verify the instance can
        reach the source endpoint before creating tasks. Locally the
        probe is a real 1-row JDBC round trip through the configured
        dialect (Derby: SYSIBM.SYSDUMMY1; Oracle: DUAL; else SELECT 1
        without FROM), so a bad URL/driver/credential fails here, not
        mid-load. Returns SUCCESS/FAILED like the reference; its
        'legacy_glue'/'ec2' bypass endpoints also map to SUCCESS."""
        ident = (
            instance if isinstance(instance, str) else instance.identifier
        )
        if ident in ("legacy_glue", "ec2"):
            return "SUCCESS"
        bd = self.endpoint.bd_type.strip().lower()
        probe = {
            "derby": "SELECT 1 AS ok FROM SYSIBM.SYSDUMMY1",
            "oracle": "SELECT 1 AS ok FROM DUAL",
        }.get(bd, "SELECT 1 AS ok")
        try:
            read_jdbc(self.spark, self.endpoint, probe, num_partitions=1).first()
            return "SUCCESS"
        except Exception:  # noqa: BLE001 — any connectivity error
            return "FAILED"

    # -- data plane --------------------------------------------------------

    def _landing_path(self, rule: SelectionRule) -> str:
        # MigrateData.py:81 lists exactly this source layout:
        # temp/{bd_type}/{schema}/{TABLE}/
        bd = self.endpoint.bd_type.strip().lower()
        bd = "sqlserver" if bd == "mssql" else bd
        return (
            f"{self.landing_root}/temp/{bd}/{rule.schema_name}/{rule.table_name}"
        )

    def _execute_full_load(self, task: ReplicationTask) -> None:
        s = task.settings
        for rule in task.rules:
            query = build_selection_query(rule)
            if rule.partition_column:
                # bounded 2-scalar stride probe (same shape as a
                # production partitioned ingest's min/max pre-query)
                probe = read_jdbc(
                    self.spark,
                    self.endpoint,
                    f"SELECT MIN({rule.partition_column}) AS mn,"
                    f" MAX({rule.partition_column}) AS mx FROM ({query}) q",
                    num_partitions=1,
                    fetchsize=s.commit_rate,
                ).first()
                # column-label case differs by dialect (Derby uppercases
                # unquoted identifiers, mysql preserves) — normalize
                d = {k.lower(): v for k, v in probe.asDict().items()}
                lo, hi = d["mn"], d["mx"]
                if lo is None or hi is None:
                    # selection matched zero rows → MIN/MAX are NULL.
                    # DMS completes an empty full load with
                    # FULL_LOAD_ONLY_FINISHED; fall back to the
                    # unpartitioned single-connection read, which writes
                    # an empty (header-only) output instead of crashing
                    # the stride arithmetic and failing the task.
                    df = read_jdbc(
                        self.spark,
                        self.endpoint,
                        query,
                        num_partitions=1,
                        fetchsize=s.commit_rate,
                    )
                else:
                    df = read_jdbc(
                        self.spark,
                        self.endpoint,
                        query,
                        num_partitions=s.max_full_load_sub_tasks,
                        fetchsize=s.commit_rate,
                        partition_column=rule.partition_column,
                        lower_bound=str(lo),
                        upper_bound=str(int(hi) + 1),
                    )
            else:
                df = read_jdbc(
                    self.spark,
                    self.endpoint,
                    query,
                    num_partitions=1,
                    fetchsize=s.commit_rate,
                )
            mode = (
                "overwrite"
                if s.target_table_prep_mode == "DROP_AND_CREATE"
                else "append"
            )
            write_raw_csv(df, self._landing_path(rule), mode=mode)
            task.loaded_rows[f"{rule.schema_name}.{rule.table_name}"] = -1


# ---------------------------------------------------------------------------
# Supervisor (the Step Functions loop)
# ---------------------------------------------------------------------------


def check_task_creation(
    engine: ReplicationEngine, task_arn: str, result: str
) -> str:
    """CheckTaskCreation.py:42-66 discrimination, run between task
    creation and start: deleting/failed/failed-move → FAILED, ready →
    SUCCESS, any other status leaves the prior result unchanged (the
    step function loops until one of the terminal answers)."""
    try:
        status = engine.describe_replication_task(task_arn)["Status"]
    except KeyError:
        return "FAILED"  # "can not locate task arn"
    if status in ("deleting", "failed", "failed-move"):
        return "FAILED"
    if status == "ready":
        return "SUCCESS"
    return result


def check_task_status(
    engine: ReplicationEngine, task_arn: str, failed_task: list[str]
) -> str:
    """Status discrimination exactly as
    CheckDMSReplicationTaskStatus.py:30-46: in-flight statuses map to
    CREATING (keep polling); stopped maps to LOADED, appending to
    ``failed_task`` unless the stop reason is the full-load-finished
    sentinel; anything else (failed, unknown) is LOADED + failed."""
    desc = engine.describe_replication_task(task_arn)
    status = desc["Status"]
    if status in _IN_FLIGHT:
        return "CREATING"
    if status == "stopped":
        if desc["StopReason"] == FULL_LOAD_FINISHED:
            return "LOADED"
        failed_task.append(task_arn)
        return "LOADED"
    failed_task.append(task_arn)
    return "LOADED"


def run_full_load(
    engine: ReplicationEngine,
    task_arns: list[str],
    max_polls_per_task: int = 16,
) -> dict:
    """Drive every task through start → poll-until-LOADED, one at a
    time, mirroring the reference's actual_table-indexed Step Functions
    loop (StartReplicationTask advances the index; the status check
    loops until the task leaves the in-flight set). Returns the
    reference's result contract: SUCCESS/FAILED plus the failed-task
    list. Polling is immediate — locally there is no provisioning
    latency to wait out."""
    failed_task: list[str] = []
    for arn in task_arns:
        started = engine.start_replication_task(arn)
        if started != "RUNNING":
            failed_task.append(arn)
            continue
        for _ in range(max_polls_per_task):
            if check_task_status(engine, arn, failed_task) == "LOADED":
                break
        else:
            failed_task.append(arn)
    return {
        "result": "FAILED" if failed_task else "SUCCESS",
        "failed_task": failed_task,
        "load_status": "LOADED",
    }
