"""Landing-zone promotion: temp → raw with timestamped rename (S15).

The reference's MigrateData lambda (MigrateData.py:20-24,66-143)
promotes each table's DMS output from the landing bucket's
``temp/{bd_type}/{schema}/`` prefix into the raw bucket's dated layout
``{project}/{bd_type}/{endpoint}/{table}/{YYYY}/{MM}/{DD}/``:

  1. resolve the source prefix by case-insensitive match of the
     configured SOURCE_TABLE against the 4th key segment
     (MigrateData.py:85-88 — ``key.split('/')[3].upper()``),
  2. delete whatever already sits under the target prefix,
  3. copy every source object, renaming the file to
     ``%Y%m%d-%H%M%S%f`` + original extension (MigrateData.py:20-24 —
     note ``os.path.splitext`` keeps only the LAST extension, so
     ``part-0.csv.gz`` becomes ``<ts>.gz``; reproduced bug-compatibly),
  4. delete the source objects,
  5. when the source prefix does not resolve at all ("the table data is
     already load", MigrateData.py:144-149) the lambda falls through to
     its SUCCESS/Complete return — re-running a finished promotion is
     idempotent; ``{'result': 'FAILED', 'reason': 'nothing to move
     on'}`` is reserved for a prefix that matched but lists no objects
     (MigrateData.py:119-123).

S3 has prefixes, not directories, so the local stand-in is a minimal
prefix-listing object store over a filesystem root: keys are
``/``-separated relative paths, listing is prefix-match, and copy
materializes parent directories on demand. The promotion itself is
pure control plane — O(#files) metadata operations, no data pass — so
at 100 TB it stays a driver-side loop exactly like the lambda.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
from pathlib import Path
from typing import Callable


class PrefixStore:
    """Prefix-addressed object store over a local filesystem root
    (stand-in for the S3 buckets the reference promotes between)."""

    def __init__(self, root: str) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, key: str) -> Path:
        # containment check, not a bare startswith: with root
        # /tmp/store, key '../storeX/f' resolves to /tmp/storeX/f which
        # startswith('/tmp/store') — a sibling dir whose name extends
        # the root's would escape a prefix check
        p = (self.root / key).resolve()
        if not p.is_relative_to(self.root.resolve()):
            raise ValueError(f"key escapes store root: {key!r}")
        return p

    def list_prefix(self, prefix: str) -> list[str]:
        """All object keys under ``prefix``, sorted (S3 list order)."""
        out = []
        for dirpath, _dirs, files in os.walk(self.root):
            for f in files:
                # an S3 listing holds only data objects; local Spark
                # writes add checksum/_SUCCESS markers — exclude them
                # so the store behaves like the bucket it stands in for
                if f.startswith((".", "_")):
                    continue
                key = str(Path(dirpath, f).relative_to(self.root)).replace(
                    os.sep, "/"
                )
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)

    def copy(self, src_key: str, dst_key: str) -> None:
        dst = self._path(dst_key)
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(self._path(src_key), dst)

    def delete(self, key: str) -> None:
        p = self._path(key)
        if p.exists():
            p.unlink()

    def url(self, prefix: str) -> str:
        """Filesystem path for a prefix — what Spark readers consume."""
        return str(self.root / prefix)


def add_time_stamp_to_file_name(
    original_filename: str, now: dt.datetime
) -> str:
    """MigrateData.py:20-24 verbatim semantics: timestamp + last
    extension only (``a.csv.gz`` → ``<ts>.gz``)."""
    file_time = now.strftime("%Y%m%d-%H%M%S%f")
    file_extension = os.path.splitext(original_filename)[1]
    return file_time + file_extension


def promote(
    store: PrefixStore,
    *,
    project: str,
    bd_type: str,
    endpoint: str,
    source_schema: str,
    source_table: str,
    clock: Callable[[], dt.datetime] | None = None,
) -> dict:
    """Promote one table's landing files to the raw dated layout.

    Returns the lambda's result contract: ``{'result': 'SUCCESS',
    'status': 'Complete', 'target_path': ...}`` (also for the
    already-promoted re-run, where no source prefix resolves) or
    ``{'result': 'FAILED', 'reason': 'nothing to move on'}`` (a
    source prefix matched but lists no objects).

    Bug-compatible caveat, stated plainly: like the reference
    (MigrateData.py:105-110 deletes the target prefix BEFORE the
    already-loaded branch), a re-run on the SAME DAY as a successful
    promotion clears that day's dated target prefix and then reports
    SUCCESS — the step-function contract survives a retry, the data
    does not. Orchestrators must not re-invoke promote after success
    within the day (the run planner doesn't); a next-day re-run is
    harmless (fresh dated prefix).
    """
    clock = clock or dt.datetime.now
    bd = bd_type.strip().lower()
    bd = "sqlserver" if bd == "mssql" else bd  # MigrateData.py:74-77

    # 1. resolve source prefix: temp/{bd}/{schema}/ + case-insensitive
    # table-segment match (segment index 3 of the key)
    base = f"temp/{bd}/{source_schema}/"
    source_path = ""
    for key in store.list_prefix(base):
        parts = key.split("/")
        if len(parts) > 3 and parts[3].upper() == source_table.upper():
            source_path = base + parts[3] + "/"
            break

    today = clock().date()
    target_path = (
        f"{project}/{bd}/{endpoint}/{source_table.split()[0]}/"
        f"{today.year}/{today.month:02d}/{today.day:02d}/"
    )

    # 2. delete-then-copy: clear the target prefix first
    for key in store.list_prefix(target_path):
        store.delete(key)

    if not source_path:
        # "the table data is already load" branch: an UNRESOLVED source
        # prefix means the files were promoted on a previous run, and
        # the reference step-function treats a re-run as idempotent
        # success (MigrateData.py:144-149 falls through to the SUCCESS/
        # Complete return). FAILED is reserved for the matched-but-empty
        # listing below (MigrateData.py:119-123).
        return {
            "result": "SUCCESS",
            "status": "Complete",
            "target_path": target_path,
        }

    keys = store.list_prefix(source_path)
    if not keys:
        return {"result": "FAILED", "reason": "nothing to move on"}

    # 3. copy with timestamped rename; the reference stamps now() per
    # file so names never collide — with an injected coarse clock we
    # tick microseconds to preserve that uniqueness invariant
    used: set[str] = set()
    now = clock()
    for key in keys:
        original = key.split("/")[-1]
        new_name = add_time_stamp_to_file_name(original, now)
        while new_name in used:
            now = now + dt.timedelta(microseconds=1)
            new_name = add_time_stamp_to_file_name(original, now)
        used.add(new_name)
        store.copy(key, target_path + new_name)

    # 4. delete the source objects
    for key in keys:
        store.delete(key)

    return {"result": "SUCCESS", "status": "Complete", "target_path": target_path}


# ---------------------------------------------------------------------------
# AppFlow flow-status polling (the Salesforce landing wait loop)
# ---------------------------------------------------------------------------

# DescriptSalesforceLanding.py:29-34 — the three answers the Step
# Functions Choice state discriminates on.
FLOW_CREATING = "CREATING"
FLOW_SUCCESS = "SUCCESS"
FLOW_FAILED = "FAILED"


def appflow_flow_name(
    object_name: str, load_type: str, prefix: str = "ajedtlk"
) -> str:
    """Resolve the AppFlow flow name the reference polls
    (DescriptSalesforceLanding.py:16-21 `get_appflow_name`):
    UPSERT_LOAD tables run the hourly ('hr') flow variant, everything
    else the daily ('da') one, appended to the lower-cased Salesforce
    object name under the deployment prefix."""
    suffix = "hr" if load_type == "UPSERT_LOAD" else "da"
    return f"{prefix}-{object_name.lower()}{suffix}"


def check_flow_status(
    describe: Callable[[str], str], flow_name: str
) -> str:
    """One poll of the Salesforce-landing state machine, the AppFlow
    twin of replication.check_task_status: discriminate the LATEST
    flow-execution status into the reference's three-answer contract
    (DescriptSalesforceLanding.py:23-35 `evaluateFlow`):

      InProgress → CREATING  (the SFN Wait state loops back)
      Successful → SUCCESS   (landing files are ready to promote)
      anything else → FAILED (Error, CancelStarted, no execution, ...)

    ``describe`` is the seam for `appflow.describe_flow_execution_records
    (flowName, maxResults=1)[0]['executionStatus']` — injected so tests
    and local runs script the lifecycle. A describe that RAISES maps to
    FAILED. Deliberate deviation, stated plainly: the reference's
    evaluateFlow swallows the exception and returns None, which reaches
    the SFN Choice state as a result matching none of its three rules
    and kills the execution with States.NoChoiceMatched — an outage
    (AppFlow API down) should read as a failed poll, not a dead state
    machine."""
    try:
        status = describe(flow_name)
    except Exception:  # noqa: BLE001 - poll seam, see docstring
        return FLOW_FAILED
    if status == "InProgress":
        return FLOW_CREATING
    if status == "Successful":
        return FLOW_SUCCESS
    return FLOW_FAILED


def require_flow_ready(
    describe: Callable[[str], str], flow_name: str
) -> str:
    """Planner-envelope variant of the wait loop (r13): one poll; a
    CREATING answer raises FlowNotReadyError so RunPlanner requeues the
    table on its wait heap — the slot-releasing composition of
    check_flow_status with the R4 Map+Wait semantics
    (salesforce_ingestion_stack.py:475-481). SUCCESS and FAILED both
    RETURN (the reference's Choice state routes both to the job;
    the caller decides what a FAILED landing means for its table).
    Use poll_flow instead when blocking in place is acceptable
    (single-table scripts, tests)."""
    from cdk_datalake_ingest_spark.plans.planner import FlowNotReadyError

    status = check_flow_status(describe, flow_name)
    if status == FLOW_CREATING:
        raise FlowNotReadyError(
            f"AppFlow flow {flow_name!r} is still CREATING"
        )
    return status


def poll_flow(
    describe: Callable[[str], str],
    flow_name: str,
    max_polls: int = 16,
    sleeper: Callable[[float], None] | None = None,
    poll_interval: float = 0.0,
) -> str:
    """Drive the wait-loop the reference builds in Step Functions
    around DescriptSalesforceLanding: re-evaluate while the answer is
    CREATING, return the first terminal SUCCESS/FAILED. ``max_polls``
    bounds the loop (the reference relies on the SFN execution
    timeout); exhausting it returns FAILED — a flow still InProgress
    after the budget is treated as stuck, matching the timeout's
    effect. Control-plane only: no Spark work happens until the poll
    returns SUCCESS, exactly like the reference where the Glue
    transform job is downstream of the Choice state."""
    for i in range(max_polls):
        result = check_flow_status(describe, flow_name)
        if result != FLOW_CREATING:
            return result
        # sleep only when another poll remains — the budget-exhausted
        # path must not pay one final wasted interval (review catch).
        if sleeper and poll_interval and i + 1 < max_polls:
            sleeper(poll_interval)
    return FLOW_FAILED
