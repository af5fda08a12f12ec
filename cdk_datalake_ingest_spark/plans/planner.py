"""Run planner + bounded-concurrency executor + run log (R1/R2/R4/R5).

Replaces the reference's EventBridge -> Lambda -> Step Functions
control plane with driver-side Python: active-table selection and
grouping (StartWorkFlow.py:62-164), a thread pool bounded at the
reference's Map concurrency (MAX_TABLES_AT_A_TIME_GLUE = 5), the
exponential retry policy of its Glue steps (backoff_rate=5,
max_attempts=10, datalake_ingestion_stack.py:834), and a structured
run log with the reference's record shape (aje-stage-dms-load.py:429-439).
"""

from __future__ import annotations

import datetime as dt
import json
import threading
import time
from collections import defaultdict
from concurrent.futures import (
    FIRST_COMPLETED,
    ThreadPoolExecutor,
    wait as futures_wait,
)
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from cdk_datalake_ingest_spark.specs import ConfigCatalog, TableSpec

MAX_TABLES_AT_A_TIME = 5  # reference MAX_TABLES_AT_A_TIME_GLUE


class RunLog:
    """Structured run-log sink (the reference's DynamoDB `logs` table,
    record shape aje-stage-dms-load.py:429-439), stored as JSONL."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._lock = threading.Lock()

    def record(
        self,
        process_id: str,
        flow_name: str,
        task_name: str,
        task_status: str,
        message: str = "",
        process_type: str = "F",
        context: str = "",
        project_name: str = "cdk-datalake-ingest-spark",
    ) -> dict[str, str]:
        rec = {
            "process_id": process_id,
            "date_system": dt.datetime.now().strftime("%Y%m%d_%H%M%S"),
            "project_name": project_name,
            "flow_name": flow_name,
            "task_name": task_name,
            "task_status": task_status,
            "message": message,
            "process_type": process_type,
            "context": context,
        }
        with self._lock:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            with self.path.open("a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def records(self) -> list[dict[str, Any]]:
        if not self.path.exists():
            return []
        return [
            json.loads(line)
            for line in self.path.read_text().splitlines()
            if line.strip()
        ]

    def failed_count(self) -> int:
        """A8 success gate: zero FAILED records
        (prepareForCrawler.py:46-67 semantics)."""
        return sum(1 for r in self.records() if r["task_status"] == "FAILED")


def retry(
    fn: Callable[[], Any],
    max_attempts: int = 10,
    backoff_rate: float = 5.0,
    base_sleep: float = 1.0,
    sleeper: Callable[[float], None] = time.sleep,
    no_retry: Callable[[Exception], bool] | None = None,
) -> Any:
    """Step-Functions-style retry: sleep base * rate^(attempt-1).

    ``no_retry`` short-circuits the loop for error classes the caller
    treats as terminal-by-design — the reference's stage job catches
    NoDataToMigrateException INSIDE the Glue job (aje-stage-dms-load.py
    :544-546) so the job exits cleanly and the Step Functions retry
    policy never sees a failure; re-running an empty extract 10 times
    with exponential backoff would burn ~40 minutes per warning table
    for a condition retries cannot change."""
    for attempt in range(1, max_attempts + 1):
        try:
            return fn()
        except Exception as e:
            if attempt == max_attempts or (no_retry and no_retry(e)):
                raise
            sleeper(base_sleep * (backoff_rate ** (attempt - 1)))


class FlowNotReadyError(Exception):
    """Raised by a table runner to signal "the upstream feed for this
    table is still materializing — requeue me, don't fail me": the
    engine twin of the reference's Wait-state loop around the AppFlow
    poll (salesforce_ingestion_stack.py:475-481 — the Choice state
    routes result == 'CREATING' back through a Wait, while SUCCESS and
    FAILED both proceed to the job). The planner treats it as neither
    success nor failure: the table goes back on the wait heap and its
    pool slot is RELEASED to other tables, consuming wait-budget
    (``max_flow_waits``) instead of retry attempts or a concurrency
    slot. Exhausting the budget lands as FAILED, the same effect the
    reference's state-machine execution timeout has on a flow stuck
    InProgress."""


def is_no_data_error(e: Exception | str) -> bool:
    """The reference's warning-class discriminator: a substring match
    on the rendered error (aje-stage-dms-load.py:330 uses the same test
    to pick the RAW WARNING wording; :544-546 maps the exception class
    to STATUS_STAGE='WARNING')."""
    return "no data detected to migrate" in str(e).lower()


@dataclass
class TableRunResult:
    table: str
    status: str
    error: str = ""


@dataclass
class Notifier:
    """Pluggable success/error notification seam (R5, completing the
    partial): the reference publishes SNS on BOTH paths — per-table
    errors from inside the stage job (aje-stage-dms-load.py:328-337,
    :560/:578: warning-vs-failed message chosen by substring match on
    the error) and ENDPOINT-level success only when that endpoint has
    zero FAILED tables (SendSuccededNotification.py:26-36: a DynamoDB
    scan filtered by ENDPOINT + STATUS_STAGE='FAILED'; empty → publish
    "Successfully load {endpoint}"). The engine exposes the same two
    seams as plain callables so operational alerting (SNS, Slack,
    PagerDuty, a test list) can attach without subclassing.

    ``on_failure(table_name, message, error)`` fires once per FAILED
    (or warning-class) table, after retries are exhausted, with the
    reference's message shape already rendered. ``on_success(endpoint,
    message)`` fires once per endpoint with ZERO FAILED tables —
    endpoint-level, not per-table; WARNING (no-data) tables do NOT
    suppress it, because the reference's scan filters
    STATUS_STAGE='FAILED' only. Notifier exceptions
    are swallowed (the reference's lambda returns FAILED but never
    breaks the pipeline, SendSuccededNotification.py:43-47)."""

    on_success: Callable[[str, str], None] | None = None
    on_failure: Callable[[str, str, str], None] | None = None

    @staticmethod
    def failure_message(table_name: str, error: str) -> str:
        """aje-stage-dms-load.py:328-337 message dispatch: the no-data
        warning class gets a WARNING-worded message, everything else
        the Failed-table shape."""
        if "no data detected to migrate" in error.lower():
            return f"RAW WARNING in table: {table_name} \n{error}"
        return (
            f"Failed table: {table_name} \nStep: stage job "
            f"\nLog ERROR \n{error}"
        )

    @staticmethod
    def success_message(endpoint_name: str) -> str:
        """SendSuccededNotification.py:15: 'Successfully load {ep}'."""
        return f"Successfully load {endpoint_name}"

    def notify_failure(self, table_name: str, error: str) -> None:
        if self.on_failure is None:
            return
        try:
            self.on_failure(
                table_name, self.failure_message(table_name, error), error
            )
        except Exception:  # noqa: BLE001 - alerting must not kill the run
            pass

    def notify_success(self, endpoint_name: str) -> None:
        if self.on_success is None:
            return
        try:
            self.on_success(endpoint_name, self.success_message(endpoint_name))
        except Exception:  # noqa: BLE001
            pass


@dataclass
class RunPlanner:
    catalog: ConfigCatalog
    run_log: RunLog | None = None
    max_concurrency: int = MAX_TABLES_AT_A_TIME
    max_attempts: int = 3
    backoff_rate: float = 5.0
    base_sleep: float = 0.0
    notifier: Notifier | None = None
    #: Wait-state envelope for FlowNotReadyError (the AppFlow poll
    #: loop, R4 Map+Wait): seconds between requeues and how many
    #: requeues a table gets before its stuck feed counts as FAILED.
    #: 16 mirrors landing.poll_flow's default budget.
    flow_wait_seconds: float = 0.0
    max_flow_waits: int = 16
    results: list[TableRunResult] = field(default_factory=list)

    def plan(
        self, process_id: str | None = None, endpoint_prefix: str | None = None
    ) -> dict[tuple[str, str], list[TableSpec]]:
        """R1 grouping: active tables bucketed by (bd_type, endpoint).
        bd_type resolves through the endpoint catalog; unknown endpoints
        group under 'file'."""
        groups: dict[tuple[str, str], list[TableSpec]] = defaultdict(list)
        for t in self.catalog.active_tables(process_id, endpoint_prefix):
            ep = self.catalog.endpoints.get(t.endpoint)
            bd_type = ep.bd_type if ep else "file"
            groups[(bd_type, t.endpoint)].append(t)
        return dict(groups)

    def run(
        self,
        runner: Callable[[TableSpec], Any],
        process_id: str | None = None,
        endpoint_prefix: str | None = None,
    ) -> list[TableRunResult]:
        """R4 Map semantics: per-table execution with bounded
        concurrency and retry; failures are isolated per table and
        logged, not propagated (the reference notifies and moves on)."""
        tables = [
            t
            for group in self.plan(process_id, endpoint_prefix).values()
            for t in group
        ]
        results: list[TableRunResult] = []
        # Retry budget carried ACROSS wait requeues (ADVICE r13): each
        # WAITING cycle re-enters retry() with whatever budget the
        # table has LEFT, not a fresh max_attempts — otherwise a runner
        # interleaving transient failures with not-ready answers could
        # execute max_attempts × (max_flow_waits+1) times before
        # terminally failing. The not-ready probe itself is re-credited
        # below (wait cycles consume wait-budget, transient failures
        # consume retry-budget — never each other's).
        remaining = [self.max_attempts] * len(tables)

        def one(i: int, t: TableSpec) -> TableRunResult:
            def attempt():
                remaining[i] -= 1
                return runner(t)

            try:
                retry(
                    attempt,
                    max_attempts=remaining[i],
                    backoff_rate=self.backoff_rate,
                    base_sleep=self.base_sleep,
                    # no-data is terminal-by-design; a not-ready flow
                    # must reach the WAIT envelope below, not burn
                    # exponential-backoff attempts in the slot
                    no_retry=lambda e: is_no_data_error(e)
                    or isinstance(e, FlowNotReadyError),
                )
                if self.run_log:
                    self.run_log.record(
                        t.process_id, "ingest", t.target_table_name, "SUCCEEDED"
                    )
                return TableRunResult(t.target_table_name, "SUCCEEDED")
            except FlowNotReadyError as e:
                # NOT a failure: the scheduler loop below requeues the
                # table after flow_wait_seconds, releasing this slot
                # (the reference's Wait-state loop, iterator slot
                # notwithstanding — max_concurrency=100 there makes
                # slots a non-resource; here they are the resource).
                # Re-credit the probe's attempt: discovering the feed
                # is not ready is charged to max_flow_waits, not to the
                # retry budget.
                remaining[i] += 1
                return TableRunResult(t.target_table_name, "WAITING", str(e))
            except Exception as e:  # noqa: BLE001 - isolation by design
                # warning-vs-failed classification, exactly the
                # reference's: NoDataToMigrateException sets
                # STATUS_STAGE='WARNING' (aje-stage-dms-load.py:544-546),
                # every other exception 'FAILED' (:563-565). Both
                # classes still notify (send_error_message fires on
                # both paths, :560/:578) — only the terminal status
                # and the endpoint success gate differ.
                status = "WARNING" if is_no_data_error(e) else "FAILED"
                if self.run_log:
                    self.run_log.record(
                        t.process_id,
                        "ingest",
                        t.target_table_name,
                        status,
                        message=str(e),
                    )
                if self.notifier:
                    self.notifier.notify_failure(t.target_table_name, str(e))
                return TableRunResult(t.target_table_name, status, str(e))

        # Scheduler loop instead of a bare pool.map (r13, the AppFlow
        # poll wiring): WAITING results go on a due-time heap and are
        # re-submitted after flow_wait_seconds; everything else lands
        # in its slot-order position. A waiting table holds NO pool
        # slot, so five not-ready Salesforce flows cannot starve the
        # JDBC tables sharing the run (the failure mode of polling
        # inside the runner).
        import heapq

        slots: list[TableRunResult | None] = [None] * len(tables)
        waits_used = [0] * len(tables)
        with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
            futures = {
                pool.submit(one, i, t): i for i, t in enumerate(tables)
            }
            wait_heap: list[tuple[float, int]] = []
            while futures or wait_heap:
                if not futures:
                    # nothing in flight: sleep out the nearest requeue
                    delay = wait_heap[0][0] - time.monotonic()
                    if delay > 0:
                        time.sleep(delay)
                else:
                    timeout = None
                    if wait_heap:
                        timeout = max(
                            0.0, wait_heap[0][0] - time.monotonic()
                        )
                    done, _ = futures_wait(
                        futures, timeout=timeout,
                        return_when=FIRST_COMPLETED,
                    )
                    for fut in done:
                        i = futures.pop(fut)
                        r = fut.result()
                        if r.status != "WAITING":
                            slots[i] = r
                            continue
                        waits_used[i] += 1
                        if waits_used[i] > self.max_flow_waits:
                            # stuck feed: the reference's execution
                            # timeout — FAILED, logged, notified
                            msg = (
                                f"upstream flow still not ready after "
                                f"{self.max_flow_waits} waits: {r.error}"
                            )
                            if self.run_log:
                                self.run_log.record(
                                    tables[i].process_id,
                                    "ingest",
                                    tables[i].target_table_name,
                                    "FAILED",
                                    message=msg,
                                )
                            if self.notifier:
                                self.notifier.notify_failure(
                                    tables[i].target_table_name, msg
                                )
                            slots[i] = TableRunResult(
                                tables[i].target_table_name, "FAILED", msg
                            )
                            continue
                        heapq.heappush(
                            wait_heap,
                            (
                                time.monotonic() + self.flow_wait_seconds,
                                i,
                            ),
                        )
                now = time.monotonic()
                while wait_heap and wait_heap[0][0] <= now:
                    _, i = heapq.heappop(wait_heap)
                    futures[pool.submit(one, i, tables[i])] = i
        results = [r for r in slots if r is not None]
        self.results = results
        if self.notifier:
            # endpoint-level success gate: notify only endpoints with
            # ZERO failed tables (SendSuccededNotification.py:26-36 —
            # the per-ENDPOINT scan filters STATUS_STAGE='FAILED' ONLY,
            # so WARNING tables — the no-data class — do not suppress
            # the success publish; the reference's warning-only
            # endpoints still report success).
            # zip, not a name-keyed dict: pool.map preserves input
            # order, and a name-keyed rebuild would collapse duplicate
            # target_table_name values across endpoints onto the last
            # one's status (review catch) — a FAILED table could then
            # be masked by a later same-named success elsewhere.
            by_endpoint: dict[str, list[str]] = defaultdict(list)
            for t, r in zip(tables, results):
                by_endpoint[t.endpoint].append(r.status)
            for ep, statuses in by_endpoint.items():
                if all(s != "FAILED" for s in statuses):
                    self.notifier.notify_success(ep)
        return results
