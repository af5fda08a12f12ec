"""Schedule triggers (I5): cron + rate schedules driving planner runs.

The reference triggers ingestion with EventBridge rules: the general
load fires on ``cron(minute=30, hour=5)`` daily with a payload of
``{PROCESS_ID_TO_LOAD, COUNTRIES_TO_LOAD}``
(datalake_ingestion_stack.py:661-664), and the Salesforce flows fire on
``rate(5 hours)`` / ``rate(1 day)``
(salesforce_ingestion_stack.py:500-511). EventBridge is an external
service; the engine-side equivalent is a deterministic schedule model —
compute the fire times, hand each due firing's payload to the run
planner (plans/planner.py) — so an external loop (cron, Airflow, a
while-sleep) only needs to call ``due_runs`` with wall-clock bounds.

Everything here is driver-side control plane: O(#schedules) per tick,
independent of data volume.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from typing import Any, Iterator


@dataclass(frozen=True)
class CronSchedule:
    """EventBridge-style cron over the (minute, hour, day-of-month,
    month, day-of-week) fields the reference uses — numeric values or
    ``*``. Times are UTC, as in EventBridge."""

    minute: str = "*"
    hour: str = "*"
    day_of_month: str = "*"
    month: str = "*"
    #: EventBridge numbering: 1-7 = SUN-SAT (1=Sunday … 7=Saturday),
    #: '*' = any.  NOT Python weekday() (0=Monday) and NOT standard
    #: cron (0=Sunday) — mapped internally in next_fire.
    day_of_week: str = "*"

    @staticmethod
    def _match(spec: str, value: int) -> bool:
        if spec == "*":
            return True
        return any(int(part) == value for part in spec.split(","))

    @staticmethod
    def _eventbridge_dow(t: dt.datetime) -> int:
        """Python weekday() (0=Mon..6=Sun) → EventBridge 1-7 SUN-SAT."""
        return (t.weekday() + 1) % 7 + 1

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        """First fire time strictly after ``after``. Minute
        granularity, like EventBridge."""
        t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
        # bounded scan: a (minute,hour,dom,month,dow) pattern recurs
        # within 4 years (worst case Feb-29)
        for _ in range(4 * 366 * 24 * 60):
            if (
                self._match(self.minute, t.minute)
                and self._match(self.hour, t.hour)
                and self._match(self.day_of_month, t.day)
                and self._match(self.month, t.month)
                and self._match(self.day_of_week, self._eventbridge_dow(t))
            ):
                return t
            t += dt.timedelta(minutes=1)
        raise ValueError(f"cron pattern never fires: {self}")


@dataclass(frozen=True)
class RateSchedule:
    """EventBridge ``rate(N hours|days)``: fixed interval from an
    anchor (EventBridge anchors at rule creation)."""

    interval: dt.timedelta
    anchor: dt.datetime

    @classmethod
    def hours(cls, n: int, anchor: dt.datetime) -> "RateSchedule":
        return cls(dt.timedelta(hours=n), anchor)

    @classmethod
    def days(cls, n: int, anchor: dt.datetime) -> "RateSchedule":
        return cls(dt.timedelta(days=n), anchor)

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        if after < self.anchor:
            return self.anchor
        elapsed = (after - self.anchor) // self.interval
        nxt = self.anchor + (elapsed + 1) * self.interval
        return nxt


@dataclass
class TriggerRule:
    """One EventBridge rule: a schedule plus the static payload the
    target receives (the reference passes PROCESS_ID_TO_LOAD +
    COUNTRIES_TO_LOAD into the start-workflow lambda)."""

    name: str
    schedule: CronSchedule | RateSchedule
    payload: dict[str, Any] = field(default_factory=dict)

    def fires_between(
        self, start: dt.datetime, end: dt.datetime
    ) -> Iterator[dt.datetime]:
        t = start
        while True:
            t = self.schedule.next_fire(t)
            if t > end:
                return
            yield t


#: The reference's three rules, reconstructable for tests/demos.
def reference_rules(anchor: dt.datetime) -> list[TriggerRule]:
    return [
        TriggerRule(
            "start load rule",
            CronSchedule(minute="30", hour="5"),
            {"PROCESS_ID_TO_LOAD": "01", "COUNTRIES_TO_LOAD": "ALL"},
        ),
        TriggerRule("salesforce-5h", RateSchedule.hours(5, anchor), {}),
        TriggerRule("salesforce-daily", RateSchedule.days(1, anchor), {}),
    ]


def expand_payload(payload: dict[str, Any]) -> list[tuple[str, str | None]]:
    """Expand an EventBridge payload into planner arguments the way the
    start-workflow lambda does (StartWorkFlow.py:171-190): both fields
    are comma-separated lists, crossed into one planner invocation per
    (process_id, country) pair. A country of ``ALL`` means no endpoint
    prefix restriction."""
    processes = [
        p.strip()
        for p in str(payload.get("PROCESS_ID_TO_LOAD", "")).split(",")
        if p.strip()
    ]
    countries = [
        c.strip()
        for c in str(payload.get("COUNTRIES_TO_LOAD", "ALL")).split(",")
        if c.strip()
    ] or ["ALL"]
    return [
        (p, None if c.upper() == "ALL" else c)
        for p in processes
        for c in countries
    ]


def due_runs(
    rules: list[TriggerRule], since: dt.datetime, now: dt.datetime
) -> list[tuple[dt.datetime, str, dict[str, Any]]]:
    """All (fire_time, rule_name, payload) firings in ``(since, now]``,
    time-ordered — what a driver loop feeds into
    plans/planner.plan_run, one planner run per firing."""
    firings = [
        (t, r.name, r.payload)
        for r in rules
        for t in r.fires_between(since, now)
    ]
    return sorted(firings, key=lambda x: (x[0], x[1]))
