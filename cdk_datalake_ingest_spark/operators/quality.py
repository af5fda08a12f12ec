"""Data-quality expectations over DataFrames (the Delta Live Tables /
Great Expectations shape, engine-side): declarative row-level rules
compiled to native boolean columns, aggregated into one violation
report, with optional quarantine routing and referential-integrity
checks.

The reference runs its loads open-loop (failures surface as Glue job
errors); production lakehouse ingest wants expectations BEFORE the
merge — this module provides them in the same declarative style as the
column-transform DSL.

Scale notes: rule evaluation is a pure map fused into the scan (one
boolean expression per rule, no UDFs); the report is a single
partial-aggregated pass (one row out per rule); `fk_violations` is a
left-anti join — broadcast when the parent key side is dimension-sized.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule names become column names and stack() string literals — keep
#: them identifier-shaped so they can never break (or inject into) the
#: generated expressions
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class Rule:
    """A row-level expectation: ``expr`` is a SQL boolean expression
    (or Column) that is True for GOOD rows. NULL evaluations count as
    violations (an unknown is not a pass). ``name`` must be a plain
    identifier (it is spliced into generated column names and a
    ``stack()`` expression)."""

    name: str
    expr: str | Column

    def __post_init__(self) -> None:
        if not _NAME_RE.match(self.name):
            raise ValueError(
                f"rule name must match {_NAME_RE.pattern!r}: {self.name!r}"
            )

    def col(self) -> Column:
        c = F.expr(self.expr) if isinstance(self.expr, str) else self.expr
        return F.coalesce(c.cast("boolean"), F.lit(False))


def annotate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Add one ``__ok_<rule>`` boolean per rule (pure map stage)."""
    out = df
    for r in rules:
        out = out.withColumn(f"__ok_{r.name}", r.col())
    return out


def validation_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: ``(rule, n_rows, n_violations,
    violation_rate)`` — a single aggregate pass over the annotated
    relation (rate rounded to 6 for cross-engine hashing)."""
    if not rules:
        raise ValueError("at least one rule required")
    ann = annotate(df, rules)
    aggs = []
    for r in rules:
        aggs.append(
            F.sum(
                F.when(~F.col(f"__ok_{r.name}"), 1).otherwise(0)
            ).alias(f"__v_{r.name}")
        )
    wide = ann.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    # melt the 1-row wide report: tiny relation, stack is a map
    pairs = ", ".join(
        f"'{r.name}', __v_{r.name}" for r in rules
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {pairs}) as (rule, n_violations)", "__n"
    ).select(
        "rule",
        F.col("__n").alias("n_rows"),
        "n_violations",
        F.round(F.col("n_violations") / F.col("__n"), 6).alias(
            "violation_rate"
        ),
    )


def quarantine(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Split into (good, bad): good rows pass EVERY rule; bad rows
    carry a ``__failed_rules`` array naming what they violated."""
    if not rules:
        raise ValueError("at least one rule required")
    ann = annotate(df, rules)
    ok_cols = [F.col(f"__ok_{r.name}") for r in rules]
    all_ok = ok_cols[0]
    for c in ok_cols[1:]:
        all_ok = all_ok & c
    failed = F.filter(
        F.array(
            *[
                F.when(~F.col(f"__ok_{r.name}"), F.lit(r.name))
                for r in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    drop = [f"__ok_{r.name}" for r in rules]
    good = ann.filter(all_ok).drop(*drop)
    bad = (
        ann.filter(~all_ok)
        .withColumn("__failed_rules", failed)
        .drop(*drop)
    )
    return good, bad


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    keys: dict[str, str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential integrity: child rows whose key has no match in
    parent (NULL child keys are orphans too, matching the row-rule
    NULL-is-violation convention). ``keys`` maps child column ->
    parent column. Left-anti join; the parent side projects to its
    key columns only and broadcasts when dimension-sized."""
    pk = parent.select(
        *[F.col(p).alias(f"__pk_{c}") for c, p in keys.items()]
    ).distinct()
    if broadcast_parent:
        pk = F.broadcast(pk)
    cond = None
    for c in keys:
        eq = child[c] == pk[f"__pk_{c}"]
        cond = eq if cond is None else cond & eq
    return child.join(pk, cond, "left_anti")
