"""Incremental-extraction predicates and windows (P10/P11/I2/I3).

The reference synthesizes WHERE clauses as SQL text pushed to the
source RDBMS (load_with_query.py:178-222,306-327) and fans incremental
ranges across driver threads (:281-329). Here the same semantics are
typed Column predicates (Catalyst pushes them down to JDBC/parquet
scans) and range slicing is delegated to Spark's native partitioned
JDBC read — the thread pool, and the duplicate rows its inclusive
BETWEEN slice edges produce (patched by dropDuplicates, :169), both
disappear.
"""

from __future__ import annotations

import calendar
import datetime as dt
from dataclasses import dataclass

from dateutil.relativedelta import relativedelta
from pyspark.sql import Column
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.dsl.compiler import MAGIC_EPOCH_OFFSET

NEUTRAL_FILTER = "0=0"  # reference neutral element (load_with_query.py:316)


def between_filter(
    filter_columns: list[str], start, end, inclusive_end: bool = True
) -> Column:
    """P10: ``c IS NOT NULL AND c BETWEEN start AND end``; with two
    columns, the OR-of-both form (load_with_query.py:185-193)."""
    parts = []
    for c in filter_columns:
        col = F.col(c)
        rng = (
            col.between(start, end)
            if inclusive_end
            else ((col >= start) & (col < end))
        )
        parts.append(col.isNotNull() & rng)
    pred = parts[0]
    for p in parts[1:]:
        pred = pred | p
    return pred


def filter_expression(
    filter_exp: str = "", filter_column: str = "", start=None, end=None
) -> Column:
    """P11: metadata FILTER_EXP + FILTER_COLUMN combined with AND,
    with {0}/{1} placeholder substitution and `0=0` as the neutral
    element (load_with_query.py:312-325)."""
    exp = (filter_exp or NEUTRAL_FILTER).strip() or NEUTRAL_FILTER
    col = (filter_column or NEUTRAL_FILTER).strip() or NEUTRAL_FILTER
    combined = f"({exp}) AND ({col})"
    if start is not None:
        combined = combined.replace("{0}", str(start))
    if end is not None:
        combined = combined.replace("{1}", str(end))
    return F.expr(combined)


@dataclass(frozen=True)
class RangeSlice:
    start: dt.datetime
    end: dt.datetime


def range_slices(
    start: dt.datetime, end: dt.datetime, n: int
) -> list[RangeSlice]:
    """I2 equal time slices. Unlike the reference's inclusive BETWEEN
    edges (which double-extract boundary rows), slices here are
    half-open [start, end) except the last — no boundary duplicates,
    so no compensating dropDuplicates pass is needed."""
    delta = (end - start) / n
    out = []
    for i in range(n):
        s = start + delta * i
        e = end if i == n - 1 else start + delta * (i + 1)
        out.append(RangeSlice(s, e))
    return out


def slice_predicates(
    filter_column: str, start: dt.datetime, end: dt.datetime, n: int
) -> list[str]:
    """SQL predicates for ``spark.read.jdbc(..., predicates=...)`` —
    one partition per slice, executed by Spark tasks (replacing the
    reference's driver ThreadPoolExecutor, load_with_query.py:297-329)."""
    preds = []
    for i, s in enumerate(range_slices(start, end, n)):
        hi_op = "<=" if i == n - 1 else "<"
        preds.append(
            f"{filter_column} >= '{s.start:%Y-%m-%d %H:%M:%S}' "
            f"AND {filter_column} {hi_op} '{s.end:%Y-%m-%d %H:%M:%S}'"
        )
    return preds


def get_limits_for_filter(
    month_diff: int,
    data_type: str,
    now: dt.datetime | None = None,
) -> tuple[str, str]:
    """I3 lookback window limits in the source's encoding
    (load_with_query.py:82-106): ``aje_period`` -> YYYYMM strings;
    ``aje_date``/``aje_processperiod`` -> magic day numbers (1900-01-01
    epoch + 693596) snapped to month boundaries."""
    data_type = data_type.strip()
    upper = now or dt.datetime.now()
    lower = upper - relativedelta(months=(-1 * int(month_diff)))
    if data_type == "aje_period":
        return lower.strftime("%Y%m"), upper.strftime("%Y%m")
    if data_type in ("aje_date", "aje_processperiod"):
        _, last_day = calendar.monthrange(upper.year, upper.month)
        upper_day = upper.replace(day=last_day)
        lower_day = lower.replace(day=1)
        base = dt.datetime(1900, 1, 1)
        to_magic = lambda d: (d.replace(tzinfo=None) - base).days + MAGIC_EPOCH_OFFSET
        return str(to_magic(lower_day)), str(to_magic(upper_day))
    return lower.strftime("%Y%m"), upper.strftime("%Y%m")


def lookback_period_cutoff(
    month_diff: int, now: dt.datetime | None = None
) -> int:
    """A7 delete-window lower bound as integer YYYYMM
    (aje-stage-dms-load.py:488-491)."""
    upper = now or dt.datetime.now()
    lower = upper - relativedelta(months=(-1 * int(month_diff)))
    return int(lower.strftime("%Y%m"))
