"""Watermark manager — batch-incremental load state (A1/I1).

Re-expresses the reference's UpdateLoadStartValue Lambdas
(UpdateLoadStartValue-MSSQL.py:140-189 and the ORACLE/MySQL variants):
per table, END_VALUE advances to max(filter_column) on the source
(greatest-of-two with NULL->2000-01-01 defaults when two filter columns
are declared), clamped to yesterday 23:59:59 when the source reports a
future date (is_valid_date, :43-53); START_VALUE becomes the previous
END_VALUE. State persists in the config catalog (here: a JSON store;
at scale: a Delta table with the same attribute names).
"""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "%Y-%m-%d %H:%M:%S"
NULL_DEFAULT = "2000-01-01 00:00:00"  # reference NULL watermark default


def clamp_future(value: str, now: dt.datetime | None = None) -> str:
    """is_valid_date semantics: a max() beyond `now` is clamped to
    yesterday 23:59:59 (UpdateLoadStartValue-MSSQL.py:43-53)."""
    now = now or dt.datetime.now()
    try:
        v = dt.datetime.strptime(value[:19], TS_FMT)
    except ValueError:
        return value
    if v > now:
        yesterday = (now - dt.timedelta(days=1)).replace(
            hour=23, minute=59, second=59, microsecond=0
        )
        return yesterday.strftime(TS_FMT)
    return value


def max_watermark(
    df: DataFrame,
    filter_columns: list[str],
    default: str = NULL_DEFAULT,
    now: dt.datetime | None = None,
) -> str:
    """``max(c)`` (or greatest of per-column maxes, NULLs defaulted)
    formatted as 'YYYY-MM-DD HH:MM:SS', future-clamped.

    The aggregation runs wherever the DataFrame lives — on a JDBC
    source Spark pushes the scan; at 100 TB a max() over a sorted/
    partitioned watermark column prunes to the tail partitions.
    """
    if not filter_columns:
        # an empty column list would crash below in an opaque
        # max()-of-empty — name the actual mistake instead
        raise ValueError(
            "max_watermark: filter_columns must name at least one column"
        )
    exprs = [
        F.date_format(
            F.coalesce(F.max(F.col(c)), F.lit(default).cast("timestamp")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias(f"m{i}")
        for i, c in enumerate(filter_columns)
    ]
    row = df.agg(*exprs).first()
    best = max(row[i] for i in range(len(filter_columns)))
    return clamp_future(best, now=now)


class WatermarkStore:
    """START_VALUE/END_VALUE persistence per target table."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def _load(self) -> dict:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return {}

    def get(self, table: str) -> tuple[str, str]:
        state = self._load().get(table, {})
        return state.get("start_value", NULL_DEFAULT), state.get(
            "end_value", NULL_DEFAULT
        )

    def advance(self, table: str, new_end: str) -> tuple[str, str]:
        """START <- previous END; END <- new_end (I1 watermark advance)."""
        doc = self._load()
        prev = doc.get(table, {})
        start = prev.get("end_value", NULL_DEFAULT)
        doc[table] = {"start_value": start, "end_value": new_end}
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(doc, indent=2))
        tmp.replace(self.path)
        return start, new_end
