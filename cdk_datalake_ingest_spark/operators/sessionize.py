"""Gap-based sessionization over an event stream (batch form).

An extension beyond the reference's surface (SURVEY.md §2.9 — its
"incremental" model is batch watermarking only): assign events to
sessions that close after ``gap`` of inactivity, the standard
training-data primitive for behavioral features. Pure window functions
— one shuffle on the user key, everything else stays JVM-side:

    new_session = ts - lag(ts) > gap   (first event → new session)
    session_seq = running sum of new_session flags
    then one groupBy (user, session_seq) for the session rollup.

The streaming equivalent (arbitrary-state sessionizer) lives in
streaming/sessionize.py; this batch form is the oracle-checkable
semantics reference for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICROS_PER_MIN = 60_000_000


def assign_sessions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Add a ``session_seq`` column (1-based per user, time order).

    ``ts_col`` is bigint epoch microseconds; ties broken totally by
    ``tiebreak_col`` so results are deterministic under re-runs.
    """
    # same contract as the streaming variants (_check_gap): a
    # non-positive gap silently degenerates here but errors in the JVM
    # session_window twin — raise uniformly at the boundary instead
    if gap_minutes <= 0:
        raise ValueError(
            f"sessionize: gap_minutes must be positive, got {gap_minutes}"
        )
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    gap_us = gap_minutes * MICROS_PER_MIN
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) - prev_ts > gap_us), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
    value_col: str | None = "value",
) -> DataFrame:
    """Session rollup: one row per (user, session) with start/end/span,
    event count and exact value total."""
    tagged = assign_sessions(df, user_col, ts_col, tiebreak_col, gap_minutes)
    aggs = [
        F.min(ts_col).alias("session_start_us"),
        F.max(ts_col).alias("session_end_us"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value")
        )
    return tagged.groupBy(user_col, "session_seq").agg(*aggs)
