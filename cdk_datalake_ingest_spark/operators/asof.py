"""As-of join — match each left row with the latest right row at or
before it (per key): the time-series primitive Spark has no built-in
operator for (brief: custom operators the engine must supply).

Implemented as a composition of existing DataFrame ops (no UDFs):

    union(tagged left, tagged right)
      -> window last(right payload STRUCT, ignorenulls) per key
         ordered by (ts, side)        [right sorts before left on ties]
      -> keep left rows, unpack struct

The payload travels as ONE struct so the carried-forward match is
atomic — per-column carry would stitch fields from different right
rows whenever a right column is legitimately NULL.

One shuffle on the key — the same cost as the equi-join Spark would
need anyway; no range explosion, no per-key collect. Ties (right.ts ==
left.ts) match, as in standard ASOF JOIN semantics.

``tolerance_us`` drops matches older than the bound — the band-join
special case that usually motivates "range join" support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_ts_col: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every ``left`` row, the newest ``right`` row with
    ``right.ts <= left.ts`` on the same key (NULL payload when none).

    ``ts_col`` values must be comparable (use epoch integers for
    cross-engine determinism). ``right_cols`` defaults to every right
    column that is neither a key nor the timestamp; they surface with
    ``suffix`` appended, plus the matched timestamp itself."""
    rts = right_ts_col or ts_col
    payload = right_cols or [
        c for c in right.columns if c not in on and c != rts
    ]
    struct_fields = [F.col(rts).alias("__ts"), *[F.col(c) for c in payload]]

    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload",
        F.lit(None).cast(
            right.select(F.struct(*struct_fields).alias("s")).schema["s"].dataType
        ),
    )
    r_tag = right.select(
        *on,
        F.col(rts).alias(ts_col),
        F.struct(*struct_fields).alias("__payload"),
    ).withColumn("__side", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col(ts_col) - F.col("__match.__ts") <= F.lit(tolerance_us),
                F.col("__match"),
            ),
        )
    return out.select(
        *left.columns,
        F.col("__match.__ts").alias(f"{rts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload],
    )
