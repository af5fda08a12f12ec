"""Range (interval containment) join — points matched to intervals.

The reference never joins in Spark at all (SURVEY.md §2.3: its only join
forms are source-side ``JOIN_EXPR`` passthrough, LQ:310, and the Delta
MERGE outer-join apply) — this operator is part of the time-series
extension surface alongside :mod:`.asof`.

Why not ``points.join(intervals, point.between(start, end))`` directly:
an inequality-only (or equi + inequality with a low-cardinality equi
key) join degenerates to BroadcastNestedLoopJoin / a skewed sort-merge —
O(|points| x |intervals|) comparisons per matching key group. At 100 TB
that plan never finishes.

Strategy here (the standard "bucketed interval join", same idea as
Spark's session windows and DuckDB/KDB interval indexes): quantize time
into fixed-width buckets, explode each interval into the bucket ids it
overlaps (``F.sequence`` — native, no Python), tag each point with its
single bucket id, then **equi-join** on (keys..., bucket) and re-check
the exact containment predicate. Each (point, interval) pair meets in
exactly one bucket (the point's), so no post-join dedup is needed.
Catalyst executes the equi-join as a shuffled hash / sort-merge join
that scales linearly and AQE can re-plan; the exploded side grows by
``ceil(span / bucket_width) + 1`` per interval, so pick ``bucket_width``
on the order of the typical interval span.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"
_PID = "__rj_pid"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket_width: int = 3_600_000_000,
    how: str = "inner",
    max_buckets: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (closed on both ends) and equal
    values on the ``on`` key columns.

    ``point_col`` / ``start_col`` / ``end_col`` must be integral (e.g.
    microsecond timestamps); ``bucket_width`` is in the same unit.
    ``how`` is ``inner`` or ``left`` (left keeps unmatched points with
    NULL interval columns). Output columns: all point columns, then the
    interval columns not in ``on`` (name collisions suffixed ``_right``).

    ``max_buckets`` bounds the per-interval bucket explosion: one
    corrupt interval end (a year-9999 bad parse at microsecond
    resolution) would otherwise materialize a ~70M-element bucket array
    in a single row and OOM the stage — the operator refuses such an
    interval loudly with its (start, end) instead (the gap-fill span
    guard's contract: corruption stops the job, it does not silently
    OOM). NULL start/end rows are dropped by the explode, the same
    silent NULL-key semantics as the equi-join itself; an inverted
    interval (end < start) yields descending buckets whose containment
    re-check matches nothing.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    # Row id so the left-join recovery can anti-join on identity rather
    # than on all point columns: plain-equality anti-join never matches a
    # row containing a NULL (it would be emitted twice — matched AND
    # null-padded) and collapses duplicate point rows.
    pts = points.withColumn(_PID, F.monotonically_increasing_id())
    if how == "left":
        # The id is only stable across the matched and anti-join
        # branches if the rows are NOT recomputed between them: a
        # shuffle in `points`' lineage makes within-partition order
        # (hence id packing) nondeterministic per evaluation, which
        # would duplicate or drop rows. persist() is NOT enough —
        # cached partitions are evicted under memory pressure and
        # silently recomputed with different ids. localCheckpoint
        # truncates the lineage so the ids become facts, not a
        # recomputable expression (same policy as cluster.py; on a
        # cluster prefer a fault-tolerant checkpoint dir, since
        # localCheckpoint blocks die with their executor).
        pts = pts.localCheckpoint(eager=True)
    # floor(), not an integer cast: cast truncates toward zero, which is
    # wrong for pre-epoch (negative) timestamps.
    pt = pts.withColumn(_BUCKET, F.floor(F.col(point_col) / F.lit(w)))
    b0 = F.floor(F.col(start_col) / F.lit(w))
    b1 = F.floor(F.col(end_col) / F.lit(w))
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            # abs(): F.sequence(b0, b1) with b0 > b1 generates a
            # DESCENDING array, so a corrupt START (or swapped bounds)
            # would bypass a signed bound and materialize the same
            # runaway array in the other direction (review catch on
            # the first guard draft). Small inverted intervals stay
            # allowed — their descending buckets match nothing under
            # the containment re-check.
            # double-cast: the engine session pins ANSI off, so a
            # pathological bound pair whose bucket indices differ by
            # more than 2^63 would WRAP in bigint subtraction and
            # could sneak under max_buckets, dying later in Spark's
            # own sequence() length error instead of this loud
            # per-interval refusal. Double arithmetic saturates
            # monotonically (no wrap); the guard only needs a
            # magnitude comparison, so the <2^53 precision loss is
            # irrelevant at any plausible max_buckets.
            F.when(
                F.abs(b1.cast("double") - b0.cast("double")) + 1
                > float(max_buckets),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"range_join: interval spans > {max_buckets} "
                            "buckets (corrupt end timestamp? raise "
                            "bucket_width or max_buckets) for interval ["
                        ),
                        F.col(start_col).cast("string"),
                        F.lit(", "),
                        F.col(end_col).cast("string"),
                        F.lit("]"),
                    )
                ),
            ).otherwise(F.sequence(b0, b1))
        ),
    )

    # disambiguate interval columns that collide with point columns
    collide = (set(points.columns) & set(iv.columns)) - set(on) - {_BUCKET}
    for c in collide:
        iv = iv.withColumnRenamed(c, f"{c}_right")
    start = start_col if start_col not in collide else f"{start_col}_right"
    end = end_col if end_col not in collide else f"{end_col}_right"

    cond = F.col(point_col).between(F.col(start), F.col(end))
    joined = pt.join(iv, on=[*on, _BUCKET], how="inner").filter(cond)
    out_cols = [c for c in joined.columns if c not in (_BUCKET, _PID)]
    if how == "inner":
        return joined.select(*out_cols)
    # left: restore unmatched points (anti-join on the row id)
    matched = joined.select(_PID, *out_cols)
    iv_cols = [c for c in matched.columns if c not in points.columns and c != _PID]
    unmatched = pts.join(matched.select(_PID), on=_PID, how="left_anti")
    for c in iv_cols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    return matched.unionByName(unmatched).drop(_PID)
