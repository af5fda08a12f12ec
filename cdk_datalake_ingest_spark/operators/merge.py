"""Pure-DataFrame MERGE semantics (upsert + delete-window).

Re-expresses the reference's Delta MERGE
(`whenMatchedUpdateAll().whenNotMatchedInsertAll()` on IS_ID equality,
aje-stage-dms-load.py:492-495) and the transactional delete-before-merge
(processperiod >= lookback cutoff, :488-491) as a join rewrite:

    merged = source ∪ (target ⟕anti source on keys)

which is exactly upsert when the source is key-unique. Persistence of
the result (atomic swap) is ManagedTable's job (operators/table.py);
with delta-spark installed ManagedTable uses real Delta MERGE instead.

Scale notes: one shuffle on the merge keys (broadcast the source side
when it is a small incremental batch — pass ``broadcast_source=True``);
the delete-window predicate prunes target partitions before the
anti-join when the table is partitioned on the window column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.dedup import latest_record_dedup


def merge_dataframes(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_by: list[str] | None = None,
    delete_predicate: Column | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``.

    - ``order_by``: recency columns used to deterministically dedup the
      source to one row per key first (W1 pattern — replaces the
      reference's nondeterministic ``dropDuplicates``, TL:394-395).
    - ``delete_predicate``: rows of ``target`` where this is TRUE are
      deleted before the merge (A7). NULL predicate values keep the row
      (Delta DELETE semantics).
    - Schema evolution: union is by name with missing columns allowed,
      mirroring delta.schema.autoMerge (aje-stage-dms-load.py:44).
    """
    import functools

    if order_by:
        source = latest_record_dedup(source, keys, order_by)
    else:
        source = source.dropDuplicates(keys)
    if delete_predicate is not None:
        target = target.filter(
            ~F.coalesce(delete_predicate, F.lit(False))
        )
    src_for_join = F.broadcast(source) if broadcast_source else source
    # null-safe anti-join conditions: NULL is a legitimate key value
    # (dropDuplicates/latest_record_dedup already group NULL keys
    # together, and changes_between classifies them with eqNullSafe) —
    # a name-list anti-join would never match a NULL key, so the stale
    # target row would survive NEXT TO the upserted source row,
    # duplicating the key on every merge.
    anti = functools.reduce(
        lambda a, b: a & b,
        [
            F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}"))
            for k in keys
        ],
    )
    survivors = (
        target.alias("__t")
        .join(
            src_for_join.select(*keys).distinct().alias("__s"),
            anti,
            "left_anti",
        )
    )
    return source.unionByName(survivors, allowMissingColumns=True)
