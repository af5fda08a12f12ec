"""Streaming MERGE sink: foreachBatch upsert into a ManagedTable.

Connects Structured Streaming to the engine's stage-zone merge path —
the streaming equivalent of the reference's per-run Delta MERGE
(aje-stage-dms-load.py:492-495): every micro-batch is key-deduped with
the deterministic window and upserted; re-processing a batch after a
restart converges to the same table state (merge is idempotent on
keys+ordering), which is what makes foreachBatch's at-least-once
delivery effectively exactly-once here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from cdk_datalake_ingest_spark.operators.table import ManagedTable


def stream_upsert_to_table(
    stream_df: DataFrame,
    table_path: str | os.PathLike,
    keys: list[str],
    checkpoint_dir: str,
    order_by: list[str] | None = None,
    available_now: bool = True,
):
    """Start (and, for availableNow, drain) a streaming upsert.

    Returns the StreamingQuery for non-blocking triggers."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ManagedTable(batch_df.sparkSession, table_path).merge_upsert(
            batch_df, keys=keys, order_by=order_by
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
