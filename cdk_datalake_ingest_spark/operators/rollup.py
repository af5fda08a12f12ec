"""Continuous (incrementally-maintained) time-bucket rollup.

A hypertable-style continuous aggregate over an event table: a rollup
table keyed by (time bucket, dimensions) that a ``refresh()`` call
maintains by re-aggregating ONLY the buckets at or after the stored
watermark (minus a lookback window for late data) and merging them in —
never a full recompute.

This generalizes the reference's incremental machinery to aggregates:
the watermark advance is I1 (`UpdateLoadStartValue-*`), the lookback
re-extraction is I3 (`load_with_query.py:82-106`), and the
delete-window-then-merge apply is A7 (`aje-stage-dms-load.py:488-491`)
— the same policy over aggregated buckets instead of raw rows.

Scale notes (the reason this operator exists):
- the refresh filter is a plain range predicate on the stored timestamp
  column, so it pushes down to the scan / prunes date partitions — a
  refresh reads hours of data, not the 100 TB table;
- buckets are recomputed whole from raw rows (the cutoff is aligned to
  a bucket boundary), so the merge is an idempotent replace — re-running
  a refresh converges, no double counting;
- the merge touches O(lookback + new buckets) rows of the rollup table.

NULL event times: a row with a NULL ``ts_col`` is outside EVERY
refresh window (the watermark/lookback range predicates never match
NULL), so it is never ingested — the hypertable contract (TimescaleDB
likewise requires a NOT NULL time column). The gate oracle states the
same exclusion (CONTINUOUS_ROLLUP_SQL: WHERE ts IS NOT NULL), pinned
by the r11 degenerate-events sweep. Callers who must account for
timeless rows should bucket them upstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.table import ManagedTable
from cdk_datalake_ingest_spark.operators.watermark import WatermarkStore

HOUR_US = 3_600_000_000


@dataclass
class ContinuousRollup:
    spark: SparkSession
    path: str
    store: WatermarkStore
    name: str
    ts_col: str = "ts_us"
    bucket_us: int = HOUR_US
    dims: list[str] = field(default_factory=lambda: ["event_type"])
    value_col: str = "value"
    lookback_buckets: int = 1

    def __post_init__(self) -> None:
        # raise-at-boundary: bucket_us=0 divides by zero deep in a
        # task; a negative lookback silently SKIPS late buckets
        # instead of re-extracting them — both are config bugs, not
        # data conditions
        if self.bucket_us <= 0:
            raise ValueError(
                f"ContinuousRollup: bucket_us must be positive, "
                f"got {self.bucket_us}"
            )
        if self.lookback_buckets < 0:
            raise ValueError(
                f"ContinuousRollup: lookback_buckets must be >= 0, "
                f"got {self.lookback_buckets}"
            )
        self.table = ManagedTable(self.spark, self.path)

    def _last_end_us(self) -> int:
        _, end = self.store.get(self.name)
        try:
            return int(end)
        except ValueError:  # unset -> reference NULL default -> epoch 0
            return 0

    def _aggregate(self, df: DataFrame) -> DataFrame:
        bucket = (
            F.floor(F.col(self.ts_col) / F.lit(self.bucket_us))
            * F.lit(self.bucket_us)
        ).alias("bucket_us")
        return df.groupBy(bucket, *self.dims).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(self.value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
            F.max(self.ts_col).alias("_max_ts"),
        )

    def refresh(self, source: DataFrame) -> int:
        """Re-aggregate buckets from ``floor(last_end - lookback)`` on
        and merge them into the rollup; advance the watermark to
        ``max(ts)``. Returns the number of (bucket, dims) groups
        refreshed. Rows later
        than ``lookback_buckets`` behind the watermark are dropped —
        the same bounded-lateness contract as a streaming watermark."""
        last_end = self._last_end_us()
        cutoff = (
            (last_end - self.lookback_buckets * self.bucket_us)
            // self.bucket_us
            * self.bucket_us
        )
        cutoff = max(cutoff, 0)
        # range predicate on the STORED column -> parquet pushdown /
        # partition pruning; this is the "incremental" in incremental.
        agg = self._aggregate(source.filter(F.col(self.ts_col) >= cutoff))
        row = agg.agg(F.count(F.lit(1)), F.max("_max_ts")).first()
        n_buckets, max_ts = row[0], row[1]
        if n_buckets == 0:
            return 0
        # the watermark is true event time, NOT the bucket end: the last
        # bucket is partial, and lookback >= 1 guarantees the next
        # refresh recomputes it whole.
        self.table.merge_upsert(agg.drop("_max_ts"), keys=["bucket_us", *self.dims])
        self.store.advance(self.name, str(max(last_end, int(max_ts))))
        return int(n_buckets)

    def read(self) -> DataFrame:
        return self.table.read()
