"""Continuous rollup operator (operators/rollup.py): incremental
refresh must equal full recompute, converge on re-run, and honor the
bounded-lateness contract."""

from __future__ import annotations

from pyspark.sql import Row

from cdk_datalake_ingest_spark.operators.rollup import ContinuousRollup
from cdk_datalake_ingest_spark.operators.watermark import WatermarkStore


def _rollup(spark, tmp_path, lookback=1):
    return ContinuousRollup(
        spark,
        str(tmp_path / "rollup"),
        WatermarkStore(tmp_path / "wm.json"),
        name="events_hourly",
        bucket_us=100,
        dims=["event_type"],
        lookback_buckets=lookback,
    )


def _rows(spark, *triples):
    return spark.createDataFrame(
        [Row(ts_us=t, event_type=e, value=float(v)) for t, e, v in triples]
    )


def _table(r):
    return {
        (x.bucket_us, x.event_type): (x.n, x.total_value)
        for x in r.read().collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    batch1 = [(10, "a", 1), (20, "b", 2), (110, "a", 3), (150, "a", 4)]
    batch2 = [(160, "b", 5), (210, "a", 6), (290, "b", 7)]
    r = _rollup(spark, tmp_path)
    assert r.refresh(_rows(spark, *batch1)) == 3  # groups (0,a),(0,b),(100,a)
    assert r.refresh(_rows(spark, *(batch1 + batch2))) > 0
    full = _rollup(spark, tmp_path / "full")
    full.refresh(_rows(spark, *(batch1 + batch2)))
    assert _table(r) == _table(full)
    assert _table(r)[(100, "a")] == (2, 7.0)
    assert _table(r)[(200, "a")] == (1, 6.0)


def test_refresh_converges(spark, tmp_path):
    rows = [(10, "a", 1), (110, "a", 2), (120, "b", 3)]
    r = _rollup(spark, tmp_path)
    r.refresh(_rows(spark, *rows))
    before = _table(r)
    r.refresh(_rows(spark, *rows))  # no new data: re-runs must be no-ops
    r.refresh(_rows(spark, *rows))
    assert _table(r) == before


def test_late_row_within_lookback_is_counted(spark, tmp_path):
    r = _rollup(spark, tmp_path, lookback=1)
    r.refresh(_rows(spark, (110, "a", 1), (150, "a", 2)))  # wm -> 150
    # late row at 120: one bucket behind the watermark bucket -> inside
    # the lookback window, gets merged in
    r.refresh(_rows(spark, (110, "a", 1), (150, "a", 2), (120, "a", 9)))
    assert _table(r)[(100, "a")] == (3, 12.0)


def test_late_row_beyond_lookback_is_dropped(spark, tmp_path):
    r = _rollup(spark, tmp_path, lookback=1)
    r.refresh(_rows(spark, (10, "a", 1), (350, "a", 2)))  # wm -> 350
    # bucket 0 is far behind wm-bucket 300: outside lookback -> the
    # stale count for bucket 0 is preserved, the late row ignored
    r.refresh(_rows(spark, (10, "a", 1), (20, "a", 9), (350, "a", 2)))
    assert _table(r)[(0, "a")] == (1, 1.0)


def test_watermark_is_event_time_and_partial_bucket_recovers(spark, tmp_path):
    r = _rollup(spark, tmp_path)
    r.refresh(_rows(spark, (110, "a", 1)))
    assert r.store.get("events_hourly")[1] == "110"
    # more rows land in the same (partial) bucket later
    r.refresh(_rows(spark, (110, "a", 1), (190, "a", 5)))
    assert _table(r)[(100, "a")] == (2, 6.0)


def test_empty_refresh_returns_zero(spark, tmp_path):
    r = _rollup(spark, tmp_path)
    assert r.refresh(_rows(spark, (10, "a", 1)).filter("ts_us > 99")) == 0


def test_rollup_rejects_degenerate_config(spark, tmp_path):
    import pytest

    from cdk_datalake_ingest_spark.operators.rollup import ContinuousRollup
    from cdk_datalake_ingest_spark.operators.watermark import WatermarkStore

    store = WatermarkStore(tmp_path / "wm.json")
    with pytest.raises(ValueError, match="bucket_us must be positive"):
        ContinuousRollup(spark, str(tmp_path / "r"), store, "r", bucket_us=0)
    with pytest.raises(ValueError, match="lookback_buckets must be >= 0"):
        ContinuousRollup(
            spark, str(tmp_path / "r"), store, "r", lookback_buckets=-1
        )
