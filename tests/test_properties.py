"""Property-based tests (SURVEY.md §5.5): transform invariants, merge
convergence, watermark clamp monotonicity/idempotence."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.dsl.compiler import (
    MAGIC_EPOCH_OFFSET,
    compile_transformation,
)
from cdk_datalake_ingest_spark.operators.merge import merge_dataframes
from cdk_datalake_ingest_spark.operators.watermark import clamp_future

_SLOW = dict(max_examples=6, deadline=None)
_FAST = dict(max_examples=200, deadline=None)

NOW = dt.datetime(2026, 8, 13, 12, 0, 0)
YESTERDAY_EOD = "2026-08-12 23:59:59"


@given(
    st.datetimes(
        min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2100, 1, 1)
    )
)
@settings(**_FAST)
def test_clamp_future_bounded_and_idempotent(ts):
    v = ts.strftime("%Y-%m-%d %H:%M:%S")
    clamped = clamp_future(v, now=NOW)
    # never beyond yesterday end-of-day (the reference's rule,
    # UpdateLoadStartValue-MSSQL.py:170-176)
    assert clamped <= YESTERDAY_EOD
    # past values pass through; idempotent either way
    if v <= YESTERDAY_EOD:
        assert clamped == v
    assert clamp_future(clamped, now=NOW) == clamped


@given(st.integers(min_value=0, max_value=5_000_000))
@settings(**_SLOW)
def test_datemagic_decode_matches_validity_window(spark, n):
    """Any integer: decode iff it matches the reference's regex window
    (700000..3599999), else the declared default (SJ:263-277)."""
    df = spark.createDataFrame([(str(n),)], "day_num string")
    got = df.select(
        compile_transformation(
            "fn_transform_DateMagic(day_num,yyyy-MM-dd,1900-01-01)", "date"
        ).alias("d")
    ).first()["d"]
    if 700000 <= n <= 3599999:
        want = dt.date(1900, 1, 1) + dt.timedelta(days=n - MAGIC_EPOCH_OFFSET)
    else:
        want = dt.date(1900, 1, 1)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # key
            st.integers(min_value=0, max_value=100),  # version
            st.integers(min_value=-1000, max_value=1000),  # value
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SLOW)
def test_merge_is_idempotent_and_latest_wins(spark, rows):
    """Re-merging the same source is a no-op, and every key holds the
    max-version row (deterministic survivor under total order)."""
    data = [
        (k, v, val, i) for i, (k, v, val) in enumerate(rows)
    ]  # tiebreak idx makes survivor unambiguous
    df = spark.createDataFrame(data, "k int, ver int, val int, idx int")
    target = df.limit(0)
    once = merge_dataframes(target, df, ["k"], order_by=["ver", "idx"])
    twice = merge_dataframes(once, df, ["k"], order_by=["ver", "idx"])
    got_once = {(r.k, r.ver, r.val, r.idx) for r in once.collect()}
    got_twice = {(r.k, r.ver, r.val, r.idx) for r in twice.collect()}
    assert got_once == got_twice
    want = {}
    for k, ver, val, idx in data:
        if k not in want or (ver, idx) > (want[k][1], want[k][3]):
            want[k] = (k, ver, val, idx)
    assert got_once == set(want.values())


@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
        ),
        max_size=30,
    ),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
        ),
        max_size=10,
    ),
)
@settings(**_SLOW)
def test_concatenate_ws_arbitrary_columns(spark, a, b):
    df = spark.createDataFrame([(a, b)], "c1 string, c2 string")
    got = df.select(
        compile_transformation(
            "fn_transform_Concatenate_ws(c1,c2,-)", "string"
        ).alias("x")
    ).first()["x"]
    assert got == f"{a}-{b}"


# ---- range join: bucketed strategy == naive inequality join ------------

_pt = st.tuples(
    st.integers(min_value=0, max_value=3),      # key
    st.integers(min_value=-500, max_value=500),  # ts
)
_iv = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=-500, max_value=500),
    st.integers(min_value=0, max_value=200),     # span
)


@given(
    st.lists(_pt, min_size=1, max_size=25),
    st.lists(_iv, min_size=1, max_size=10),
    st.sampled_from([7, 50, 128, 1000]),
)
@settings(**_SLOW)
def test_range_join_equals_naive(spark, points, intervals, width):
    from cdk_datalake_ingest_spark.operators.range_join import range_join

    p = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)], "k int, ts long, pid int"
    )
    iv = spark.createDataFrame(
        [(k, lo, lo + span, i) for i, (k, lo, span) in enumerate(intervals)],
        "k int, lo long, hi long, iid int",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(p, iv, "ts", "lo", "hi", on=["k"], bucket_width=width).collect()
    }
    want = {
        (pid, iid)
        for (kp, t), pid in ((x, i) for i, x in enumerate(points))
        for (ki, lo, span), iid in ((x, i) for i, x in enumerate(intervals))
        if kp == ki and lo <= t <= lo + span
    }
    assert got == want


# ---- continuous rollup: incremental == full, any batch split -----------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),  # ts
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=999),  # split point
)
@settings(**_SLOW)
def test_rollup_incremental_equals_full_for_any_ordered_split(
    spark, tmp_path_factory, rows, split
):
    """Event-time-ordered arrival split at any point: refreshing batch1
    then all-rows equals one full refresh (the lateness contract only
    bites for out-of-order arrival beyond lookback, excluded here)."""
    from cdk_datalake_ingest_spark.operators.rollup import ContinuousRollup
    from cdk_datalake_ingest_spark.operators.watermark import WatermarkStore

    base = tmp_path_factory.mktemp("roll")

    def mk(name):
        return ContinuousRollup(
            spark,
            str(base / name),
            WatermarkStore(base / f"{name}.wm.json"),
            name=name,
            bucket_us=100,
            dims=["event_type"],
        )

    df = spark.createDataFrame(
        [(t, e, float(v)) for t, e, v in rows],
        "ts_us long, event_type string, value double",
    )
    inc, full = mk("inc"), mk("full")
    inc.refresh(df.filter(F.col("ts_us") < split))
    inc.refresh(df)
    full.refresh(df)
    snap = lambda r: {
        (x.bucket_us, x.event_type): (x.n, x.total_value)
        for x in r.read().collect()
    }
    assert snap(inc) == snap(full)
