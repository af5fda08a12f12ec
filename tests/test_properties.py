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
