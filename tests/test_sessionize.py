"""Gap-based sessionization (operators/sessionize.py)."""

from __future__ import annotations

from cdk_datalake_ingest_spark.operators.sessionize import (
    MICROS_PER_MIN,
    assign_sessions,
    sessionize,
)

SCHEMA = "user_id bigint, event_id bigint, ts_us bigint, value double"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_single_user_gap_split(spark):
    m = MICROS_PER_MIN
    df = _mk(
        spark,
        [
            (1, 1, 0 * m, 1.0),
            (1, 2, 10 * m, 1.0),
            (1, 3, 29 * m, 1.0),   # 19 min gap -> same session
            (1, 4, 60 * m, 1.0),   # 31 min gap -> new session
            (1, 5, 61 * m, 1.0),
        ],
    )
    got = {
        r.event_id: r.session_seq
        for r in assign_sessions(df, gap_minutes=30).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2}


def test_exact_30min_gap_stays_in_session(spark):
    m = MICROS_PER_MIN
    df = _mk(spark, [(1, 1, 0, 1.0), (1, 2, 30 * m, 1.0)])
    got = assign_sessions(df, gap_minutes=30).collect()
    assert {r.session_seq for r in got} == {1}  # strict > gap splits


def test_users_independent_and_rollup(spark):
    m = MICROS_PER_MIN
    df = _mk(
        spark,
        [
            (1, 1, 0, 2.0),
            (1, 2, 5 * m, 3.0),
            (2, 3, 0, 7.0),
            (2, 4, 90 * m, 1.0),
        ],
    )
    out = {
        (r.user_id, r.session_seq): r
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert set(out) == {(1, 1), (2, 1), (2, 2)}
    s11 = out[(1, 1)]
    assert s11.n_events == 2
    assert s11.total_value == 5.0
    assert s11.duration_us == 5 * m
    assert out[(2, 2)].n_events == 1
    assert out[(2, 2)].duration_us == 0


def test_tiebreak_same_timestamp(spark):
    # two events at the same ts: deterministic order via event_id
    df = _mk(spark, [(1, 2, 100, 1.0), (1, 1, 100, 1.0)])
    got = sessionize(df, gap_minutes=30).collect()
    assert len(got) == 1 and got[0].n_events == 2


def test_sessionize_rejects_nonpositive_gap(spark):
    """All three sessionizer variants raise the same way on gap <= 0:
    the JVM session_window would error at analysis time while the
    window/stateful formulations silently degenerate — uniform raise
    at the boundary instead of a cross-variant divergence."""
    import pytest

    from cdk_datalake_ingest_spark.operators.sessionize import (
        assign_sessions,
    )
    from cdk_datalake_ingest_spark.streaming.sessionize import (
        sessionize_stream,
        sessionize_stream_native,
    )

    df = spark.createDataFrame(
        [(1, 0, 1, 1.0)], "user_id long, ts_us long, event_id long, value double"
    )
    for gap in (0, -5):
        with pytest.raises(ValueError, match="must be positive"):
            assign_sessions(df, gap_minutes=gap)
        with pytest.raises(ValueError, match="must be positive"):
            sessionize_stream(df, gap_minutes=gap)
        with pytest.raises(ValueError, match="must be positive"):
            sessionize_stream_native(df, gap_minutes=gap)
