from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from zparse_spark.operators.sessionize import sessionize


def _ev(spark, rows):
    # rows: (event_id, user_id, ts_seconds_offset)
    base = dt.datetime(2024, 1, 1)
    data = [(eid, uid, base + dt.timedelta(seconds=off)) for eid, uid, off in rows]
    return spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")


def test_gap_splits_sessions(spark):
    df = _ev(spark, [(1, 7, 0), (2, 7, 100), (3, 7, 100 + 3601), (4, 7, 100 + 3601 + 10)])
    out = sessionize(df, gap_us=3600 * 1_000_000).orderBy("event_id").collect()
    assert [r.session_seq for r in out] == [1, 1, 2, 2]


def test_gap_exactly_threshold_does_not_split(spark):
    # strictly-greater contract: a gap EQUAL to the threshold continues
    df = _ev(spark, [(1, 1, 0), (2, 1, 3600)])
    out = sessionize(df, gap_us=3600 * 1_000_000).orderBy("event_id").collect()
    assert [r.session_seq for r in out] == [1, 1]


def test_keys_are_independent(spark):
    df = _ev(spark, [(1, 1, 0), (2, 2, 10), (3, 1, 10_000), (4, 2, 20)])
    out = {r.event_id: r.session_seq for r in sessionize(df, gap_us=60 * 1_000_000).collect()}
    assert out == {1: 1, 3: 2, 2: 1, 4: 1}


def test_equal_ts_tiebreak_deterministic(spark):
    # two events at the identical timestamp: order_cols pins the order,
    # so the boundary indicator lands identically run-to-run
    df = _ev(spark, [(5, 3, 0), (4, 3, 0), (6, 3, 7200)])
    out = sessionize(df, gap_us=3600 * 1_000_000).orderBy("event_id").collect()
    assert [(r.event_id, r.session_seq) for r in out] == [(4, 1), (5, 1), (6, 2)]


def test_sub_second_gap_uses_microseconds(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, 1, base),
            (2, 1, base + dt.timedelta(microseconds=500)),
            (3, 1, base + dt.timedelta(microseconds=2000)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = sessionize(df, gap_us=1000).orderBy("event_id").collect()
    assert [r.session_seq for r in out] == [1, 1, 2]


def test_plan_single_exchange(spark):
    df = _ev(spark, [(i, i % 3, i * 10) for i in range(30)])
    agg = (
        sessionize(df, gap_us=60 * 1_000_000)
        .groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # the window shuffle on user_id is the ONLY exchange; the
    # (user_id, session_seq) aggregate rides the same partitioning
    assert plan.count("Exchange") == 1, plan
