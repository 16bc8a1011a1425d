from __future__ import annotations

import datetime as dt

from zparse_spark.operators.funnel import (
    funnel_match_depth,
    funnel_report,
    retention_cohorts,
)

STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    # rows: (event_id, user_id, seconds_offset, event_type)
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, uid, base + dt.timedelta(seconds=off), et) for eid, uid, off, et in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _depths(spark, rows):
    df = _ev(spark, rows)
    return {r.user_id: r.depth for r in funnel_match_depth(df, STEPS).collect()}


def test_in_order_full_conversion(spark):
    d = _depths(spark, [(1, 1, 0, "view"), (2, 1, 10, "click"), (3, 1, 20, "purchase")])
    assert d == {1: 3}


def test_out_of_order_does_not_count(spark):
    # purchase BEFORE the click: machine accepts view, then click, but
    # the purchase that already happened must not satisfy stage 3
    d = _depths(spark, [(1, 1, 0, "view"), (2, 1, 10, "purchase"), (3, 1, 20, "click")])
    assert d == {1: 2}


def test_strictly_later_equal_ts_rejected(spark):
    # click at the SAME microsecond as the matched view is not "after"
    d = _depths(spark, [(1, 1, 0, "view"), (2, 1, 0, "click")])
    assert d == {1: 1}


def test_greedy_earliest_is_optimal(spark):
    # two views: greedy matches the first; the click between them still
    # satisfies stage 2 (matching the LATER view would forfeit it)
    d = _depths(
        spark,
        [(1, 1, 0, "view"), (2, 1, 5, "click"), (3, 1, 9, "view"), (4, 1, 12, "purchase")],
    )
    assert d == {1: 3}


def test_missing_first_stage_means_zero(spark):
    d = _depths(spark, [(1, 1, 0, "click"), (2, 1, 5, "purchase")])
    assert d == {1: 0}


def test_irrelevant_events_ignored(spark):
    d = _depths(
        spark,
        [(1, 1, 0, "error"), (2, 1, 1, "view"), (3, 1, 2, "signup"), (4, 1, 3, "click")],
    )
    assert d == {1: 2}


def test_report_includes_unreached_stage(spark):
    df = _ev(spark, [(1, 1, 0, "view"), (2, 2, 0, "view"), (3, 1, 5, "click")])
    rows = {r.step_no: r for r in funnel_report(df, STEPS).collect()}
    assert rows[1].n_users == 2 and rows[1].pct_of_first == 1.0
    assert rows[2].n_users == 1 and abs(rows[2].pct_of_first - 0.5) < 1e-9
    assert rows[3].n_users == 0 and rows[3].pct_of_first == 0.0
    assert rows[3].step == "purchase"


def test_funnel_plan_single_exchange_for_depth(spark):
    df = _ev(spark, [(i, i % 5, i * 7, STEPS[i % 3]) for i in range(60)])
    plan = (
        funnel_match_depth(df, STEPS)._jdf.queryExecution().executedPlan().toString()
    )
    # one shuffle: the groupBy(user) collect_list; the fold is expr-only
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _retention(spark, rows):
    df = _ev(spark, rows)
    return {
        (r.cohort_period.date() if hasattr(r.cohort_period, "date") else r.cohort_period,
         r.period_offset): (r.n_active, r.retention)
        for r in retention_cohorts(df).collect()
    }


def test_retention_offsets_and_shares(spark):
    # 2024-01-01 is a Monday: week boundaries land on it exactly
    wk = 7 * 86400
    rows = [
        (1, 1, 0, "view"),          # u1 week 0
        (2, 2, 10, "view"),         # u2 week 0
        (3, 1, wk + 5, "click"),    # u1 active week 1
        (4, 3, wk + 6, "view"),     # u3 first seen week 1
        (5, 1, 3 * wk, "view"),     # u1 active week 3 (gap week 2)
    ]
    grid = _retention(spark, rows)
    d0 = dt.date(2024, 1, 1)
    d1 = dt.date(2024, 1, 8)
    assert grid[(d0, 0)] == (2, 1.0)
    assert grid[(d0, 1)][0] == 1 and abs(grid[(d0, 1)][1] - 0.5) < 1e-9
    assert grid[(d0, 3)][0] == 1
    assert (d0, 2) not in grid  # silent week emits no row
    assert grid[(d1, 0)] == (1, 1.0)


def test_retention_multiple_events_same_week_count_once(spark):
    rows = [(1, 1, 0, "view"), (2, 1, 100, "click"), (3, 1, 200, "view")]
    grid = _retention(spark, rows)
    assert grid == {(dt.date(2024, 1, 1), 0): (1, 1.0)}


def test_event_path_ngrams(spark):
    from zparse_spark.operators.funnel import event_path_ngrams

    rows = [
        # user 1: v > c > p  -> one trigram
        (1, 1, 0, "view"), (2, 1, 10, "click"), (3, 1, 20, "purchase"),
        # user 2: v > c > p > v -> two trigrams (v>c>p, c>p>v)
        (4, 2, 0, "view"), (5, 2, 1, "click"), (6, 2, 2, "purchase"), (7, 2, 3, "view"),
        # user 3: only two events -> contributes nothing
        (8, 3, 0, "view"), (9, 3, 1, "click"),
    ]
    df = _ev(spark, rows)
    out = {r.path: r.n_occurrences for r in event_path_ngrams(df, n=3, top_n=None).collect()}
    assert out == {"view>click>purchase": 2, "click>purchase>view": 1}


def test_event_path_ngrams_order_is_temporal_not_arrival(spark):
    from zparse_spark.operators.funnel import event_path_ngrams

    # rows arrive shuffled; the path must follow (ts, event_id)
    rows = [(3, 1, 20, "purchase"), (1, 1, 0, "view"), (2, 1, 10, "click")]
    df = _ev(spark, rows).repartition(4)
    out = [r.path for r in event_path_ngrams(df, n=3, top_n=None).collect()]
    assert out == ["view>click>purchase"]


def test_active_users_rolling_distinct(spark):
    from zparse_spark.operators.funnel import active_users

    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1 active day 0 and day 2 (twice); u2 active day 0 only
        (1, 1, 0, "view"),
        (2, 2, 0, "view"),
        (3, 1, 2 * 86400, "click"),
        (4, 1, 2 * 86400 + 5, "view"),
        # u3 active day 9 -> day gap 3..8 must densify to dau=0
        (5, 3, 9 * 86400, "view"),
    ]
    df = _ev(spark, rows)
    out = {r.day: r for r in active_users(df, window_days=7).collect()}
    d = lambda i: dt.date(2024, 1, 1 + i)
    assert len(out) == 10  # densified 2024-01-01..01-10
    assert (out[d(0)].dau, out[d(0)].wau) == (2, 2)
    assert (out[d(2)].dau, out[d(2)].wau) == (1, 2)  # u1 counted once
    # day 6: nobody active, but u1 (day 0 and 2) and u2 (day 0) in window
    assert (out[d(6)].dau, out[d(6)].wau) == (0, 2)
    # day 7: day-0 activity aged out; u1's day-2 still supports
    assert (out[d(7)].dau, out[d(7)].wau) == (0, 1)
    # day 9: only u3's window
    assert (out[d(9)].dau, out[d(9)].wau, out[d(9)].stickiness) == (1, 1, 1.0)
    assert out[d(3)].stickiness is not None and out[d(3)].stickiness == 0.0


def test_survival_curve_hand_case(spark):
    """Textbook KM on 5 lifetimes (durations 0,1,1,2,3; the 3 censored):
    S(0) = 4/5 * ... verified against the hand formula, with the
    censored key at-risk through its duration but never a death."""
    import datetime as dt

    from zparse_spark.operators.funnel import survival_curve

    base = dt.datetime(2026, 1, 1)
    rows = []
    # durations: u1=0 (dies), u2=1 (dies), u3=1 (dies), u4=2 (dies), u5=3
    # obs_end = base+12 via a lone u6 event; u5's last event at +3 is
    # 9 days before obs_end (>= 7, uncensored); u6 (dur 0) IS censored
    for uid, (start, dur) in enumerate(
        [(0, 0), (0, 1), (0, 1), (0, 2), (0, 3), (12, 0)], start=1
    ):
        rows.append((uid, base + dt.timedelta(days=start)))
        rows.append((uid, base + dt.timedelta(days=start + dur)))
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["dur_days"]: r for r in survival_curve(df, censor_days=7).collect()}
    # at-risk: dur>=0: 6, dur>=1: 4 (u1 died at 0, u6 censored at 0), >=2: 2, >=3: 1
    assert out[0]["n_risk"] == 6 and out[0]["n_events"] == 1
    assert out[1]["n_risk"] == 4 and out[1]["n_events"] == 2
    assert out[2]["n_risk"] == 2 and out[2]["n_events"] == 1
    assert out[3]["n_risk"] == 1 and out[3]["n_events"] == 1
    s0 = 5 / 6
    s1 = s0 * (2 / 4)
    s2 = s1 * (1 / 2)
    assert abs(out[0]["survival"] - round(s0, 6)) < 1e-9
    assert abs(out[1]["survival"] - round(s1, 6)) < 1e-9
    assert abs(out[2]["survival"] - round(s2, 6)) < 1e-9
    assert out[3]["survival"] == 0.0  # everyone at-risk at 3 dies at 3
