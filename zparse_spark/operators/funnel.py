"""Ordered funnel analysis and retention cohorts over event streams.

The reference's parser is an ordered-acceptance machine — a state
advances only when the NEXT expected token class arrives (json/parser.rs
state transitions reject out-of-order structure). A conversion funnel is
the same machine over a user's event stream: stage i+1 counts only if it
happens strictly after the stage-i match. Retention cohorts are the
longitudinal companion: partition users by first-seen week and measure
how many remain active k weeks on.

100 TB shape (funnel): ONE shuffle — collect each key's events into a
sorted array, then run the acceptance machine as a JVM `aggregate` fold
(no Python, no per-stage join, no k-pass re-aggregation). Per-key event
counts are bounded in practice (a user's history fits in an executor
row); for unbounded keys pre-filter to the funnel's event types first —
the fold only needs candidate events, and that filter prunes the shuffle
to the funnel's own traffic.

100 TB shape (retention): two map-side-combining aggregations (first-seen
per key; distinct key×week) joined on the key — both shuffles carry one
row per user(-week), orders of magnitude below the event count; the
final cohort grid is tiny and the retention share rides a window over
it, never a re-scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_match_depth(
    events: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-key funnel progress: (key, depth, matched_us).

    depth = number of funnel stages completed in order; matched_us[i] is
    the exact microsecond timestamp of the stage-i match. The machine is
    greedy-earliest (advance at the FIRST event of the next expected
    type strictly later than the previous match) — greedy-earliest is
    optimal for existence: matching later can only forfeit candidates,
    so depth equals the max achievable. Strictly-later is compared in
    integer microseconds (bit-identical cross-engine; FP epoch would
    make equal-boundary decisions ambiguous).
    """
    steps = list(steps)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # Pre-filter to the funnel's own event types BEFORE the shuffle —
    # at scale this is the difference between shuffling the whole event
    # table and shuffling only funnel traffic.
    cand = events.filter(F.col(type_col).isin(steps)).select(
        F.col(key).alias("_k"),
        F.struct(
            us.alias("us"),
            F.col(order_col).cast("long").alias("ord"),
            F.col(type_col).alias("etype"),
        ).alias("_ev"),
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    per_key = cand.groupBy("_k").agg(F.array_sort(F.collect_list("_ev")).alias("_evs"))
    acc = F.aggregate(
        F.col("_evs"),
        F.expr("CAST(array() AS ARRAY<BIGINT>)"),
        lambda a, x: F.when(
            (F.size(a) < F.lit(len(steps)))
            & (x["etype"] == F.element_at(steps_lit, F.size(a) + 1))
            & ((F.size(a) == 0) | (x["us"] > F.element_at(a, -1))),
            F.concat(a, F.array(x["us"])),
        ).otherwise(a),
    )
    return per_key.select(
        F.col("_k").alias(key),
        acc.alias("matched_us"),
    ).withColumn("depth", F.size("matched_us"))


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Funnel conversion table: one row per stage with the number of
    keys reaching it and the share relative to stage 1. Stages no key
    reaches still appear (n_users = 0) — a vanished stage is the
    signal, not a row to drop."""
    steps = list(steps)
    depth = funnel_match_depth(events, steps, key, ts_col, type_col, order_col)
    reached = (
        depth.filter(F.col("depth") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("depth"))).alias("step_no"))
        .groupBy("step_no")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    grid = (
        depth.sparkSession.range(1, len(steps) + 1)
        .select(F.col("id").cast("int").alias("step_no"))
        .withColumn("step", F.element_at(F.array(*[F.lit(s) for s in steps]), F.col("step_no")))
    )
    first_n = F.max(F.when(F.col("step_no") == 1, F.col("n_users"))).over(
        Window.partitionBy(F.lit(1))
    )
    return (
        grid.join(reached, "step_no", "left")
        .withColumn("n_users", F.coalesce(F.col("n_users"), F.lit(0)))
        .withColumn(
            "pct_of_first",
            F.round(F.col("n_users") / F.nullif(first_n, F.lit(0)), 6),
        )
        .select("step_no", "step", "n_users", "pct_of_first")
    )


def retention_cohorts(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention grid: (cohort_period, period_offset, n_active,
    retention). cohort_period is the key's first-seen truncated period;
    a key counts as active in every distinct period it has an event;
    retention = n_active / cohort size (offset 0 is 1.0 by construction
    — the first-seen period is active by definition)."""
    p = F.date_trunc(period, F.col(ts_col).cast("timestamp"))
    firsts = events.groupBy(F.col(key).alias("_k")).agg(F.min(p).alias("cohort_period"))
    active = (
        events.select(F.col(key).alias("_k"), p.alias("period")).distinct()
    )
    seconds = {"week": 7 * 86400, "day": 86400}[period]
    joined = active.join(firsts, "_k").withColumn(
        "period_offset",
        (
            (F.unix_micros(F.col("period")) - F.unix_micros(F.col("cohort_period")))
            / F.lit(seconds * 1_000_000)
        ).cast("int"),
    )
    grid = joined.groupBy("cohort_period", "period_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    cohort_size = F.max(F.when(F.col("period_offset") == 0, F.col("n_active"))).over(
        Window.partitionBy("cohort_period")
    )
    return grid.select(
        "cohort_period",
        "period_offset",
        "n_active",
        F.round(F.col("n_active") / F.nullif(cohort_size, F.lit(0)), 6).alias("retention"),
    )


def event_path_ngrams(
    events: DataFrame,
    n: int = 3,
    top_n: int | None = 50,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Top consecutive event-type n-grams across all keys' ordered
    streams — path analysis ("which 3-step journeys actually happen?"),
    the exploratory companion to funnel_report's confirmatory machine
    and the event-stream analog of pmi_collocations' token bigrams.

    Keys with fewer than ``n`` events contribute nothing (no padding —
    a 2-event user has no 3-step path). Deterministic total order for
    the top-n cut: count desc, path asc. 100 TB shape: one shuffle
    collects each key's (ts, ord, type) structs (bounded per key by a
    user's own history — pre-filter upstream for degenerate bot keys);
    the slide is a map-only array transform; the n-gram count
    map-side-combines to the distinct-path domain; ``top_n`` is a
    TakeOrdered, never a global sort.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_key = (
        events.select(
            F.col(key).alias("_k"),
            F.struct(
                us.alias("us"),
                F.col(order_col).cast("long").alias("ord"),
                F.col(type_col).alias("etype"),
            ).alias("_ev"),
        )
        .groupBy("_k")
        .agg(F.array_sort(F.collect_list("_ev")).alias("_evs"))
        .select(F.transform(F.col("_evs"), lambda e: e["etype"]).alias("_seq"))
        .filter(F.size("_seq") >= n)
    )
    grams = per_key.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_seq") - (n - 1)),
                lambda i: F.array_join(F.slice(F.col("_seq"), i, n), ">"),
            )
        ).alias("path")
    )
    out = grams.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    if top_n is not None:
        out = out.orderBy(F.col("n_occurrences").desc(), F.col("path").asc()).limit(top_n)
    return out


def active_users(
    events: DataFrame,
    window_days: int = 7,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact DAU / rolling WAU / stickiness per day — the
    load-bearing engagement triple (stickiness = DAU/WAU is the
    canonical "do they come back?" ratio, and the rolling-distinct WAU
    is the part a naive window can't do: COUNT(DISTINCT) over a sliding
    frame isn't decomposable, so it's computed by fanning each (key,
    active day) out to the ``window_days`` report days it supports and
    counting distinct keys per report day).

    Exactness: integer counts; the one float op (stickiness division)
    is IEEE-exact on identical integers. Days with no activity inside
    the observed range are densified to zero rows — a dead day reads
    0/owau, not a missing row.

    Scale shape: events reduce to the distinct (key, day) table FIRST
    (one map-side-combining distinct at event volume — the lower
    bound); the ×window_days fan-out happens on that reduced table, so
    the second shuffle carries |distinct user-days| × window rows, far
    below event count; the final grid is days-sized. Distinct-count
    state per task is bounded by Spark's two-phase distinct expand.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    kd = events.select(F.col(key).alias("_k"), day.alias("day")).distinct()
    mm = kd.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dau = kd.groupBy("day").agg(F.countDistinct("_k").alias("dau"))
    fan = kd.select(
        "_k",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("day"),
    )
    wau = fan.groupBy("day").agg(F.countDistinct("_k").alias("wau"))
    grid = mm.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    return (
        grid.join(dau, "day", "left")
        .join(wau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            F.coalesce(F.col("wau"), F.lit(0)).alias("wau"),
            F.when(
                F.coalesce(F.col("wau"), F.lit(0)) > 0,
                F.round(F.coalesce(F.col("dau"), F.lit(0)) / F.col("wau"), 6),
            ).alias("stickiness"),
        )
    )


def survival_curve(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier survival of per-key activity lifetimes — "how long
    does a user/source/feed stay alive?" with the censoring handled
    honestly: a key whose last event falls within ``censor_days`` of the
    observation end may still be active, so it counts as AT-RISK up to
    its observed duration but never as a death (dropping such keys —
    or calling them dead — both bias retention short).

    Estimator: S(t) = prod_{t_i <= t} (1 - d_i / n_i) over death times
    t_i, with d_i = uncensored lifetimes ending at t_i and n_i = keys
    whose duration >= t_i (censored included until they leave). The
    cumulative product runs as a window ``product()`` in deterministic
    duration order on BOTH engines — same association order, so round-6
    is pure last-ulp insurance; a death time where d == n drives S to
    exactly 0.0, no log(0) escape hatch needed.

    Scale shape: one groupBy(key) reduces events to lifetimes (the
    event-volume pass, map-side combined), one groupBy(duration) to the
    KM table, and the windows run on |distinct durations| rows — a
    bounded curve table, which is why the unpartitioned window is safe
    here and nowhere else. The observation end is a broadcast 1-row agg.

    Output: (dur_days, n_risk, n_events, survival) at death times only.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    per = events.groupBy(F.col(key).alias("_k")).agg(
        F.min(day).alias("first_day"), F.max(day).alias("last_day")
    )
    end = events.agg(F.max(day).alias("obs_end"))
    lifetimes = per.crossJoin(F.broadcast(end)).select(
        F.datediff("last_day", "first_day").alias("dur_days"),
        (F.datediff("obs_end", "last_day") < censor_days).cast("int").alias("censored"),
    )
    tab = lifetimes.groupBy("dur_days").agg(
        F.count(F.lit(1)).alias("n_ending"),
        F.sum(F.when(F.col("censored") == 0, 1).otherwise(0)).alias("n_events"),
    )
    w_desc = Window.orderBy(F.col("dur_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_asc = Window.orderBy("dur_days").rowsBetween(Window.unboundedPreceding, 0)
    km = tab.withColumn("n_risk", F.sum("n_ending").over(w_desc)).withColumn(
        "survival",
        F.round(
            F.product(
                (F.col("n_risk") - F.col("n_events")) / F.col("n_risk")
            ).over(w_asc),
            6,
        ),
    )
    return km.filter(F.col("n_events") > 0).select(
        "dur_days", "n_risk", "n_events", "survival"
    )
