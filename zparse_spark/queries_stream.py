"""Streaming dedup + offline compaction, oracle-gated end to end.

Round 3 left X6 (streaming-history compaction) pytest-only; this module
puts the batch-equivalence CLAIM itself into the DuckDB gate: running
``dedup_stream`` (dropDuplicatesWithinWatermark, availableNow) over a
3-batch fixture — including a post-watermark re-delivery that slips into
the sink twice, the documented watermark gap — followed by
``compact_dedup_sink`` must equal the BATCH answer over the union of all
input batches: the min-event-time row per id. DuckDB computes that
answer directly (row_number over ts per id) from the same persisted
batch parquet, so a green row certifies streaming + compaction together
give exactly-once semantics over all history.

Event times are distinct per (id, delivery) by construction, so the
keep rule never reaches its hash tie-break (xxhash64 has no DuckDB
counterpart; ties are pytest-covered instead).
"""

from __future__ import annotations

import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from zparse_spark.queries import register

_W = "/root/repo/spark-warehouse/oracle"
_T0 = 1_700_000_000

_STREAM_SQL = f"""WITH inp AS (
  SELECT doc_id, val, ts FROM read_parquet('{_W}/stream_src/*.parquet')
),
ranked AS (
  SELECT doc_id, val, CAST(epoch(ts) AS BIGINT) AS ts_s,
         row_number() OVER (PARTITION BY doc_id ORDER BY ts ASC) AS rn
  FROM inp
)
SELECT doc_id, val, ts_s FROM ranked WHERE rn = 1"""


@register("streaming_dedup_compaction", _STREAM_SQL)
def streaming_dedup_compaction(spark, sf_dir):
    """Three availableNow micro-runs against a growing parquet source:

    - batch 1: ids 0..79 (first deliveries);
    - batch 2: ids 40..119 three hours later — 40..79 are re-deliveries
      caught by LIVE dedup state (dropped in-stream), 80..119 are new;
      the watermark advances past batch 1's state expiry;
    - batch 3: ids 0..19 re-delivered after their state expired (the
      watermark gap: they land in the sink as duplicates) plus new
      200..219.

    ``compact_dedup_sink`` then removes the late extras; the result must
    match DuckDB's batch answer (min event time per id over the union of
    inputs) row for row — ids 0..79 keep their batch-1 rows, every
    mid-watermark duplicate was never in the sink at all."""
    from zparse_spark.streaming.validate_stream import compact_dedup_sink, dedup_stream

    src = f"{_W}/stream_src"
    out = f"{_W}/stream_out"
    for p in (src, out):
        shutil.rmtree(p, ignore_errors=True)

    def batch(lo: int, hi: int, t_base: int, tag: str):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.lit(tag).alias("val"),
            F.timestamp_seconds(F.lit(t_base) + F.col("id")).alias("ts"),
        )

    schema = "doc_id bigint, val string, ts timestamp"

    def run(df):
        df.write.mode("append").parquet(src)
        q = dedup_stream(
            spark.readStream.schema(schema).parquet(src), out, delay="1 hour"
        )
        q.awaitTermination(120)

    run(batch(0, 80, _T0, "b1"))
    run(batch(40, 120, _T0 + 3 * 3600, "b2"))
    run(
        batch(0, 20, _T0 + 4 * 3600, "b3").unionByName(
            batch(200, 220, _T0 + 4 * 3600, "b3")
        )
    )
    compacted = compact_dedup_sink(spark, out, event_time_col="ts")
    return compacted.select(
        "doc_id", "val", F.col("ts").cast("long").alias("ts_s")
    )


# ---------------------------------------------------------------------------
# Windowed violation rates with watermark: late-data semantics oracled
# ---------------------------------------------------------------------------

_WIN_S = 600          # 10-minute tumbling windows
_DELAY_S = 1800       # 30-minute watermark
_TW0 = 1_700_000_400  # window-aligned (divisible by 600)

# The oracle reimplements Spark's streaming-aggregation contract
# explicitly, batch by batch:
#   * a row arriving in batch b is DROPPED iff its window end <= the
#     watermark in force during b (= max event time over batches < b,
#     minus the delay) — that window's state was already evicted;
#   * a window is EMITTED (appears in the append-mode sink at all) iff
#     its end <= the final watermark — the sentinel's own window never
#     closes and must be absent.
_RATE_SQL = f"""WITH inp AS (
  SELECT CAST(epoch(ts) AS BIGINT) AS e, rule_id, batch
  FROM read_parquet('{_W}/ratewin_src/*.parquet')
),
wm AS (
  SELECT b.batch,
         (SELECT max(p.e) FROM inp p WHERE p.batch < b.batch) - {_DELAY_S} AS w
  FROM (SELECT DISTINCT batch FROM inp) b
),
kept AS (
  SELECT i.e, i.rule_id,
         CAST(i.e // {_WIN_S} * {_WIN_S} AS BIGINT) AS ws
  FROM inp i JOIN wm ON i.batch = wm.batch
  WHERE wm.w IS NULL OR (i.e // {_WIN_S} * {_WIN_S}) + {_WIN_S} > wm.w
),
final_wm AS (SELECT max(e) - {_DELAY_S} AS w FROM inp)
SELECT ws AS window_start_s, ws + {_WIN_S} AS window_end_s, rule_id,
       count(*) AS n_violations
FROM kept, final_wm
WHERE rule_id <> 'Z_SENTINEL' AND ws + {_WIN_S} <= final_wm.w
GROUP BY ws, rule_id"""


@register("streaming_violation_rate_windows", _RATE_SQL)
def streaming_violation_rate_windows(spark, sf_dir):
    """Windowed violation-rate stream (10-min tumbling, 30-min
    watermark, append mode) across three availableNow runs over a
    growing source — certifying the LATE-DATA contract, not just the
    counts: a batch-2 row aimed at a long-closed window is dropped, a
    late row whose window is still open merges, and a window the
    watermark never passes (the sentinel's own) is absent from the
    sink. The DuckDB twin reimplements the per-batch watermark drop
    rule and the final emission rule explicitly, so a green row means
    streaming-over-history equals the stated batch semantics."""
    from zparse_spark.streaming.validate_stream import violation_rate_windows

    src = f"{_W}/ratewin_src"
    out = f"{_W}/ratewin_out"
    ckpt = f"{_W}/ratewin_ckpt"
    for p in (src, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def mk(rows, tag):
        return spark.createDataFrame(rows, "ts_s long, rule_id string").select(
            F.timestamp_seconds(F.col("ts_s")).alias("ts"),
            "rule_id",
            F.lit(tag).alias("batch"),
        )

    def run(df):
        df.write.mode("append").parquet(src)
        q = (
            violation_rate_windows(
                spark.readStream.schema("ts timestamp, rule_id string, batch int")
                .parquet(src)
                .drop("batch"),
                window_duration="10 minutes",
                watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    T = _TW0
    run(mk([(T + 0, "S1"), (T + 60, "S1"), (T + 120, "S1"),
            (T + 700, "S2"), (T + 800, "S2"),
            (T + 7200, "S1")], 1))
    run(mk([(T + 130, "S1"),               # late, window closed -> dropped
            (T + 5500, "S2"),              # late, window still open -> merges
            (T + 7300, "S1"), (T + 7400, "S1")], 2))
    run(mk([(T + 32400, "Z_SENTINEL")], 3))  # closes every real window

    res = spark.read.parquet(out)
    return res.select(
        F.col("window_start").cast("long").alias("window_start_s"),
        F.col("window_end").cast("long").alias("window_end_s"),
        "rule_id",
        "n_violations",
    ).filter(F.col("rule_id") != "Z_SENTINEL")


_SESS_GAP_MS = 6 * 3600 * 1000

_SESSION_STREAM_SQL = f"""WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms
  FROM read_parquet('{_W}/session_src/*.parquet')
  WHERE user_id < 1000000000
),
seq AS (
  SELECT user_id, ms,
         lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev_ms
  FROM e
),
marked AS (
  SELECT user_id, ms,
         CASE WHEN prev_ms IS NULL OR ms - prev_ms > {_SESS_GAP_MS} THEN 1 ELSE 0 END AS is_new
  FROM seq
),
sess AS (
  SELECT user_id, ms,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS seq
  FROM marked
)
SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_end_ms,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, seq"""


@register("streaming_sessionize_equivalence", _SESSION_STREAM_SQL)
def streaming_sessionize_equivalence(spark, sf_dir):
    """Streaming gap sessionization (applyInPandasWithState +
    EventTimeTimeout) must equal BATCH sessionization over the same
    history — the X82/X158 twin of X14's dedup claim, now oracle-gated:
    the real events table is delivered as three time-ordered batches
    (days 1-10 / 11-20 / rest), each an availableNow run resuming the
    same checkpoint, so sessions span micro-runs through GroupState;
    sessions still open at end of data are closed by watermark TIMEOUT,
    driven by two far-future sentinel deliveries (the second run fires
    the timeouts the first one's watermark armed). DuckDB computes the
    batch truth (lag/gap/cumsum sessionization to ms precision) from the
    SAME persisted source, sentinels excluded. State per live user is
    three longs — the 10^12-doc shape where the history can never be
    re-scanned per batch."""
    import shutil as _sh

    from zparse_spark.streaming.stateful import sessionize_stream

    src = f"{_W}/session_src"
    out = f"{_W}/session_out"
    ck = f"{_W}/session_ck"
    for p in (src, out, ck):
        _sh.rmtree(p, ignore_errors=True)

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    day = F.dayofmonth("ts")
    batches = [
        ev.filter(day <= 10),
        ev.filter((day > 10) & (day <= 20)),
        ev.filter(day > 20),
    ]
    mx = ev.agg(F.max(F.unix_seconds(F.col("ts").cast("timestamp"))).alias("m")).first()["m"]
    sentinel = 1_000_000_000

    def _sent(offset_s: int):
        return spark.createDataFrame(
            [(sentinel,)], "user_id long"
        ).select("user_id", F.timestamp_seconds(F.lit(mx + offset_s)).alias("ts"))

    def run(df):
        df.coalesce(1).write.mode("append").parquet(src)
        q = (
            sessionize_stream(
                spark.readStream.schema("user_id long, ts timestamp").parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run(batches[0])
    run(batches[1])
    # last real slice rides with sentinel-1 (advances the watermark past
    # every real last-event + gap); sentinel-2 fires the armed timeouts
    run(batches[2].unionByName(_sent(30 * 24 * 3600)))
    run(_sent(31 * 24 * 3600))

    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") != sentinel)
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
    )


# ---------------------------------------------------------------------------
# Streaming distribution drift: per-window PSI/KL of the kind mix
# ---------------------------------------------------------------------------

_D_EPS = 1e-4  # RuleParams.drift_epsilon — the same floor D1 uses

_DRIFT_SQL = f"""WITH inp AS (
  SELECT CAST(epoch(ts) AS BIGINT) AS e, rule_id, batch
  FROM read_parquet('{_W}/driftwin_src/*.parquet')
),
wm AS (
  SELECT b.batch,
         (SELECT max(p.e) FROM inp p WHERE p.batch < b.batch) - {_DELAY_S} AS w
  FROM (SELECT DISTINCT batch FROM inp) b
),
kept AS (
  SELECT i.e, i.rule_id,
         CAST(i.e // {_WIN_S} * {_WIN_S} AS BIGINT) AS ws
  FROM inp i JOIN wm ON i.batch = wm.batch
  WHERE wm.w IS NULL OR (i.e // {_WIN_S} * {_WIN_S}) + {_WIN_S} > wm.w
),
final_wm AS (SELECT max(e) - {_DELAY_S} AS w FROM inp),
counts AS (
  SELECT ws, rule_id AS kind, count(*) AS n
  FROM kept, final_wm
  WHERE rule_id <> 'Z_SENTINEL' AND ws + {_WIN_S} <= final_wm.w
  GROUP BY 1, 2
),
grid AS (
  SELECT w.ws, d.kind
  FROM (SELECT DISTINCT ws FROM counts) w, (SELECT DISTINCT kind FROM counts) d
),
dense AS (
  SELECT g.ws, g.kind, coalesce(c.n, 0) AS n
  FROM grid g LEFT JOIN counts c ON g.ws = c.ws AND g.kind = c.kind
),
tot AS (SELECT ws, sum(n) AS t FROM dense GROUP BY 1),
gl AS (SELECT kind, sum(n) AS gn FROM dense GROUP BY 1),
gt AS (SELECT sum(n) AS g FROM dense),
terms AS (
  SELECT d.ws,
         CAST(d.n AS DOUBLE) / t.t + {_D_EPS} AS pk,
         CAST(gl.gn AS DOUBLE) / gt.g + {_D_EPS} AS qk,
         d.n
  FROM dense d JOIN tot t ON d.ws = t.ws JOIN gl ON d.kind = gl.kind, gt
)
SELECT ws AS window_start_s, ws + {_WIN_S} AS window_end_s,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(sum((pk - qk) * ln(pk / qk)), 6) AS psi,
       round(sum(pk * ln(pk / qk)), 6) AS kl
FROM terms GROUP BY ws"""


@register("streaming_drift_psi_windows", _DRIFT_SQL)
def streaming_drift_psi_windows(spark, sf_dir):
    """Streaming distribution-drift monitor: per-window PSI and KL of
    the kind mix against the history-wide mix, computed over the
    append-mode sink of the SAME certified windowed-count stream as
    streaming_violation_rate_windows (10-min tumbling, 30-min
    watermark, three availableNow runs; one late row that merges into
    a still-open window is planted, so the drift numbers inherit the
    late-data contract, not just the happy path). Batch side of the
    claim: D1's exact eps-floored PSI/KL arithmetic on the emitted
    (window × kind) grid — a drifted window (one kind flooding, one
    vanishing) must score high in BOTH engines from the SAME emitted
    set. The DuckDB twin reimplements the per-batch watermark drop
    rule, the emission rule AND the drift arithmetic."""
    from zparse_spark.streaming.validate_stream import violation_rate_windows

    src = f"{_W}/driftwin_src"
    out = f"{_W}/driftwin_out"
    ckpt = f"{_W}/driftwin_ckpt"
    for p in (src, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def mk(rows, tag):
        return spark.createDataFrame(rows, "ts_s long, rule_id string").select(
            F.timestamp_seconds(F.col("ts_s")).alias("ts"),
            "rule_id",
            F.lit(tag).alias("batch"),
        )

    def run(df):
        df.write.mode("append").parquet(src)
        q = (
            violation_rate_windows(
                spark.readStream.schema("ts timestamp, rule_id string, batch int")
                .parquet(src)
                .drop("batch"),
                window_duration="10 minutes",
                watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    T = _TW0
    # window A (T..T+600): balanced 4/4/4/4; window B (T+600..T+1200):
    # near-balanced 5/4/3/4 (one K2 arrives LATE in batch 2 while B is
    # still open); window C (T+1200..T+1800): drifted 14/1/1/0 — K1
    # floods, K4 vanishes
    def spread(ws_base, kind, n, off):
        return [(T + ws_base + off + 7 * i, kind) for i in range(n)]

    b1 = (
        spread(0, "K1", 4, 0) + spread(0, "K2", 4, 100) + spread(0, "K3", 4, 200)
        + spread(0, "K4", 4, 300)
        + spread(600, "K1", 5, 0) + spread(600, "K2", 3, 100)
        + spread(600, "K3", 3, 200) + spread(600, "K4", 4, 300)
        + spread(1200, "K1", 14, 0) + spread(1200, "K2", 1, 100)
        + spread(1200, "K3", 1, 200)
    )
    run(mk(b1, 1))
    # batch 2: one late K2 into still-open window B, one K3 into C
    run(mk([(T + 600 + 150, "K2"), (T + 1200 + 250, "K3")], 2))
    run(mk([(T + 32400, "Z_SENTINEL")], 3))  # closes every real window

    res = spark.read.parquet(out).filter(F.col("rule_id") != "Z_SENTINEL")
    counts = res.select(
        F.col("window_start").cast("long").alias("ws"),
        F.col("rule_id").alias("kind"),
        F.col("n_violations").alias("n"),
    )
    grid = counts.select("ws").distinct().crossJoin(
        counts.select("kind").distinct()
    )
    dense = grid.join(counts, ["ws", "kind"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    wtot = Window.partitionBy("ws")
    dense = dense.withColumn("t", F.sum("n").over(wtot))
    gl = dense.groupBy("kind").agg(F.sum("n").alias("gn"))
    gt = dense.agg(F.sum("n").alias("g"))
    j = dense.join(F.broadcast(gl), "kind").crossJoin(F.broadcast(gt))
    pk = F.col("n").cast("double") / F.col("t") + F.lit(_D_EPS)
    qk = F.col("gn").cast("double") / F.col("g") + F.lit(_D_EPS)
    return (
        j.select(
            "ws",
            "n",
            ((pk - qk) * F.log(pk / qk)).alias("_psi_t"),
            (pk * F.log(pk / qk)).alias("_kl_t"),
        )
        .groupBy("ws")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("_psi_t"), 6).alias("psi"),
            F.round(F.sum("_kl_t"), 6).alias("kl"),
        )
        .select(
            F.col("ws").alias("window_start_s"),
            (F.col("ws") + F.lit(_WIN_S)).alias("window_end_s"),
            "n_events",
            "psi",
            "kl",
        )
    )


# ---------------------------------------------------------------------------
# Streaming grouped-suite state: batch equivalence oracled (X222)
# ---------------------------------------------------------------------------

_SUITE_SQL_STREAM = f"""WITH inp AS (
  SELECT g, lang, val FROM read_parquet('{_W}/suite_src/*.parquet')
),
per AS (
  SELECT g, count(*) AS n, count(lang) AS c_nonnull,
         count(val) AS c_value, sum(val) AS s_value,
         min(val) AS mn, max(val) AS mx
  FROM inp GROUP BY g
)
SELECT g, n, c_nonnull, c_value, s_value, mn, mx,
       round(CAST(n - c_nonnull AS DOUBLE) / greatest(n, 1), 6) AS null_rate,
       round(CAST(s_value AS DOUBLE) / greatest(c_value, 1), 6) AS mean_val,
       round(CAST(n - c_nonnull AS DOUBLE) / greatest(n, 1), 6) > 0.5 AS null_rate_bad,
       n < 30 AS count_bad
FROM per"""


@register("streaming_suite_state", _SUITE_SQL_STREAM)
def streaming_suite_state(spark, sf_dir):
    """Streaming grouped-suite state, batch-equivalence oracled (X222):
    three availableNow micro-runs fold per-group monoid partials
    (n, null count, sum, min, max) into parquet state with the
    idempotent last-committed-batch guard; the suite verdicts derived
    from the FINAL STATE must equal DuckDB's batch aggregation over
    the union of every delivered batch — the X14/X148 discipline, now
    for the release gate itself. The planted 'src3' source delivers
    NULL lang in every batch and must cross the null-rate bound from
    state alone; a late small source must trip the row-count floor.
    Mergeable kinds only (exact percentiles don't fold — they stay in
    the batch suite X193/X219 by design, documented)."""
    from zparse_spark.streaming.validate_stream import suite_stream

    src = f"{_W}/suite_src"
    state = f"{_W}/suite_state"
    ckpt = f"{_W}/suite_ckpt"
    for p in (src, state, ckpt, state + "._staging"):
        shutil.rmtree(p, ignore_errors=True)

    def batch(lo: int, hi: int, tag: str):
        g = F.concat(F.lit("src"), (F.col("id") % 10).cast("string"))
        return spark.range(lo, hi).select(
            g.alias("g"),
            F.when(g == "src3", F.lit(None).cast("string"))
            .otherwise(F.lit("en"))
            .alias("lang"),
            (F.col("id") % 97).cast("double").alias("val"),
        )

    schema = "g string, lang string, val double"

    def run(df):
        df.write.mode("append").parquet(src)
        q = suite_stream(
            spark.readStream.schema(schema).parquet(src),
            "g", "val", "lang", state, checkpoint=ckpt,
        )
        q.awaitTermination(120)

    run(batch(0, 120, "b1"))
    run(batch(120, 260, "b2"))
    # batch 3 includes a tiny new source (id 1000..1004 -> src0..4 only
    # partially) plus regular traffic
    run(batch(260, 300, "b3"))
    st = spark.read.parquet(state).drop("_last_batch")
    null_rate = F.round(
        (F.col("n") - F.col("c_nonnull")).cast("double")
        / F.greatest(F.col("n"), F.lit(1)),
        6,
    )
    mean_val = F.round(
        F.col("s_value").cast("double") / F.greatest(F.col("c_value"), F.lit(1)), 6
    )
    return st.select(
        "g", "n", "c_nonnull", "c_value", "s_value", "mn", "mx",
        null_rate.alias("null_rate"),
        mean_val.alias("mean_val"),
        (null_rate > 0.5).alias("null_rate_bad"),
        (F.col("n") < 30).alias("count_bad"),
    )
