"""Scale-tier evidence for the round-5 event-analytics / monitoring
family: sessionization, funnel, active-users, daily anomalies, JSON
schema profiling at 1x vs 10x event volume.

Replication re-keys users into disjoint universes (user_id +
rep * 10^7): per-user history length stays constant and only the KEY
COUNT grows — exactly how a 10x-bigger real event table grows, and the
property that makes "wall grows ~10x" the linear yardstick. The day
range is left constant (daily counts grow 10x; the grids the windows
ride stay tiny — that invariance is itself the design claim).

Prints one JSON line; committed as scripts/scale_tier_events_r05.json.
Run on a QUIET box (no concurrent Spark).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base-factor", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zparse_spark.session import get_spark

    spark = get_spark(app_name="scale_tier_events")

    ev = spark.read.parquet(f"{args.sf_dir}/events.parquet")

    def replicate(factor):
        reps = spark.range(factor).select(F.col("id").alias("_rep"))
        return (
            ev.crossJoin(F.broadcast(reps))
            .withColumn("user_id", F.col("user_id") + F.col("_rep") * 10_000_000)
            .withColumn(
                "event_id", F.col("event_id") + F.col("_rep") * 1_000_000_000
            )
            .drop("_rep")
            .repartition(32)
        )

    def timed(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)

    out: dict = {
        "metric": "scale_tier_events_lo_vs_hi",
        "growth_ratio": args.factor,
        "base_factor": args.base_factor,
        "sf_dir": args.sf_dir,
        "runs_per_point": args.runs,
    }

    from zparse_spark.functions.json_profile import json_schema_profile
    from zparse_spark.operators.funnel import active_users, funnel_report
    from zparse_spark.operators.sessionize import sessionize
    from zparse_spark.operators.stats import timeseries_anomalies

    def mk_jobs(df):
        props = df.selectExpr(
            """CASE CAST(event_id % 7 AS INT)
                 WHEN 0 THEN '{"k": ' || CAST(event_id % 100 AS STRING)
                             || ', "tags": ["a"], "meta": {"lang": "en"}}'
                 WHEN 4 THEN '{bro'
                 WHEN 5 THEN NULL
                 ELSE props END AS props"""
        )
        return {
            "sessionize_rollup": lambda: sessionize(
                df, key="user_id", ts_col="ts", gap_us=6 * 3600 * 1_000_000
            )
            .groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.count(F.lit(1)), F.sum("n"))
            .collect(),
            "funnel_report": lambda: funnel_report(
                df, ["view", "click", "purchase"]
            ).collect(),
            "active_users": lambda: active_users(df, window_days=7).collect(),
            "daily_anomalies": lambda: timeseries_anomalies(df)
            .agg(F.count(F.lit(1)), F.sum(F.when(F.col("is_anomaly"), 1)))
            .collect(),
            "json_schema_profile": lambda: json_schema_profile(
                props, "props"
            ).collect(),
        }

    tiers = {}
    for tag, factor in (("1x", args.base_factor), ("10x", args.base_factor * args.factor)):
        df = replicate(factor)
        df.write.mode("overwrite").parquet(f"/tmp/scale_tier_events_{tag}")
        mat = spark.read.parquet(f"/tmp/scale_tier_events_{tag}")
        n = mat.count()
        tiers[tag] = {"n_events": n, "jobs": {}}
        for name, fn in mk_jobs(mat).items():
            tiers[tag]["jobs"][name] = timed(fn)

    for name in tiers["1x"]["jobs"]:
        lo, hi = tiers["1x"]["jobs"][name], tiers["10x"]["jobs"][name]
        out[name] = {
            "n_events_1x": tiers["1x"]["n_events"],
            "n_events_10x": tiers["10x"]["n_events"],
            "sec_1x": lo,
            "sec_10x": hi,
            "events_per_sec_1x": round(tiers["1x"]["n_events"] / lo, 1),
            "events_per_sec_10x": round(tiers["10x"]["n_events"] / hi, 1),
            "wall_growth_vs_10x_linear": round(hi / (lo * args.factor), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
