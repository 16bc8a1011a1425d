"""Scale-tier evidence for the session-6 operator family: Theil–Sen
pairwise-median trend, lag-k autocorrelation, Mahalanobis outlier
screen, char-bigram LM scoring, median-imputation audit, snapshot-
expiry GC plan, and the zone-map overlap-depth audit at 1x vs 10x
replicated tiers.

Replication re-keys ids into disjoint universes; document text is
salted per replica (a per-replica token between words) so the bigram
model grows honestly instead of collapsing to one replica's model.
The grid-bounded ops (Theil–Sen, ACF — quadratic on the DAILY table)
must show wall growth ≈ the SCAN's growth, not the quadratic term:
replication scales counts per day, not the day range, which is
exactly the 100 TB claim (bounded-state ops pay only the scan).

Prints one JSON line; committed as scripts/scale_tier_session6_r05.json.
Run on a QUIET box (no concurrent Spark)."""

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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base-factor", type=int, default=4)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zparse_spark.functions.text import char_bigram_logprob_scores
    from zparse_spark.operators.layout import expire_snapshots_plan, zone_overlap_depth
    from zparse_spark.operators.stats import (
        impute_group_median,
        mahalanobis_outliers,
        theil_sen_trend,
        volume_acf,
    )
    from zparse_spark.session import get_spark

    spark = get_spark(app_name="scale_tier_session6")
    docs0 = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    li0 = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    o0 = spark.read.parquet(f"{args.sf_dir}/orders.parquet")
    ev0 = spark.read.parquet(f"{args.sf_dir}/events.parquet")

    def timed(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)

    def mk_tier(tag: str, f: int) -> dict:
        base = f"/tmp/scale_tier_session6_{tag}"
        reps = spark.range(f).select(F.col("id").alias("_rep"))
        d = docs0.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(" "),
                F.concat(F.lit(" q"), F.col("_rep").cast("string"), F.lit(" ")),
            ).alias("text"),
        )
        d.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/docs")
        li = li0.crossJoin(F.broadcast(reps)).select(
            (F.col("l_orderkey") + F.col("_rep") * 100_000_000).alias("l_orderkey"),
            "l_quantity", "l_extendedprice", "l_returnflag",
        )
        li.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/li")
        o = o0.crossJoin(F.broadcast(reps)).select(
            (F.col("o_orderkey") + F.col("_rep") * 100_000_000).alias("o_orderkey"),
        )
        o.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/orders")
        e = ev0.crossJoin(F.broadcast(reps)).select(
            "ts", "event_type",
            (F.col("value") + F.col("_rep")).alias("value"),
        )
        e.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/events")

        docs = spark.read.parquet(f"{base}/docs")
        lin = spark.read.parquet(f"{base}/li")
        ords = spark.read.parquet(f"{base}/orders")
        evs = spark.read.parquet(f"{base}/events")
        sizes = {
            "n_docs": docs.count(),
            "n_lineitem": lin.count(),
            "n_orders": ords.count(),
            "n_events": evs.count(),
        }

        jobs = {}
        jobs["theil_sen_trend"] = timed(lambda: theil_sen_trend(evs).count())
        jobs["volume_acf"] = timed(lambda: volume_acf(evs, lags=(1, 7)).count())
        jobs["mahalanobis_outliers"] = timed(
            lambda: mahalanobis_outliers(
                lin, "l_quantity", "l_extendedprice", "l_returnflag"
            ).count()
        )
        jobs["char_bigram_lm"] = timed(
            lambda: char_bigram_logprob_scores(docs).count()
        )
        jobs["impute_group_median"] = timed(
            lambda: impute_group_median(evs, "value", "event_type").count()
        )

        n_files = 200 * f  # manifest grows linearly with the tier

        def _expire():
            files = (
                ords.groupBy((F.col("o_orderkey") % n_files).alias("file_id"))
                .agg((F.count(F.lit(1)) * 512).alias("bytes"))
                .select(
                    "file_id", "bytes",
                    (F.col("file_id") % 8).alias("add_s"),
                    (F.lit(1) + F.col("file_id") % 5).alias("life"),
                )
            )
            refs = files.select(
                "file_id", "bytes",
                F.explode(
                    F.sequence(F.col("add_s"), F.least(F.col("add_s") + F.col("life"), F.lit(9)))
                ).alias("snapshot_id"),
            )
            expire_snapshots_plan(refs, cutoff_snapshot=5).count()

        jobs["expire_snapshots_plan"] = timed(_expire)

        def _depth():
            liq = lin.select("l_orderkey", F.col("l_extendedprice").alias("p"))
            zm = (
                liq.select(
                    F.lit("hash").alias("layout"),
                    (F.col("l_orderkey") % 256).alias("file_id"),
                    "p",
                )
                .groupBy("layout", "file_id")
                .agg(F.min("p").alias("mn"), F.max("p").alias("mx"), F.count("p").alias("n_rows"))
            )
            zone_overlap_depth(zm, layout_col="layout").count()

        jobs["zone_overlap_depth"] = timed(_depth)
        return {"sizes": sizes, "jobs": jobs}

    lo = mk_tier("lo", args.base_factor)
    hi = mk_tier("hi", args.base_factor * args.factor)
    out = {
        "metric": "scale_tier_session6_lo_vs_hi",
        "growth_ratio": args.factor,
        "base_factor": args.base_factor,
        "sf_dir": args.sf_dir,
        "runs_per_point": args.runs,
        "tiers": {"1x": lo["sizes"], "10x": hi["sizes"]},
    }
    for job in lo["jobs"]:
        s1, s10 = lo["jobs"][job], hi["jobs"][job]
        out[job] = {
            "sec_1x": s1,
            "sec_10x": s10,
            "wall_growth": round(s10 / max(s1, 1e-9), 3),
        }
    print(json.dumps(out))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "scale_tier_session6_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
