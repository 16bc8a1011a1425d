"""Scale-tier evidence for the later session-8 operator family:
context-window chunking, OOV-rate audit, Markov transition drift,
hash-Poisson bootstrap SE, order-statistic median CI, the expectation
suite, and the Lorenz curve at 1x vs 10x replicated tiers.

Same replication protocol as scale_tier_session8_r05.py: ids re-keyed
into disjoint universes (orders.o_custkey and customer.c_custkey shift
together so joins stay within-replica), document text salted per
replica so token-level ops grow honest vocabularies.

The claim: each op's wall at 10x rows is the scan's growth — chunking
is map-only + output explode; OOV is two token passes + a broadcast
vocab; Markov is one lead() window per user (user count grows, per-user
rows don't); bootstrap is an 8-way fan over one scan; median CI and
Lorenz pay one sort-within-group window (the exact-percentile price);
the suite is one agg pass per table.

Prints one JSON line; committed as scripts/scale_tier_session8b_r05.json.
Run on a QUIET box."""

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

    import zparse_spark.queries as q
    from zparse_spark.session import get_spark

    spark = get_spark(app_name="scale_tier_session8b")
    docs0 = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    o0 = spark.read.parquet(f"{args.sf_dir}/orders.parquet")
    c0 = spark.read.parquet(f"{args.sf_dir}/customer.parquet")
    ev0 = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    li0 = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")

    def timed(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)

    def mk_tier(tag: str, f: int) -> dict:
        base = f"/tmp/scale_tier_session8b_{tag}"
        reps = spark.range(f).select(F.col("id").alias("_rep"))
        d = docs0.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), F.lit(" "),
                F.concat(F.lit(" q"), F.col("_rep").cast("string"), F.lit(" ")),
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        d.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/documents.parquet"
        )
        o = o0.crossJoin(F.broadcast(reps)).select(
            (F.col("o_orderkey") + F.col("_rep") * 100_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_rep") * 10_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
        o.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/orders.parquet"
        )
        c = c0.crossJoin(F.broadcast(reps)).select(
            (F.col("c_custkey") + F.col("_rep") * 10_000_000).alias("c_custkey"),
            "c_mktsegment", "c_nationkey", "c_acctbal",
        )
        c.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/customer.parquet"
        )
        e = ev0.crossJoin(F.broadcast(reps)).select(
            (F.col("event_id") + F.col("_rep") * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_rep") * 10_000_000).alias("user_id"),
            "event_type", "value",
        )
        e.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/events.parquet"
        )
        li = li0.crossJoin(F.broadcast(reps)).select(
            "l_orderkey", "l_linenumber", "l_quantity"
        )
        li.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/lineitem.parquet"
        )

        sizes = {
            "n_docs": spark.read.parquet(f"{base}/documents.parquet").count(),
            "n_orders": spark.read.parquet(f"{base}/orders.parquet").count(),
            "n_events": spark.read.parquet(f"{base}/events.parquet").count(),
        }
        from zparse_spark.operators.filtering import chunk_documents

        jobs = {}
        # the registered query slices doc_id < 300 for its bounded
        # oracle; the tier measurement runs the OPERATOR on the full
        # corpus so the wall reflects row-scale work
        jobs["chunk_documents"] = timed(
            lambda: chunk_documents(
                spark.read.parquet(f"{base}/documents.parquet"), max_tokens=16
            ).count()
        )
        jobs["oov_rate"] = timed(lambda: q.corpus_oov_rate(spark, base).count())
        jobs["markov_drift"] = timed(
            lambda: q.drift_markov_transitions(spark, base).count()
        )
        jobs["bootstrap_se"] = timed(lambda: q.stats_bootstrap_se(spark, base).count())
        jobs["median_ci"] = timed(lambda: q.quantiles_median_ci(spark, base).count())
        jobs["expectation_suite"] = timed(
            lambda: q.contract_expectation_suite(spark, base).count()
        )
        jobs["lorenz_curve"] = timed(
            lambda: q.profile_lorenz_customer_revenue(spark, base).count()
        )
        return {"sizes": sizes, "jobs": jobs}

    lo = mk_tier("lo", args.base_factor)
    hi = mk_tier("hi", args.base_factor * args.factor)
    out = {
        "metric": "scale_tier_session8b_lo_vs_hi",
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
    with open(os.path.join(here, "scale_tier_session8b_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
