"""Scale-tier evidence for the session-5 operator family: winnowing
near-dup pairs (xxhash64 production path), Jaro-Winkler linkage over
deletion-neighborhood candidates, PageRank power iteration, zone-map
skipping audit, chi-squared independence, Kaplan-Meier survival, and
the compaction bin planner at 1x vs 10x replicated tiers.

Replication re-keys every table into disjoint id universes; CONTENT is
salted per replica where content drives joins (winnowing texts get a
per-replica token between words so fingerprint buckets never collide
across replicas; customer names get a doubled replica suffix so
cross-replica name pairs sit at edit distance >= 2) — per-replica
structure is constant, so "wall grows ~10x" is the honest linear
yardstick and pair/candidate growth cannot be quadratic tier noise.

Deployment rules applied: PageRank runs a fixed 3 iterations (the
operator contract is a fixed power-step count); everything else is
parameter-identical across tiers.

Prints one JSON line; committed as scripts/scale_tier_session5_r05.json.
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

    from zparse_spark.operators.dedup import winnowing_pairs
    from zparse_spark.operators.editdist import jaro_winkler_join
    from zparse_spark.operators.funnel import survival_curve
    from zparse_spark.operators.graph import pagerank
    from zparse_spark.operators.layout import compaction_bins, skipping_audit
    from zparse_spark.operators.stats import chi2_independence
    from zparse_spark.session import get_spark

    spark = get_spark(app_name="scale_tier_session5")
    docs0 = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    cust0 = spark.read.parquet(f"{args.sf_dir}/customer.parquet")
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
        base = f"/tmp/scale_tier_session5_{tag}"
        reps = spark.range(f).select(F.col("id").alias("_rep"))
        # winnowing corpus: per-replica token between words kills
        # cross-replica fingerprint collisions, preserves intra-replica dups
        d = docs0.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(" "),
                F.concat(F.lit(" q"), F.col("_rep").cast("string"), F.lit(" ")),
            ).alias("text"),
            "source",
            "n_chars",
        )
        d.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/docs")
        c = cust0.crossJoin(F.broadcast(reps)).select(
            (F.col("c_custkey") + F.col("_rep") * 10_000_000).alias("c_custkey"),
            F.concat(
                F.col("c_name"),
                F.lit("q"), F.col("_rep").cast("string"),
                F.lit("q"), F.col("_rep").cast("string"),
            ).alias("c_name"),
        )
        c.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/cust")
        li = li0.crossJoin(F.broadcast(reps)).select(
            (F.col("l_orderkey") + F.col("_rep") * 100_000_000).alias("l_orderkey"),
            (F.col("l_suppkey") + F.col("_rep") * 1_000_000).alias("l_suppkey"),
            "l_extendedprice",
        )
        li.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/li")
        o = o0.crossJoin(F.broadcast(reps)).select(
            (F.col("o_orderkey") + F.col("_rep") * 100_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_rep") * 10_000_000).alias("o_custkey"),
            "o_orderpriority",
            "o_orderstatus",
        )
        o.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/orders")
        e = ev0.crossJoin(F.broadcast(reps)).select(
            (F.col("user_id") + F.col("_rep") * 10_000_000).alias("user_id"), "ts"
        )
        e.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/events")

        docs = spark.read.parquet(f"{base}/docs")
        cust = spark.read.parquet(f"{base}/cust")
        lin = spark.read.parquet(f"{base}/li")
        ords = spark.read.parquet(f"{base}/orders")
        evs = spark.read.parquet(f"{base}/events")
        sizes = {
            "n_docs": docs.count(),
            "n_cust": cust.count(),
            "n_lineitem": lin.count(),
            "n_orders": ords.count(),
            "n_events": evs.count(),
        }

        jobs = {}
        # production config: stop-fingerprint cap at 64 docs (the X3
        # hot-bucket discipline) — the shared-vocabulary corpus makes
        # some fingerprints near-ubiquitous, and an uncapped bucket of
        # the whole tier is quadratic BY DEFINITION, not a plan defect
        jobs["winnowing_pairs_xxh"] = timed(
            lambda: winnowing_pairs(
                docs.select("doc_id", "text"),
                threshold=0.5,
                hash_fn="xxhash64",
                max_df=64,
            ).count()
        )
        jobs["jaro_winkler_join"] = timed(
            lambda: jaro_winkler_join(
                cust, id_col="c_custkey", key_col="c_name", k_block=1, threshold=0.9
            ).count()
        )

        def _pr():
            e0 = (
                ords.join(lin, ords["o_orderkey"] == lin["l_orderkey"])
                .groupBy(
                    F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
                    F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
                )
                .agg(F.count(F.lit(1)).cast("double").alias("weight"))
            )
            edges = e0.unionByName(
                e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
            )
            pagerank(edges, iterations=3).count()

        jobs["pagerank_3it"] = timed(_pr)

        def _skip():
            liq = lin.select("l_orderkey", F.col("l_extendedprice").alias("p"))
            zm = (
                liq.select(F.lit("hash").alias("layout"), (F.col("l_orderkey") % 256).alias("file_id"), "p")
                .groupBy("layout", "file_id")
                .agg(F.min("p").alias("mn"), F.max("p").alias("mx"), F.count("p").alias("n_rows"))
            )
            probes = liq.filter(F.col("l_orderkey") % 9973 == 0).select("p").distinct()
            skipping_audit(zm, probes, layout_col="layout").collect()

        jobs["skipping_audit"] = timed(_skip)
        jobs["chi2_independence"] = timed(
            lambda: chi2_independence(ords, "o_orderpriority", "o_orderstatus").collect()
        )
        jobs["survival_km"] = timed(lambda: survival_curve(evs, censor_days=1).collect())
        jobs["compaction_bins"] = timed(
            lambda: compaction_bins(
                docs.groupBy(
                    F.col("source").alias("partition"),
                    (F.col("doc_id") % 97).alias("file_id"),
                ).agg(F.sum("n_chars").alias("bytes")),
                target_bytes=25_000,
            ).count()
        )
        return {"sizes": sizes, "jobs": jobs}

    lo = mk_tier("lo", args.base_factor)
    hi = mk_tier("hi", args.base_factor * args.factor)
    out = {
        "metric": "scale_tier_session5_lo_vs_hi",
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
            "of_linear": round((s10 / max(s1, 1e-9)) / args.factor, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
