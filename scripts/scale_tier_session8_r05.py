"""Scale-tier evidence for the session-8 operator family: Heaps'-law
vocabulary growth, Simpson's-paradox audit, magnitude/unit audit,
Mann-Whitney rank drift, source-influence jackknife, and the embedding
dimension profile at 1x vs 10x replicated tiers.

Replication re-keys ids into disjoint universes and salts document
text per replica (a per-replica token between words) so the vocabulary
grows honestly — a Heaps curve over ten identical replicas would be a
rigged benchmark (V flat, only T growing). Orders/lineitem keep their
value distributions; keys shift by replica so planted mod-k groups
stay proportionate.

The claim being evidenced: every op's wall cost at 10x the rows is the
SCAN's growth, not a superlinear term — the group tables (sources,
priorities, dims, bins, fractions) are all bounded, so only the
map-side pass over the data can grow.

Prints one JSON line; committed as scripts/scale_tier_session8_r05.json.
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

    import zparse_spark.queries as q
    from zparse_spark.session import get_spark

    spark = get_spark(app_name="scale_tier_session8")
    docs0 = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    li0 = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    o0 = spark.read.parquet(f"{args.sf_dir}/orders.parquet")
    em0 = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")

    def timed(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)

    def mk_tier(tag: str, f: int) -> dict:
        base = f"/tmp/scale_tier_session8_{tag}"
        reps = spark.range(f).select(F.col("id").alias("_rep"))
        d = docs0.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(" "),
                F.concat(F.lit(" q"), F.col("_rep").cast("string"), F.lit(" ")),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        d.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/documents.parquet"
        )
        li = li0.crossJoin(F.broadcast(reps)).select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        )
        li.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/lineitem.parquet"
        )
        o = o0.crossJoin(F.broadcast(reps)).select(
            (F.col("o_orderkey") + F.col("_rep") * 100_000_000).alias("o_orderkey"),
            "o_orderpriority",
            "o_totalprice",
        )
        o.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/orders.parquet"
        )
        em = em0.crossJoin(F.broadcast(reps)).select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        em.repartition(max(8, f)).write.mode("overwrite").parquet(
            f"{base}/embeddings.parquet"
        )

        sizes = {
            "n_docs": spark.read.parquet(f"{base}/documents.parquet").count(),
            "n_lineitem": spark.read.parquet(f"{base}/lineitem.parquet").count(),
            "n_orders": spark.read.parquet(f"{base}/orders.parquet").count(),
            "n_embeddings": spark.read.parquet(f"{base}/embeddings.parquet").count(),
        }

        jobs = {}
        jobs["heaps_curve"] = timed(lambda: q.corpus_heaps_curve(spark, base).count())
        jobs["simpson_audit"] = timed(
            lambda: q.stats_simpson_lineitem(spark, base).count()
        )
        jobs["magnitude_profile"] = timed(
            lambda: q.audit_magnitude_orders(spark, base).count()
        )
        jobs["mwu_drift"] = timed(lambda: q.drift_mwu_totalprice(spark, base).count())
        jobs["source_influence"] = timed(
            lambda: q.audit_source_influence(spark, base).count()
        )
        jobs["embedding_dim_profile"] = timed(
            lambda: q.embedding_dim_profile(spark, base).count()
        )
        return {"sizes": sizes, "jobs": jobs}

    lo = mk_tier("lo", args.base_factor)
    hi = mk_tier("hi", args.base_factor * args.factor)
    out = {
        "metric": "scale_tier_session8_lo_vs_hi",
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
    with open(os.path.join(here, "scale_tier_session8_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
