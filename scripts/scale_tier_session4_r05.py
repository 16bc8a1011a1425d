"""Scale-tier evidence for the session-4 operator family: binned
Wasserstein (EMD) drift, Count-Min sketch build+probe, hash-ring
negative sampling, embedding centroid drift, JSON-path schema rules,
and the mixed-script audit at 1x vs 10x replicated corpus.

Replication re-keys every table into disjoint id universes (ids
shifted per replica) so per-key/per-group structure is constant and
"wall grows ~10x" is the linear yardstick. Deployment-rule scaling is
applied where the operator has one: the negative-sampling arc count
grows with the tier (constant expected arc population — the documented
100 TB rule), and the CMS width is fixed (its state is cardinality-
independent BY DESIGN, so a fixed grid at 10x data is the honest
measurement, not a cheat).

Prints one JSON line; committed as scripts/scale_tier_session4_r05.json.
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
    ap.add_argument("--base-factor", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zparse_spark.functions.json_profile import json_schema_violations
    from zparse_spark.functions.text import mixed_script_audit
    from zparse_spark.operators.filtering import sample_negatives
    from zparse_spark.operators.similarity import centroid_drift
    from zparse_spark.operators.stats import (
        cms_estimate,
        cms_sketch,
        wasserstein_drift_scores,
    )
    from zparse_spark.session import get_spark

    spark = get_spark(app_name="scale_tier_session4")
    docs0 = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    ev0 = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    emb0 = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")

    def timed(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)

    def mk_tier(tag: str, f: int) -> dict:
        reps = spark.range(f).select(F.col("id").alias("_rep"))
        base = f"/tmp/scale_tier_session4_{tag}"
        d = docs0.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id").cast("long") + F.col("_rep") * 10_000_000)
            .cast("string")
            .alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        d.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/docs")
        e = ev0.crossJoin(F.broadcast(reps)).select(
            (F.col("event_id") + F.col("_rep") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("_rep") * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        e.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/events")
        m = emb0.crossJoin(F.broadcast(reps)).select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        m.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/emb")
        docs = spark.read.parquet(f"{base}/docs")
        ev = spark.read.parquet(f"{base}/events")
        emb = spark.read.parquet(f"{base}/emb")
        n_docs = docs.count()
        n_events = ev.count()
        n_vecs = emb.count()

        jobs = {}
        jobs["emd_drift"] = timed(
            lambda: wasserstein_drift_scores(
                docs, "n_chars", "source", lo=0.0, hi=8192.0, n_bins=32
            ).collect()
        )
        W, D = 1024, 4
        jobs["cms_build_probe"] = timed(
            lambda: cms_estimate(
                cms_sketch(ev, "user_id", width=W, depth=D),
                ev,
                "user_id",
                width=W,
                depth=D,
            ).count()
        )
        # deployment rule: arcs grow with the tier -> constant arc size
        nb = max(16, n_docs // 2000)
        jobs["sample_negatives"] = timed(
            lambda: sample_negatives(docs, "doc_id", k=3, seed=5, n_buckets=nb).count()
        )
        jobs["centroid_drift"] = timed(
            lambda: centroid_drift(emb, "embedding", "label").collect()
        )
        jobs["json_schema_rules"] = timed(
            lambda: json_schema_violations(
                ev.withColumn(
                    "props",
                    F.when(F.col("event_id") % 13 == 0, F.lit('{"k": "str"}'))
                    .when(F.col("event_id") % 17 == 0, F.lit('{"x": 1}'))
                    .otherwise(F.col("props")),
                ),
                "props",
                {"$.k": "int"},
                id_cols=["event_id"],
            ).count()
        )
        jobs["mixed_script_audit"] = timed(
            lambda: mixed_script_audit(docs, "text", "source", "doc_id").collect()
        )
        return {
            "n_docs": n_docs,
            "n_events": n_events,
            "n_vecs": n_vecs,
            "n_neg_buckets": nb,
            "jobs": jobs,
        }

    lo = mk_tier("1x", args.base_factor)
    hi = mk_tier("10x", args.base_factor * args.factor)
    out = {
        "metric": "scale_tier_session4_lo_vs_hi",
        "growth_ratio": args.factor,
        "base_factor": args.base_factor,
        "sf_dir": args.sf_dir,
        "runs_per_point": args.runs,
    }
    for k in lo["jobs"]:
        g = round(hi["jobs"][k] / lo["jobs"][k], 3) if lo["jobs"][k] else None
        out[k] = {
            "sec_1x": lo["jobs"][k],
            "sec_10x": hi["jobs"][k],
            "wall_growth": g,
            "of_linear": round(g / args.factor, 3) if g else None,
        }
    out["tiers"] = {"1x": lo, "10x": hi}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
