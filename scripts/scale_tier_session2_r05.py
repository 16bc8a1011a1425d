"""Scale-tier evidence for the fresh-session operator family: Bloom
probe-side pruning (bitmap build + prune + anti-join), weighted WOR
sampling, equi-depth binning, length histograms, value-pattern
profiling at 1x vs 10x replicated corpus.

Replication re-keys documents into disjoint id universes (doc_id
shifted per rep) and grows the ref domain AND the catalog with the
tier, so per-key structure is constant and "wall grows ~10x" is the
linear yardstick. The Bloom bitmap is sized at ~10 bits/key per tier
(the real deployment rule), so the FP rate — and therefore the prune
selectivity — is tier-invariant; a saturated fixed-size bitmap would
fake sublinearity by keeping everything.

Prints one JSON line; committed as scripts/scale_tier_session2_r05.json.
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base-factor", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zparse_spark.operators.filtering import weighted_sample_wor
    from zparse_spark.operators.rules import bloom_bitmap, bloom_prune
    from zparse_spark.operators.stats import (
        equidepth_bins,
        length_histogram,
        pattern_profile,
    )
    from zparse_spark.session import get_spark

    spark = get_spark(app_name="scale_tier_session2")
    docs0 = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    def timed(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)

    def mk_tier(tag, f):
        reps = spark.range(f).select(F.col("id").alias("_rep"))
        d = (
            docs0.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
        base = f"/tmp/scale_tier_session2_{tag}"
        d.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/docs")
        docs = spark.read.parquet(f"{base}/docs")
        n_docs = docs.count()
        k_refs = max(1, n_docs // 6)  # ref domain grows with the tier
        # 99% of refs hit the catalog ('m' namespace), 1% dangle ('x')
        refs = docs.select(
            F.when(
                F.pmod(F.col("doc_id"), 100) < 99,
                F.concat(F.lit("m"), F.pmod(F.col("doc_id"), k_refs)),
            )
            .otherwise(F.concat(F.lit("x"), F.col("doc_id")))
            .alias("media_ref")
        )
        cat = spark.range(6 * k_refs).select(
            F.concat(F.lit("m"), F.col("id")).alias("media_ref")
        )
        # ~10 bits/key, power-of-two words — the deployment sizing rule
        n_words = 1 << max(6, (k_refs * 10 // 64).bit_length())
        return docs, refs, cat, n_words, n_docs

    out: dict = {
        "metric": "scale_tier_session2_lo_vs_hi",
        "growth_ratio": args.factor,
        "base_factor": args.base_factor,
        "sf_dir": args.sf_dir,
        "runs_per_point": args.runs,
    }
    tiers = {}
    for tag, f in (("1x", args.base_factor), ("10x", args.base_factor * args.factor)):
        docs, refs, cat, n_words, n_docs = mk_tier(tag, f)

        def bloom_job():
            bm = bloom_bitmap(refs.select("media_ref").distinct(), "media_ref",
                              n_words=n_words, n_hashes=5)
            pruned = bloom_prune(cat, "media_ref", bm, n_words=n_words, n_hashes=5)
            return (
                refs.select("media_ref").distinct()
                .join(pruned, "media_ref", "left_anti").count()
            )

        jobs = {
            "bloom_referential": bloom_job,
            "weighted_wor": lambda: weighted_sample_wor(
                docs, 1000, "n_chars", strata_col="lang"
            ).count(),
            "equidepth_bins": lambda: equidepth_bins(
                docs, "n_chars", n_bins=10, group_cols=["lang"]
            ).count(),
            "length_histogram": lambda: length_histogram(
                docs, ["text", "lang", "source"]
            ).count(),
            "pattern_profile": lambda: pattern_profile(
                docs, ["lang", "source", "text"]
            ).count(),
        }
        tiers[tag] = {"n_docs": n_docs, "n_words": n_words, "jobs": {}}
        for name, fn in jobs.items():
            tiers[tag]["jobs"][name] = timed(fn)

    for name in tiers["1x"]["jobs"]:
        lo, hi = tiers["1x"]["jobs"][name], tiers["10x"]["jobs"][name]
        out[name] = {
            "sec_1x": lo,
            "sec_10x": hi,
            "wall_growth": round(hi / lo, 3) if lo else None,
            "of_linear": round(hi / (lo * args.factor), 3) if lo else None,
        }
    out["tiers"] = tiers
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
