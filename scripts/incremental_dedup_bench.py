"""Measured evidence for incremental dedup (X67): admitting a fixed-size
delta against a growing corpus must cost ~one corpus scan — and beat the
batch dedup of corpus ∪ delta that re-pairs the corpus every ingest.

Protocol: corpus at 1x (100k docs) and 10x (1M docs) via the interleave
re-key trick (disjoint ids, duplicate structure preserved); delta fixed
at 5k docs (half fresh, half copies of corpus docs). Measures median-of-
--runs wall for (a) incremental exact admission, (b) batch
exact_duplicates over corpus ∪ delta, (c) incremental minhash probe
against a pre-materialized band index (built once, build time reported
separately), at both tiers. Prints ONE JSON line; committed as
scripts/incremental_dedup_r{N}.json. Run on a QUIET box.
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import (
        exact_duplicates,
        incremental_exact_dedup,
        incremental_minhash_candidates,
        minhash_banded,
    )
    from zparse_spark.session import get_spark

    spark = get_spark(
        app_name="incremental_dedup_bench", master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    n_base = base.count()
    w = "/root/repo/spark-warehouse/incbench"

    def build_corpus(factor: int, path: str):
        # interleave re-key: replica token inside every text keeps shingle
        # sets disjoint across replicas (the scale_tier protocol)
        rep = (
            spark.range(factor)
            .crossJoin(base)
            .select(
                F.concat_ws("_", F.col("id").cast("string"), "doc_id").alias("doc_id"),
                F.concat_ws(" ", F.concat(F.lit("rep"), F.col("id").cast("string")), "text")
                .alias("text"),
            )
        )
        rep.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def timed(fn):
        walls = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return statistics.median(walls), walls

    out = {"runs": args.runs, "delta_docs": None, "tiers": {}}
    kw = dict(n_hashes=32, n_bands=8, seed=7)
    for factor, tier in ((20, "1x"), (200, "10x")):
        corpus = build_corpus(factor, f"{w}/corpus_{tier}")
        n = corpus.count()
        # delta: 2.5k fresh + 2.5k exact copies of corpus docs
        delta = (
            base.limit(2500)
            .select(F.concat(F.lit("new_"), "doc_id").alias("doc_id"),
                    F.concat(F.lit("fresh "), "text").alias("text"))
            .unionByName(
                corpus.limit(2500).select(
                    F.concat(F.lit("copy_"), "doc_id").alias("doc_id"), "text"
                )
            )
        )
        delta.write.mode("overwrite").parquet(f"{w}/delta_{tier}")
        delta = spark.read.parquet(f"{w}/delta_{tier}")
        nd = delta.count()
        out["delta_docs"] = nd

        inc_med, inc_all = timed(
            lambda: incremental_exact_dedup(corpus, delta)
            .groupBy("status").count().collect()
        )
        batch_med, batch_all = timed(
            lambda: exact_duplicates(corpus.unionByName(delta)).count()
        )
        t0 = time.perf_counter()
        minhash_banded(corpus, **kw).write.mode("overwrite").parquet(f"{w}/index_{tier}")
        index_build = round(time.perf_counter() - t0, 3)
        index = spark.read.parquet(f"{w}/index_{tier}")
        probe_med, probe_all = timed(
            lambda: incremental_minhash_candidates(index, delta, **kw).count()
        )
        out["tiers"][tier] = {
            "corpus_docs": n,
            "incremental_exact_sec_median": inc_med,
            "incremental_exact_sec_all": inc_all,
            "batch_union_exact_sec_median": batch_med,
            "batch_union_exact_sec_all": batch_all,
            "batch_over_incremental": round(batch_med / inc_med, 3) if inc_med else None,
            "minhash_index_build_sec_once": index_build,
            "minhash_probe_sec_median": probe_med,
            "minhash_probe_sec_all": probe_all,
        }
    t1, t10 = out["tiers"]["1x"], out["tiers"]["10x"]
    out["incremental_exact_wall_growth_vs_linear"] = round(
        (t10["incremental_exact_sec_median"] / t1["incremental_exact_sec_median"]) / 10, 3
    )
    out["minhash_probe_wall_growth_vs_linear"] = round(
        (t10["minhash_probe_sec_median"] / t1["minhash_probe_sec_median"]) / 10, 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
