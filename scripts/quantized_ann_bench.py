"""Measured evidence for the int8-quantization bandwidth claim (X72/X73).

The ANN inner loop is memory-bandwidth-bound: scanning a corpus at
float32 reads 4x the bytes of the int8 grid. This measures the full-scan
stage (score every corpus vector for a 5-query batch, Arrow matmul path)
over a replicated embeddings corpus at float32 vs int8, plus the
two-stage quantized_topk wall including exact re-rank, and the recall of
the quantized ranking against the exact one. Median of --runs.

Prints one JSON line; committed as scripts/quantized_ann_r{N}.json and
quoted in SURVEY X72/X73. Run on a QUIET box.
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
    ap.add_argument("--factor", type=int, default=200,
                    help="corpus replication (sf0.1 embeddings = 5k rows -> 1M)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zparse_spark.operators.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
    )
    from zparse_spark.session import get_spark

    spark = get_spark(
        app_name="quantized_ann_bench", master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    base = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    corpus = (
        spark.range(args.factor)
        .crossJoin(base)
        .select((F.col("vec_id") + F.col("id") * n_base).alias("vec_id"), "embedding")
    )
    # materialize both representations to parquet so each scan measures
    # ONLY its own read+score path (not the replication plan)
    w = "/root/repo/spark-warehouse/qbench"
    corpus.write.mode("overwrite").parquet(f"{w}/float32")
    quantize_embeddings(corpus).select("vec_id", "q", "scale").write.mode(
        "overwrite"
    ).parquet(f"{w}/int8")
    cf = spark.read.parquet(f"{w}/float32")
    cq = spark.read.parquet(f"{w}/int8")
    n = cf.count()
    queries = base.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def timed(fn):
        walls = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return statistics.median(walls), walls

    # full-scan stage only: count() over the scored frame (no top-k window)
    def scan_float():
        brute_force_topk(cf, queries, k=5, impl="arrow").count()

    def scan_int8():
        # production path: stage 1 reads ONLY the materialized int8 index;
        # the float table is touched just for the 20-candidate re-rank
        quantized_topk(
            cf, queries, k=5, rerank=4, impl="arrow", corpus_q=cq
        ).count()

    # recall of quantized final top-5 vs exact top-5 (expr paths, 1 run)
    small = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    exact = {
        (r["query_id"], r["corpus_id"])
        for r in brute_force_topk(small, queries, k=5).collect()
    }
    quant = {
        (r["query_id"], r["corpus_id"])
        for r in quantized_topk(small, queries, k=5, rerank=4).collect()
    }
    recall = len(exact & quant) / max(len(exact), 1)

    f_med, f_all = timed(scan_float)
    q_med, q_all = timed(scan_int8)

    def dir_bytes(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    # byte ratio on the UNIQUE base table: the replicated corpus is 500
    # copies of 2000 vectors, which parquet dictionary/page compression
    # collapses on both sides — real corpora don't compress like that
    base.write.mode("overwrite").parquet(f"{w}/base_f32")
    quantize_embeddings(base).select("vec_id", "q", "scale").write.mode(
        "overwrite"
    ).parquet(f"{w}/base_i8")
    fb, qb = dir_bytes(f"{w}/base_f32"), dir_bytes(f"{w}/base_i8")
    out = {
        "corpus_rows": n,
        "dim": 64,
        "runs": args.runs,
        "float32_bytes_unique_base": fb,
        "int8_bytes_unique_base": qb,
        "scan_bytes_ratio_float_over_int8": round(fb / qb, 3) if qb else None,
        "in_memory_bytes_ratio": 4.0,  # 64×float32 vs 64×int8 + one double scale
        "float32_scan_sec_median": f_med,
        "float32_scan_sec_all": f_all,
        "quantized_topk_sec_median": q_med,
        "quantized_topk_sec_all": q_all,
        "wall_ratio_float_over_quantized": round(f_med / q_med, 3) if q_med else None,
        "recall_at_5_vs_exact": recall,
        "note": "the structural claim is SCAN BYTES (the IO-bound regime of a "
                "10^9-vector corpus); at local[8]/1M the wall is dominated by "
                "the per-batch Python vstack+float64 matmul (kept float64 so "
                "the arrow ranking stays bit-aligned with the oracled expr "
                "fold), so walls land near parity INCLUDING the exact re-rank "
                "stage — a production GEMM would widen this, the byte ratio "
                "is what survives the scale-up. quantized wall includes the "
                "k*rerank exact re-rank; float32 wall is the brute-force "
                "arrow scan alone",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
