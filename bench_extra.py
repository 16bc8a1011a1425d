"""Component-isolation benchmarks behind the r6 optimization claims.

The driver-frozen ``bench.py`` times whole queries; this file times the
COMPONENTS those optimizations changed, with the noop sink (guide §1.4)
so the computation is measured, not the sink. Every number cited in
OPTIMIZATION_r06.md §1–§4 reproduces from here.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [probe ...]

Probes (default: all): annotate shingles span redact pack
Prints one JSON line with per-probe median seconds (of 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from zparse_spark.session import get_spark

    spark = get_spark(app_name="zparse_spark_bench_extra")
    timings: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, n=3):
        if only and name.split(":")[0] not in only:
            return
        spark.sparkContext.setJobDescription(name)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(statistics.median(ts), 3)

    # same 100k-doc replicated corpus as bench.py
    workdir = tempfile.mkdtemp(prefix="zparse_bench_extra_")
    cdocs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    target = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    factor = max(1, target // max(cdocs.count(), 1))
    if factor > 1:
        reps = spark.range(factor).select(F.col("id").alias("_rep"))
        cdocs = (
            cdocs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") * factor + F.col("_rep"))
            .drop("_rep")
        )
    cdocs.write.mode("overwrite").parquet(f"{workdir}/corpus_docs")
    cdocs = spark.read.parquet(f"{workdir}/corpus_docs")
    cdocs.count()  # warm page cache / JVM

    # --- §1: corpus annotate, arrow vs expr -----------------------------
    from zparse_spark.operators.filtering import corpus_filter, token_budget_pack

    timed("annotate:arrow_noop", lambda: noop(corpus_filter(cdocs, impl="arrow")))
    timed("annotate:expr_noop", lambda: noop(corpus_filter(cdocs, impl="expr")))
    timed(
        "pack:filter_and_pack",
        lambda: token_budget_pack(
            corpus_filter(cdocs).filter(F.col("kept")).select(
                "doc_id", "tokens", "quality"
            ),
            budget=2_000_000,
        ).count(),
    )

    # --- §2: shingles, NGram frame vs HOF expression --------------------
    from zparse_spark.operators.dedup import shingle_sets, shingles

    ddocs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    timed("shingles:ngram_frame", lambda: noop(shingle_sets(ddocs, "doc_id", "text")))
    timed(
        "shingles:hof_expr",
        lambda: noop(ddocs.select(shingles(F.col("text")).alias("sh"))),
    )

    # --- §3: span-rule stage over the interleaved 100k table ------------
    from zparse_spark.operators.rules import RuleParams, span_rule_violations
    from zparse_spark.sources.interleave import (
        derive_media_catalog,
        interleave_documents,
    )
    from zparse_spark.sources.readers import load_documents

    flat = load_documents(spark, sf_dir)
    vfactor = max(1, target // max(flat.count(), 1))
    if vfactor > 1:
        reps = spark.range(vfactor).select(F.col("id").alias("_rep"))
        flat = (
            flat.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") * vfactor + F.col("_rep"))
            .drop("_rep")
        )
    interleave_documents(flat).write.mode("overwrite").parquet(f"{workdir}/documents")
    vdocs = spark.read.parquet(f"{workdir}/documents")
    catalog = derive_media_catalog(spark)
    timed(
        "span:rule_stage_noop",
        lambda: noop(span_rule_violations(vdocs, RuleParams(), media_catalog=catalog)),
    )

    # --- §4: PII redaction, arrow vs expr -------------------------------
    from zparse_spark.functions.text import redact_pii

    pii = cdocs.select(
        F.concat(
            F.col("text"), F.lit(" u"), F.col("doc_id").cast("string"),
            F.lit("@x.org 10.0.0."), (F.col("doc_id") % 256).cast("string"),
        ).alias("text")
    )
    for impl in ("arrow", "expr"):
        timed(
            f"redact:{impl}",
            lambda impl=impl: pii.select(
                redact_pii(F.col("text"), impl=impl).alias("r")
            ).agg(F.sum(F.length("r"))).collect(),
        )

    print(json.dumps({"metric": "component_probes", "unit": "sec", "probes": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
