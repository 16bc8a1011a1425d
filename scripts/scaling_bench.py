"""Scaling-efficiency evidence (BASELINE.md §3 protocol).

Runs the identical full-rule-pack validation job at two parallelism
levels (default local[8] vs local[32]) on the same materialized input,
in separate JVMs, and reports docs/sec at both plus
``efficiency = (docs_per_sec_hi / docs_per_sec_lo) / (hi / lo)``.

Usage: python scripts/scaling_bench.py [--docs 200000] [--lo 8] [--hi 32]
Prints one JSON line; append the table to BASELINE.md §4.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
from zparse_spark.session import get_spark
from zparse_spark.plans.engine import ValidationEngine
from zparse_spark.sources.interleave import derive_media_catalog

cores = int(sys.argv[1])
docs_path = sys.argv[2]
out_path = sys.argv[3]

spark = get_spark(app_name=f"scaling_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
docs = spark.read.parquet(docs_path)
catalog = derive_media_catalog(spark)
engine = ValidationEngine()

# warmup: one full untimed pass (codegen JIT + page cache), then measure
# steady state — the regime a long-running cluster job operates in.
# Timed passes are medianed: single-shot timings on a shared box swing
# +/-15% (GC epochs, page-cache state), which is larger than the
# efficiency margin being measured.
viol = engine.violations(docs, catalog)
n_docs = docs.count()

def one_pass():
    t0 = time.perf_counter()
    # violations are sparse: repartition the tiny output before the sink
    # so the file-commit cost is O(cores) files, not O(input partitions)
    viol.repartition(cores).write.mode("overwrite").parquet(f"{out_path}/violations")
    written = spark.read.parquet(f"{out_path}/violations")
    engine.verdicts(docs, written).count()
    return time.perf_counter() - t0

one_pass()
times = [one_pass() for _ in range(3)]
elapsed = statistics.median(times)
print(json.dumps({"cores": cores, "n_docs": n_docs, "sec": round(elapsed, 3),
                  "times": [round(t, 2) for t in times],
                  "docs_per_sec": round(n_docs / elapsed, 1)}))
spark.stop()
"""


def run_at(cores: int, docs_path: str, workdir: str) -> dict:
    env = dict(os.environ)
    # per-run heap mirrors a real cluster, where 4N executors bring 4N
    # heaps: 2 GiB/core (min 16). Round 1 ran both sides on a fixed 16g
    # heap; at 32 threads that starves the JVM and the measured "poor
    # 8->32 scaling" was substantially GC pressure, not the engine
    # (16M docs @32 cores: 340k docs/s at 16g vs 554k at 64g).
    env["SPARK_GRAFT_DRIVER_MEM"] = f"{max(16, 2 * cores)}g"
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cores), docs_path, f"{workdir}/c{cores}"],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="zparse_scaling_")
    docs_path = f"{workdir}/documents"

    # materialize input once (separate JVM so neither run inherits a warm one)
    prep = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from zparse_spark.session import get_spark
from zparse_spark.sources.interleave import interleave_documents
from zparse_spark.sources.readers import load_documents

sf_dir, target, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(app_name="scaling_prep", master="local[32]", shuffle_partitions=32)
flat = load_documents(spark, sf_dir)
n = flat.count()
factor = max(1, target // n)
if factor > 1:
    reps = spark.range(factor).select(F.col("id").alias("_rep"))
    flat = (flat.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") * factor + F.col("_rep")).drop("_rep"))
interleave_documents(flat).repartition(256).write.mode("overwrite").parquet(out)
spark.stop()
"""
    subprocess.run(
        [sys.executable, "-c", prep, args.sf_dir, str(args.docs), docs_path],
        check=True,
        capture_output=True,
        timeout=3600,
    )

    lo = run_at(args.lo, docs_path, workdir)
    hi = run_at(args.hi, docs_path, workdir)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (args.hi / args.lo)
    # min-of-N pair alongside the median pair: this sandbox is a shared
    # VM whose capacity visibly oscillates (identical passes swing 2-3×
    # with zero guest-visible steal/iowait); noise is strictly additive,
    # so the min estimates uncontended capability
    eff_min = (min(lo["times"]) / min(hi["times"])) / (args.hi / args.lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "n_docs": lo["n_docs"],
                "lo_cores": args.lo,
                "hi_cores": args.hi,
                "docs_per_sec_lo": lo["docs_per_sec"],
                "docs_per_sec_hi": hi["docs_per_sec"],
                "sec_lo": lo["sec"],
                "sec_hi": hi["sec"],
                "times_lo": lo["times"],
                "times_hi": hi["times"],
                "efficiency": round(eff, 3),
                "efficiency_min_pair": round(eff_min, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
