"""Scale-tier evidence for the round-5 final operator family:
edit-distance fuzzy join, table checksum, key gaps, interval-overlap
join, BM25, cross-table CHECK, parquet-footer audit at 1x vs 10x.

Replication re-keys every table into DISJOINT universes so the
workload's per-key structure stays constant and only the key count
grows — the property that makes "wall grows ~10x" the linear
yardstick:

- customers: names get a '-<rep>x<rep>' suffix (any two distinct reps
  differ in >=2 positions, so NO cross-rep pair enters the k=1 result
  and the true pair set replicates exactly per rep);
- orders/lineitem: orderkey/partkey shifted by rep * 10^7 (disjoint
  key ranges / groups);
- documents: doc_id shifted (disjoint ids; BM25's df and N both scale
  by the factor, top-10 stays top-10).

Prints one JSON line; committed as scripts/scale_tier_session_r05.json.
Run on a QUIET box (no concurrent Spark).
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base-factor", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from zparse_spark.functions.text import bm25_search
    from zparse_spark.operators.asof import interval_overlap_join
    from zparse_spark.operators.checksum import table_checksum
    from zparse_spark.operators.editdist import bounded_edit_distance_join
    from zparse_spark.operators.rules import cross_table_check_violations
    from zparse_spark.operators.stats import key_gaps
    from zparse_spark.session import get_spark
    from zparse_spark.sources.parquet_audit import parquet_footer_audit

    spark = get_spark(app_name="scale_tier_session")
    sf = args.sf_dir

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def reps(f):
        return spark.range(f).select(F.col("id").alias("_rep"))

    def timed(fn):
        fn()  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 3)

    def mk_tier(tag, f):
        c = (
            cust.crossJoin(F.broadcast(reps(f)))
            .select(
                (F.col("c_custkey") + F.col("_rep") * 10_000_000).alias("c_custkey"),
                F.concat(
                    "c_name", F.lit("-"), F.col("_rep").cast("string"),
                    F.lit("x"), F.col("_rep").cast("string"),
                ).alias("c_name"),
            )
        )
        o = (
            orders.crossJoin(F.broadcast(reps(f)))
            .select(
                (F.col("o_orderkey") + F.col("_rep") * 10_000_000).alias("orderkey"),
                "o_orderpriority",
                F.col("o_orderdate").cast("date").alias("orderdate"),
            )
        )
        l = (
            li.crossJoin(F.broadcast(reps(f)))
            .select(
                (F.col("l_orderkey") + F.col("_rep") * 10_000_000).alias("orderkey"),
                (F.col("l_partkey") + F.col("_rep") * 10_000_000).alias("partkey"),
                F.col("l_linenumber").cast("int").alias("linenumber"),
                F.col("l_shipdate").cast("date").alias("shipdate"),
                F.col("l_quantity").cast("long").alias("q"),
            )
        )
        d = (
            docs.crossJoin(F.broadcast(reps(f)))
            .select(
                (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
        base = f"/tmp/scale_tier_session_{tag}"
        for name, df in (("cust", c), ("orders", o), ("li", l), ("docs", d)):
            df.repartition(max(8, f)).write.mode("overwrite").parquet(f"{base}/{name}")
        return {
            n: spark.read.parquet(f"{base}/{n}")
            for n in ("cust", "orders", "li", "docs")
        }, base

    def mk_jobs(t, base):
        iv = t["li"].select(
            "partkey",
            F.concat_ws(
                "-", F.col("orderkey").cast("string"),
                F.col("linenumber").cast("string"),
            ).alias("id"),
            F.datediff("shipdate", F.lit("1970-01-01").cast("date"))
            .cast("long").alias("s"),
            "q",
        ).withColumn("e", F.col("s") + F.col("q")).drop("q")
        return {
            "editdist_join": lambda: bounded_edit_distance_join(
                t["cust"], "c_custkey", "c_name", k=1
            ).count(),
            "table_checksum": lambda: table_checksum(
                t["docs"], group_cols=["source"]
            ).count(),
            "key_gaps": lambda: key_gaps(
                t["orders"].select("o_orderpriority", "orderkey"),
                key_col="orderkey", group_cols=["o_orderpriority"], bin_size=1024,
            ).count(),
            "interval_overlap": lambda: interval_overlap_join(
                iv, "id", "s", "e", group_cols=["partkey"], bin_width=32
            ).count(),
            "bm25": lambda: bm25_search(
                t["docs"], ["merge", "spark", "window"], top_k=10
            ).count(),
            "cross_table_check": lambda: cross_table_check_violations(
                t["li"], t["orders"].select("orderkey", "orderdate"),
                on=["orderkey"], predicate="shipdate >= orderdate",
                rule_id="K10", fact_cols=["orderkey", "linenumber"],
            ).count(),
            "footer_audit": lambda: parquet_footer_audit(
                spark, f"{base}/docs"
            ).count(),
        }

    out: dict = {
        "metric": "scale_tier_session_lo_vs_hi",
        "growth_ratio": args.factor,
        "base_factor": args.base_factor,
        "sf_dir": sf,
        "runs_per_point": args.runs,
    }
    tiers = {}
    for tag, f in (("1x", args.base_factor), ("10x", args.base_factor * args.factor)):
        t, base = mk_tier(tag, f)
        tiers[tag] = {"n_docs": t["docs"].count(), "jobs": {}}
        for name, fn in mk_jobs(t, base).items():
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
