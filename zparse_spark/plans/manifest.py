"""Per-partition checkpoint/lineage manifest — resumable validation runs.

The reference is fail-fast single-shot (first error aborts the parse,
error.rs:144); a 10^12-doc job cannot be. The engine writes violations
partition-by-partition and commits one manifest row per completed
partition; on restart it anti-joins the manifest and validates only the
remainder (SURVEY.md §4.3) — except U1/D1, which are table-wide and
always re-evaluated over the full table (see ``run_with_manifest``).
Commit protocol: dynamic-partition-overwrite the partition's violations
under ``violations/partition=<p>/`` (a re-validated partition REPLACES
its files), then append the manifest row — last-writer-wins per
(partition, rules_hash), so a crash-and-rerun or speculative
double-commit is idempotent for both the data files and the manifest.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zparse_spark.schema import MANIFEST_SCHEMA, VIOLATION_SCHEMA


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self._rows_path = os.path.join(path, "manifest.jsonl")

    def committed_partitions(self, spark: SparkSession, rules_hash: str) -> set[str]:
        rows = self._read_rows()
        return {
            r["partition"]
            for r in rows
            if r["rules_hash"] == rules_hash and r["status"] == "done"
        }

    def _read_rows(self) -> list[dict]:
        if not os.path.exists(self._rows_path):
            return []
        with open(self._rows_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def commit(self, partition: str, rules_hash: str, n_docs: int, n_violations: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        row = {
            "partition": partition,
            "rules_hash": rules_hash,
            "status": "done",
            "n_docs": n_docs,
            "n_violations": n_violations,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # append-only JSONL; readers take the last row per key
        # (last-writer-wins — idempotent under speculative re-commit)
        with open(self._rows_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        rows = self._read_rows()
        if not rows:
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        df = spark.createDataFrame(rows)
        return df.select(
            "partition",
            "rules_hash",
            "status",
            F.col("n_docs").cast("long"),
            F.col("n_violations").cast("long"),
            F.to_timestamp("ts").alias("ts"),
        )


def run_with_manifest(
    engine,
    docs: DataFrame,
    media_catalog: DataFrame | None,
    out_dir: str,
) -> list[str]:
    """Resumable run: validate only partitions absent from the manifest.

    One Spark job validates ALL pending partitions together (the pending
    filter is a partition-prunable predicate — on a real Iceberg table it
    becomes partition pruning at the scan); per-partition violation counts
    then commit one manifest row each. Returns newly committed partitions.

    Resume semantics for the non-decomposable rules: U1 (table-wide
    doc_id uniqueness) and D1 (per-partition PSI vs the GLOBAL kind
    distribution) always run over the FULL table — a dup spanning a
    committed and a pending partition, or a drift baseline computed from
    a subset, would otherwise silently weaken a resumed run. Their
    violation rows are then restricted to pending partitions (committed
    partitions' rows were persisted by the run that committed them).
    Both rules read pruned scans (doc_id/partition, spans.kind), so the
    full-table pass does not re-decode text bytes.
    """
    spark = docs.sparkSession
    manifest = Manifest(out_dir)
    rh = engine.config.rules_hash()
    done = manifest.committed_partitions(spark, rh)
    pending_docs = docs.filter(~F.col("partition").isin(sorted(done))) if done else docs

    todo = [r["partition"] for r in pending_docs.select("partition").distinct().collect()]
    if not todo:
        return []

    viol = engine.violations(pending_docs, media_catalog, include_table_rules=False)
    table_viol = engine.table_violations(docs)
    if done:
        table_viol = table_viol.filter(~F.col("partition").isin(sorted(done)))
    viol = viol.unionByName(table_viol)
    viol_path = os.path.join(out_dir, "violations")
    # per-partition dynamic overwrite: re-validating a partition REPLACES
    # its violation files instead of appending a second copy — a job that
    # died between the data write and the manifest commit stays idempotent
    # on rerun (mode('append') would double-count on readback)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        viol.write.mode("overwrite").partitionBy("partition").parquet(viol_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    counts = {
        r["partition"]: (r["n"], r["v"])
        for r in pending_docs.groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(
            # explicit schema: an all-valid run writes zero part files and
            # schema inference would fail on the empty directory tree
            spark.read.schema(VIOLATION_SCHEMA)
            .parquet(viol_path)
            .filter(F.col("partition").isin(todo))
            .groupBy("partition")
            .agg(F.count(F.lit(1)).alias("v")),
            "partition",
            "left",
        )
        .fillna({"v": 0})
        .collect()
    }
    for p in todo:
        n, v = counts.get(p, (0, 0))
        manifest.commit(p, rh, n, v)
    return todo
