"""Per-partition checkpoint/lineage manifest — resumable validation runs.

The reference is fail-fast single-shot (first error aborts the parse,
error.rs:144); a 10^12-doc job cannot be. The engine writes violations
partition-by-partition and commits one manifest row per completed
partition; on restart it anti-joins the manifest and validates only the
remainder (SURVEY.md §4.3).

Sink layout (all namespaced by rules_hash, so a rule change can never
mix old-rule rows into a new run's readback):

    violations/rules_hash=<rh>/partition=<p>/   span/doc/R1 rules —
        partition-decomposable, committed per partition via dynamic
        partition overwrite (re-validation REPLACES the partition's
        files; crash-and-rerun is idempotent)
    violations_table/rules_hash=<rh>/           U1/D1 — table-wide
        rules, re-evaluated over the FULL table on every run and the
        whole sink overwritten: a duplicate whose second copy arrives
        after a partition committed still (re)surfaces the committed
        partition's row, because this sink is never partition-filtered

Manifest storage: append-only JSONL (driver-local, the sandbox default)
or a parquet table (``fmt='parquet'`` — the cluster deployment shape:
lives next to the data, readable by any engine, commit rows carry a
monotonic ``commit_seq``). Both are last-writer-wins per
(partition, rules_hash), so speculative double-commits are idempotent.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zparse_spark.schema import MANIFEST_SCHEMA, VIOLATION_SCHEMA


class Manifest:
    def __init__(self, path: str, fmt: str = "jsonl"):
        if fmt not in ("jsonl", "parquet"):
            raise ValueError(f"unknown manifest fmt {fmt!r}")
        self.path = path
        self.fmt = fmt
        self._rows_path = os.path.join(path, "manifest.jsonl")
        self._table_path = os.path.join(path, "manifest_table")

    # -- reads --------------------------------------------------------

    def committed_partitions(self, spark: SparkSession, rules_hash: str) -> set[str]:
        rows = self._read_rows(spark)
        return {
            r["partition"]
            for r in rows
            if r["rules_hash"] == rules_hash and r["status"] == "done"
        }

    def _read_rows(self, spark: SparkSession | None = None) -> list[dict]:
        if self.fmt == "parquet":
            if not os.path.isdir(self._table_path):
                return []
            spark = spark or SparkSession.getActiveSession()
            return [
                r.asDict()
                for r in spark.read.parquet(self._table_path)
                .orderBy("commit_seq")
                .collect()
            ]
        if not os.path.exists(self._rows_path):
            return []
        with open(self._rows_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- commits ------------------------------------------------------

    def commit(
        self,
        partition: str,
        rules_hash: str,
        n_docs: int,
        n_violations: int,
        spark: SparkSession | None = None,
    ) -> None:
        self.commit_many([(partition, rules_hash, n_docs, n_violations)], spark=spark)

    def commit_many(
        self,
        entries: list[tuple[str, str, int, int]],
        spark: SparkSession | None = None,
    ) -> None:
        """Commit a batch of (partition, rules_hash, n_docs, n_violations)
        rows in ONE write — at cluster scale a run commits thousands of
        partitions and a per-row parquet append would be a job each."""
        if not entries:
            return
        ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        rows = [
            {
                "partition": p,
                "rules_hash": rh,
                "status": "done",
                "n_docs": n,
                "n_violations": v,
                "ts": ts,
            }
            for p, rh, n, v in entries
        ]
        if self.fmt == "parquet":
            spark = spark or SparkSession.getActiveSession()
            seq = time.time_ns()
            df = spark.createDataFrame(
                [
                    (r["partition"], r["rules_hash"], r["status"], r["n_docs"],
                     r["n_violations"], r["ts"], seq + i)
                    for i, r in enumerate(rows)
                ],
                "partition string, rules_hash string, status string, "
                "n_docs long, n_violations long, ts string, commit_seq long",
            )
            df.coalesce(1).write.mode("append").parquet(self._table_path)
            return
        os.makedirs(self.path, exist_ok=True)
        # append-only JSONL; readers take the last row per key
        with open(self._rows_path, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        rows = self._read_rows(spark)
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

    # -- violation sinks ----------------------------------------------

    def partition_sink(self, rules_hash: str) -> str:
        return os.path.join(self.path, "violations", f"rules_hash={rules_hash}")

    def table_sink(self, rules_hash: str) -> str:
        return os.path.join(self.path, "violations_table", f"rules_hash={rules_hash}")

    def read_violations(self, spark: SparkSession, rules_hash: str) -> DataFrame:
        """All persisted violations for ``rules_hash``: the per-partition
        sink UNION the table-rule sink. Explicit schema — an all-valid
        run leaves empty directories."""
        parts = []
        for p in (self.partition_sink(rules_hash), self.table_sink(rules_hash)):
            if os.path.isdir(p):
                parts.append(spark.read.schema(VIOLATION_SCHEMA).parquet(p))
        if not parts:
            return spark.createDataFrame([], VIOLATION_SCHEMA)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out


def run_with_manifest(
    engine,
    docs: DataFrame,
    media_catalog: DataFrame | None,
    out_dir: str,
    manifest: Manifest | None = None,
    media_verdicts: DataFrame | None = None,
) -> list[str]:
    """Resumable run: validate only partitions absent from the manifest.

    One Spark job validates ALL pending partitions together (the pending
    filter is a partition-prunable predicate — on a real Iceberg table it
    becomes partition pruning at the scan); per-partition violation counts
    then commit one manifest batch. Returns newly committed partitions.

    Resume semantics for the non-decomposable rules: U1 (table-wide
    doc_id uniqueness) and D1 (per-partition PSI vs the GLOBAL kind
    distribution) always run over the FULL table and their rows replace
    the whole ``violations_table`` sink — including rows for partitions
    that committed long ago, so a duplicate that spans a committed and a
    pending partition flags BOTH copies (the committed partition's
    per-partition files are untouched; the table sink is a separate
    namespace precisely so this rewrite cannot clobber them). Both rules
    read pruned scans (doc_id/partition, spans.kind), so the full-table
    pass does not re-decode text bytes.
    """
    spark = docs.sparkSession
    manifest = manifest or Manifest(out_dir)
    rh = engine.config.rules_hash()
    done = manifest.committed_partitions(spark, rh)
    pending_docs = docs.filter(~F.col("partition").isin(sorted(done))) if done else docs

    todo = [r["partition"] for r in pending_docs.select("partition").distinct().collect()]
    if not todo:
        return []

    # M1 is partition-decomposable (each referencing span checks against
    # the global payload table), so it rides with the pending-only pass
    viol = engine.violations(
        pending_docs, media_catalog, include_table_rules=False, media_verdicts=media_verdicts
    )
    viol_path = manifest.partition_sink(rh)
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

    # table-wide rules: full re-evaluation, full sink overwrite (see
    # module docstring) — never filtered to pending partitions
    table_viol = engine.table_violations(docs)
    table_viol.write.mode("overwrite").parquet(manifest.table_sink(rh))

    all_viol = manifest.read_violations(spark, rh)
    counts = {
        r["partition"]: (r["n"], r["v"])
        for r in pending_docs.groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(
            all_viol.filter(F.col("partition").isin(todo))
            .groupBy("partition")
            .agg(F.count(F.lit(1)).alias("v")),
            "partition",
            "left",
        )
        .fillna({"v": 0})
        .collect()
    }
    manifest.commit_many(
        [(p, rh, *counts.get(p, (0, 0))) for p in todo], spark=spark
    )
    return todo


def violation_rate_regressions(
    manifest: DataFrame,
    min_delta: float = 0.01,
    ratio: float = 2.0,
    order_col: str = "ts",
) -> DataFrame:
    """Meta-monitoring: the engine watching its OWN run history. Each
    manifest commit records (partition, n_docs, n_violations) for a
    validated partition; comparing consecutive commits of the same
    partition turns the lineage trail into a regression alarm — "p007's
    violation rate jumped 4× since the last run" is the earliest signal
    a producer broke something, and it needs no new scan of the data,
    only the (tiny) manifest table.

    A partition flags when its latest rate exceeds the previous run's
    by BOTH an absolute ``min_delta`` (guards the 0 → 0.0001 noise
    floor) and a multiplicative ``ratio`` (guards already-dirty
    partitions drifting slightly). First-ever runs can't regress;
    ``rules_hash`` changes between commits are surfaced in the output
    (a rate jump under a NEW rule set is expected, not a producer
    break — the consumer decides).

    Scale shape: everything rides the manifest table (one row per
    partition per run — thousands of rows, not documents); one window
    per partition, no document I/O at all.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("partition").orderBy(F.col(order_col).asc())
    rate = F.when(
        F.col("n_docs") > 0, F.col("n_violations") / F.col("n_docs")
    ).otherwise(F.lit(0.0))
    h = (
        manifest.filter(F.col("status") == "done")
        .withColumn("rate", F.round(rate, 6))
        .withColumn("prev_rate", F.lag("rate").over(w))
        .withColumn("prev_ts", F.lag(order_col).over(w))
        .withColumn("prev_rules_hash", F.lag("rules_hash").over(w))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("partition").orderBy(F.col(order_col).desc())
        ))
        .filter(F.col("_rn") == 1)
    )
    return (
        h.filter(
            F.col("prev_rate").isNotNull()
            & ((F.col("rate") - F.col("prev_rate")) > F.lit(float(min_delta)))
            & (F.col("rate") > F.col("prev_rate") * F.lit(float(ratio)))
        )
        .select(
            "partition",
            F.col("prev_ts"),
            F.col(order_col).alias("ts_now"),
            "prev_rate",
            F.col("rate").alias("rate_now"),
            F.round(F.col("rate") - F.col("prev_rate"), 6).alias("delta"),
            (F.col("rules_hash") != F.col("prev_rules_hash")).alias("rules_changed"),
        )
    )
