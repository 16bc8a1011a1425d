from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.streaming.stateful import running_violation_totals


def _run(spark, src: str, ck: str, out: str) -> None:
    stream = spark.readStream.schema("rule_id string").parquet(f"{src}/*")
    q = (
        running_violation_totals(stream)
        .writeStream.foreachBatch(
            lambda df, batch_id: df.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _latest(spark, out: str) -> dict:
    df = spark.read.parquet(out)
    latest = df.groupBy("rule_id").agg(
        F.max("batches_seen").alias("batches_seen"),
        F.max("total_violations").alias("total_violations"),
    )
    return {
        r["rule_id"]: (r["total_violations"], r["batches_seen"]) for r in latest.collect()
    }


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps cumulative per-rule totals across
    micro-batches AND across a query restart from the same checkpoint
    (memory sink can't recover a checkpoint; foreachBatch parquet can)."""
    src, ck, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")

    # coalesce(1): one file per logical batch
    spark.createDataFrame([("S1",), ("S1",), ("S2",)], ["rule_id"]).coalesce(1).write.parquet(
        f"{src}/b1"
    )
    _run(spark, src, ck, out)
    first = _latest(spark, out)
    assert first["S1"] == (2, 1) and first["S2"] == (1, 1)

    spark.createDataFrame(
        [("S1",), ("S2",), ("S2",), ("S2",)], ["rule_id"]
    ).coalesce(1).write.parquet(f"{src}/b2")
    _run(spark, src, ck, out)
    second = _latest(spark, out)
    # state carried across restart: totals include batch1 + batch2
    assert second["S1"] == (3, 2)
    assert second["S2"] == (4, 2)
