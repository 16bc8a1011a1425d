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


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming sessionization (EventTimeTimeout) equals the batch
    sessionizer on the same history once the watermark passes: sessions
    closed inline by a past-gap event AND sessions closed by state
    timeout both emit exactly once, with identical (start, end, count).
    Delivery is in order across batches (the documented contract; the
    watermark admits no pre-state stragglers here)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from zparse_spark.operators.sessionize import sessionize
    from zparse_spark.streaming.stateful import sessionize_stream

    src, ck, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    base = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [(u, base + dt.timedelta(hours=h)) for u, h in rows],
            "user_id long, ts timestamp",
        )

    def run(df):
        df.coalesce(1).write.mode("append").parquet(src)
        q = (
            sessionize_stream(
                spark.readStream.schema("user_id long, ts timestamp").parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(mk([(1, 0), (1, 1), (2, 0)]))
    # 10h > 6h gap: closes user 1's first session INLINE, opens a second
    run(mk([(1, 10), (99, 100)]))
    # trigger timeout processing under the watermark batch 2 advanced
    run(mk([(99, 101)]))

    got = {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)
        for r in spark.read.parquet(out).filter(F.col("user_id") != 99).collect()
    }
    # batch truth over the same (sentinel-free) history
    hist = mk([(1, 0), (1, 1), (2, 0), (1, 10)])
    bt = (
        sessionize(hist, key="user_id", ts_col="ts", gap_us=6 * 3600 * 1_000_000,
                   order_cols=())
        .groupBy("user_id", "session_seq")
        .agg(
            (F.min(F.unix_micros(F.col("ts"))) / 1000).cast("long").alias("s"),
            (F.max(F.unix_micros(F.col("ts"))) / 1000).cast("long").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    want = {(r.user_id, r.s, r.e, r.n) for r in bt.collect()}
    assert got == want and len(got) == 3
