"""Streaming dedup + offline compaction, oracle-gated end to end.

Round 3 left X6 (streaming-history compaction) pytest-only; this module
puts the batch-equivalence CLAIM itself into the DuckDB gate: running
``dedup_stream`` (dropDuplicatesWithinWatermark, availableNow) over a
3-batch fixture — including a post-watermark re-delivery that slips into
the sink twice, the documented watermark gap — followed by
``compact_dedup_sink`` must equal the BATCH answer over the union of all
input batches: the min-event-time row per id. DuckDB computes that
answer directly (row_number over ts per id) from the same persisted
batch parquet, so a green row certifies streaming + compaction together
give exactly-once semantics over all history.

Event times are distinct per (id, delivery) by construction, so the
keep rule never reaches its hash tie-break (xxhash64 has no DuckDB
counterpart; ties are pytest-covered instead).
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from zparse_spark.queries import register

_W = "/root/repo/spark-warehouse/oracle"
_T0 = 1_700_000_000

_STREAM_SQL = f"""WITH inp AS (
  SELECT doc_id, val, ts FROM read_parquet('{_W}/stream_src/*.parquet')
),
ranked AS (
  SELECT doc_id, val, CAST(epoch(ts) AS BIGINT) AS ts_s,
         row_number() OVER (PARTITION BY doc_id ORDER BY ts ASC) AS rn
  FROM inp
)
SELECT doc_id, val, ts_s FROM ranked WHERE rn = 1"""


@register("streaming_dedup_compaction", _STREAM_SQL)
def streaming_dedup_compaction(spark, sf_dir):
    """Three availableNow micro-runs against a growing parquet source:

    - batch 1: ids 0..79 (first deliveries);
    - batch 2: ids 40..119 three hours later — 40..79 are re-deliveries
      caught by LIVE dedup state (dropped in-stream), 80..119 are new;
      the watermark advances past batch 1's state expiry;
    - batch 3: ids 0..19 re-delivered after their state expired (the
      watermark gap: they land in the sink as duplicates) plus new
      200..219.

    ``compact_dedup_sink`` then removes the late extras; the result must
    match DuckDB's batch answer (min event time per id over the union of
    inputs) row for row — ids 0..79 keep their batch-1 rows, every
    mid-watermark duplicate was never in the sink at all."""
    from zparse_spark.streaming.validate_stream import compact_dedup_sink, dedup_stream

    src = f"{_W}/stream_src"
    out = f"{_W}/stream_out"
    for p in (src, out):
        shutil.rmtree(p, ignore_errors=True)

    def batch(lo: int, hi: int, t_base: int, tag: str):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.lit(tag).alias("val"),
            F.timestamp_seconds(F.lit(t_base) + F.col("id")).alias("ts"),
        )

    schema = "doc_id bigint, val string, ts timestamp"

    def run(df):
        df.write.mode("append").parquet(src)
        q = dedup_stream(
            spark.readStream.schema(schema).parquet(src), out, delay="1 hour"
        )
        q.awaitTermination(120)

    run(batch(0, 80, _T0, "b1"))
    run(batch(40, 120, _T0 + 3 * 3600, "b2"))
    run(
        batch(0, 20, _T0 + 4 * 3600, "b3").unionByName(
            batch(200, 220, _T0 + 4 * 3600, "b3")
        )
    )
    compacted = compact_dedup_sink(spark, out, event_time_col="ts")
    return compacted.select(
        "doc_id", "val", F.col("ts").cast("long").alias("ts_s")
    )
