"""Structured Streaming validation — continuous ingest of the documents
table with the same rule pack.

Two shapes:

- ``validate_stream``: readStream → foreachBatch(full rule pack →
  violations sink + manifest commit per microbatch). foreachBatch is the
  right tool because the rule pack includes joins/aggregates (uniqueness
  within batch, referential vs a static catalog) that are awkward as
  pure streaming operators; each microbatch is a bounded DataFrame so
  the batch engine is reused verbatim — one code path for batch and
  streaming (the reference's one-parser-many-frontends shape,
  lib.rs vs cli vs api vs wasm).

- ``violation_rate_windows``: a genuinely incremental operator —
  per-(window, rule) violation counts with event-time watermarking, so
  late events are folded in until the watermark closes the window.

Checkpointing: Spark's own streaming checkpoint (offsets + state) plus
our per-batch manifest rows — the streaming incarnation of the
SURVEY.md §4.3 resume contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zparse_spark.plans.engine import ValidationEngine


def validate_stream(
    stream_docs: DataFrame,
    media_catalog: DataFrame | None,
    out_dir: str,
    engine: ValidationEngine | None = None,
    trigger_once: bool = True,
    media_verdicts: DataFrame | None = None,
):
    """Attach the rule pack to a streaming documents DataFrame.

    Uniqueness note: U1 inside foreachBatch is per-microbatch; global
    uniqueness across the stream's history requires a compaction job on
    the violations table (documented trade-off — same reason the
    reference enforces DuplicateKey per document, not per corpus).

    ``media_verdicts`` (static, from ``decode_verdicts`` over the payload
    table) enables M1 per microbatch — a stream-static join, the standard
    Structured Streaming dimension pattern.
    """
    eng = engine or ValidationEngine()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        viol = eng.violations(batch_df, media_catalog, media_verdicts=media_verdicts)
        (
            viol.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{out_dir}/violations")
        )

    writer = (
        stream_docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def violation_rate_windows(
    stream_events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed violation-rate aggregation with late-data handling.

    Input: a stream of violation rows carrying an event-time column.
    Output: per-(window, rule_id) counts, incrementally maintained;
    watermark bounds state so the operator runs forever at constant
    memory — the streaming analog of per-partition verdict counts.
    """
    return (
        stream_events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), "rule_id")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rule_id",
            "n_violations",
        )
    )


def compact_dedup_sink(
    spark,
    out_dir: str,
    id_cols: tuple[str, ...] = ("doc_id",),
    event_time_col: str = "ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Offline compaction closing ``dedup_stream``'s watermark gap: a
    document re-delivered AFTER its dedup state expired lands in the
    sink twice; this job removes those stragglers so streaming +
    compaction together give exactly-once per id over all history.

    Keep rule — and its deliberate difference from the online operator:
    ``dropDuplicatesWithinWatermark`` keeps the first-PROCESSED copy
    (arrival order), which is not recoverable from the sink; compaction
    defines the survivor by EVENT time — min ``event_time_col`` per id,
    ties broken by a stable row hash — making the compacted table a
    deterministic function of the data, independent of delivery order.
    When a post-watermark re-delivery carries an *earlier* event time
    (or differing payload columns), the two definitions disagree and the
    event-time copy wins. Callers that need arrival order preserved must
    have the stream writer stamp an ingest-order column (e.g. a
    ``batch_id`` from foreachBatch) and pass it as ``order_cols`` — it
    then takes precedence over event time in the keep rule.

    Scale shape: one shuffle on the id (the window's partition key);
    the per-key sort is over duplicate copies only (a handful of rows),
    never the corpus. Output goes to ``out_dir/compacted`` (full
    overwrite — the compacted snapshot is a new table version, the
    crash-safe pattern; callers swap pointers, never rewrite the live
    sink in place). Returns the read-back compacted frame.
    """
    from pyspark.sql import Window

    sink = spark.read.parquet(f"{out_dir}/deduped")
    w = Window.partitionBy(*[F.col(c) for c in id_cols]).orderBy(
        *[F.col(c).asc() for c in order_cols],
        F.col(event_time_col).asc(),
        F.xxhash64(*[F.col(c) for c in sink.columns]).asc(),
    )
    (
        sink.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/compacted")
    )
    return spark.read.parquet(f"{out_dir}/compacted")


def dedup_stream(
    stream_docs: DataFrame,
    out_dir: str,
    id_cols: tuple[str, ...] = ("doc_id",),
    event_time_col: str = "ts",
    delay: str = "10 minutes",
    trigger_once: bool = True,
    stamp_ingest_order: bool = False,
):
    """Streaming exact dedup — the ingest-side guard of the dedup family
    (operators/dedup.py) as a genuinely incremental operator.

    ``dropDuplicatesWithinWatermark`` keys the dedup state on
    ``id_cols`` and EXPIRES state once the watermark passes an entry —
    the property that makes exact dedup runnable on an unbounded stream:
    state is O(ids per watermark window), not O(ids ever seen). A
    re-delivered document inside the window is dropped; re-delivery
    after the window lands in the offline compaction's lap —
    ``compact_dedup_sink`` over this sink, tested end-to-end against a
    post-watermark re-delivery — the same split as U1's per-batch /
    compaction trade-off in ``validate_stream``.
    """
    deduped = stream_docs.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
    if stamp_ingest_order:
        # stamp the micro-batch id as ``_ingest_batch`` so the offline
        # compaction can recover ARRIVAL order (pass
        # ``order_cols=('_ingest_batch',)`` to compact_dedup_sink — it
        # then takes precedence over event time in the keep rule, so a
        # post-watermark re-delivery carrying an EARLIER event time
        # still loses to the first arrival). batch ids are monotonic
        # across restarts of the same checkpoint; the sink partitions
        # by batch with dynamic overwrite, making a retried batch
        # idempotent (plain append would duplicate it).
        def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("_ingest_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_ingest_batch")
                .parquet(f"{out_dir}/deduped")
            )

        writer = (
            deduped.writeStream.foreachBatch(_write_batch)
            .option("checkpointLocation", f"{out_dir}/_dedup_checkpoint")
            .outputMode("append")
        )
    else:
        writer = (
            deduped.writeStream.format("parquet")
            .option("path", f"{out_dir}/deduped")
            .option("checkpointLocation", f"{out_dir}/_dedup_checkpoint")
            .outputMode("append")
        )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def checksum_stream(
    stream_docs: DataFrame,
    state_path: str,
    group_cols: list[str] | None = None,
    cols: list[str] | None = None,
    checkpoint: str | None = None,
):
    """Incrementally maintained table checksum over a stream: each
    microbatch's digest (count, bit_xor, modular sum — see
    operators/checksum.py) is MERGED into a running per-group digest
    via the same commutative monoid the batch operator reduces with:

        n' = n + n_b;  xor' = xor ⊕ xor_b;  sum' = (sum + sum_b) mod 2^60

    so after any prefix of batches the state table equals
    ``table_checksum`` of the rows seen so far — regardless of batch
    boundaries, arrival order, or restarts (foreachBatch + an
    idempotent last-committed-batch guard in the state table). This is
    the streaming face of the engine's resume story: a killed ingest
    resumes and the digest still byte-matches the batch truth, which a
    golden fixture or a second cluster can verify independently.

    State table layout: group_cols + n_rows/xor_hash/sum_hash +
    _last_batch. Merge cost per batch: a join of the batch digest
    (|groups| rows) against the state (|groups| rows) — independent of
    batch size beyond the one digest aggregation.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from zparse_spark.operators.checksum import _MOD, table_checksum

    group_cols = list(group_cols or [])
    spark = stream_docs.sparkSession

    def _read_state():
        # existence probe through Spark's filesystem layer, not the
        # driver's local os.path — the state table may live on
        # HDFS/S3/ABFS where a local check is always False
        try:
            return spark.read.parquet(state_path)
        except AnalysisException:
            return None

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = table_checksum(batch_df, group_cols=group_cols, cols=cols)
        state = _read_state()
        if state is not None:
            if state.agg(F.max("_last_batch")).collect()[0][0] >= batch_id:
                return  # replayed batch after restart: already merged
            merged = (
                state.drop("_last_batch")
                .unionByName(new)
                .groupBy(*group_cols)
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    F.expr("bit_xor(xor_hash)").alias("xor_hash"),
                    (F.sum(F.col("sum_hash").cast("decimal(38,0)")) % F.lit(_MOD))
                    .cast("long")
                    .alias("sum_hash"),
                )
            )
        else:
            merged = new
        out = merged.withColumn("_last_batch", F.lit(batch_id))
        # two-phase write: parquet overwrite of a read-from path needs
        # a staging hop (Spark reads lazily from the same files)
        tmp = state_path + "._staging"
        out.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(state_path)

    writer = stream_docs.writeStream.foreachBatch(_merge_batch).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()


def cms_stream(
    stream_df: DataFrame,
    col: str,
    state_path: str,
    width: int = 1024,
    depth: int = 4,
    checkpoint: str | None = None,
):
    """X148: incrementally maintained Count-Min sketch over a stream —
    the streaming face of the X135 mergeable-sketch story, same
    discipline as checksum_stream: each microbatch's (depth x width)
    counter grid is folded into the state grid by the CMS monoid
    (cell-wise addition), so after ANY prefix of batches the state
    equals cms_sketch of all rows seen so far — regardless of batch
    boundaries, arrival order, or restarts (idempotent
    last-committed-batch guard). A 10^12-row firehose thus keeps a
    fixed-size, engine-portable frequency summary that any consumer
    probes with cms_estimate, without ever re-scanning history.

    State table layout: (d, bucket, n) + _last_batch. Merge cost per
    batch: one groupBy over depth*width + batch-partial cells —
    independent of batch size beyond the per-batch sketch aggregation.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from zparse_spark.operators.stats import cms_sketch

    spark = stream_df.sparkSession

    def _read_state():
        try:
            return spark.read.parquet(state_path)
        except AnalysisException:
            return None

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = cms_sketch(batch_df, col, width=width, depth=depth)
        state = _read_state()
        if state is not None:
            if state.agg(F.max("_last_batch")).collect()[0][0] >= batch_id:
                return  # replayed batch after restart: already merged
            merged = (
                state.drop("_last_batch")
                .unionByName(new)
                .groupBy("d", "bucket")
                .agg(F.sum("n").alias("n"))
            )
        else:
            merged = new
        out = merged.withColumn("_last_batch", F.lit(batch_id))
        tmp = state_path + "._staging"
        out.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(state_path)

    writer = stream_df.writeStream.foreachBatch(_merge_batch).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()


def suite_stream(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    nullable_col: str,
    state_path: str,
    checkpoint: str | None = None,
):
    """X222: incrementally maintained grouped-expectation STATE over a
    stream — the streaming face of the X219 release gate, restricted to
    the MERGEABLE kinds (counts, null counts, sum, min, max fold as
    monoids; exact percentiles do not and stay batch-side). Each
    microbatch's per-group partial (n, c_nonnull, s_value, mn, mx) is
    folded into the state by cell-wise monoid merge with the
    idempotent last-committed-batch guard (checksum_stream/cms_stream
    discipline, validate_stream.py:285): after ANY prefix of batches —
    regardless of boundaries, arrival order, or restarts — the state
    equals the batch aggregate of all rows seen, so a grouped suite
    (null-rate bound, row-count floor, mean band) evaluated on the
    state equals the batch suite on the same prefix. A firehose thus
    keeps a |groups|-row gate current without re-scanning history.

    State table layout: (g, n, c_nonnull, c_value, s_value, mn, mx) +
    _last_batch. Merge cost per batch: one groupBy over |groups| +
    batch-partial rows — independent of batch size beyond the
    per-batch aggregation.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    spark = stream_df.sparkSession

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col(group_col).alias("g")).agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.col(nullable_col)).alias("c_nonnull"),
            F.count(F.col(value_col)).alias("c_value"),
            F.sum(F.col(value_col)).alias("s_value"),
            F.min(F.col(value_col)).alias("mn"),
            F.max(F.col(value_col)).alias("mx"),
        )

    def _read_state():
        try:
            return spark.read.parquet(state_path)
        except AnalysisException:
            return None

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = _partial(batch_df)
        state = _read_state()
        if state is not None:
            if state.agg(F.max("_last_batch")).collect()[0][0] >= batch_id:
                return  # replayed batch after restart: already merged
            merged = (
                state.drop("_last_batch")
                .unionByName(new)
                .groupBy("g")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("c_nonnull").alias("c_nonnull"),
                    F.sum("c_value").alias("c_value"),
                    F.sum("s_value").alias("s_value"),
                    F.min("mn").alias("mn"),
                    F.max("mx").alias("mx"),
                )
            )
        else:
            merged = new
        out = merged.withColumn("_last_batch", F.lit(batch_id))
        tmp = state_path + "._staging"
        out.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(state_path)

    writer = stream_df.writeStream.foreachBatch(_merge_batch).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()
