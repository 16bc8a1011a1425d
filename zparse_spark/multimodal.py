"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media payloads ride as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The image/audio codecs aren't available in this
container, so the codec call itself is stubbed behind
``set_decoder``/NotImplementedError with a deterministic fake used in
tests — the Spark-side contract (schemas, batch iteration, partition
sizing, UDF signatures) is real and tested.

Schema:
  media_payloads(media_ref string, media_kind string, payload binary,
                 meta struct<width:int, height:int, sample_rate:int,
                             duration_ms:int, codec:string>)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

# Pluggable codec: None → NotImplementedError on real decode paths.
# Tests and the sandbox install the deterministic fake below.
_DECODER: Callable[[bytes, str], list[float]] | None = None


def set_decoder(fn: Callable[[bytes, str], list[float]] | None) -> None:
    global _DECODER
    _DECODER = fn


def deterministic_fake_decoder(payload: bytes, kind: str) -> list[float]:
    """Seed-free deterministic stand-in: 8 features derived from byte
    statistics. Replaces PIL/librosa/ffmpeg in this container."""
    if not payload:
        return [0.0] * 8
    n = len(payload)
    s = sum(payload)
    return [
        float(n),
        s / n,
        float(payload[0]),
        float(payload[-1]),
        float(max(payload)),
        float(min(payload)),
        float(s % 251),
        float((payload[0] ^ payload[-1]) if n else 0),
    ]


def synthesize_payloads(spark: SparkSession, media_catalog: DataFrame) -> DataFrame:
    """Deterministic binary payloads for the catalog (test/bench input:
    no real media in the sandbox). Payload bytes derive from xxhash64 of
    the ref — stable across runs and partitioning."""
    return media_catalog.select(
        "media_ref",
        "media_kind",
        F.to_binary(
            F.substring(F.repeat(F.sha2(F.col("media_ref"), 256), 4), 1, 128), F.lit("hex")
        ).alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1000).alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def extract_features(payloads: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out; one Python worker per input partition, no shuffle. At 100 TB
    the payload column dominates I/O — callers should repartition by
    size (``spark.sql.files.maxPartitionBytes``) so a batch of decoded
    frames fits executor memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _DECODER
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no media decoder installed in this environment; "
                    "call set_decoder(...) (image/audio libs not in container)"
                )
            feats = [
                decoder(bytes(p) if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["media_kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(payloads: DataFrame, every_ms: int = 200) -> DataFrame:
    """Frame-sampling *plan* for video payloads: expands each payload row
    into (media_ref, frame_idx, ts_ms) rows JVM-side; the decode of each
    frame is the stubbed mapInPandas stage. Demonstrates the explode-
    before-Python pattern: frame bookkeeping stays in the JVM, Python
    sees only the rows it must decode."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return payloads.filter(F.col("media_kind") == "video").select(
        "media_ref",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)


# Pluggable resizer, same stance as the decoder: the pixel op needs an
# image lib this container lacks; the Spark-side plumbing (JVM-planned
# target dims, Arrow batches, schema) is real and tested with a fake.
_RESIZER: Callable[[bytes, str, int, int], bytes] | None = None


def set_resizer(fn: Callable[[bytes, str, int, int], bytes] | None) -> None:
    global _RESIZER
    _RESIZER = fn


def deterministic_fake_resizer(payload: bytes, kind: str, tw: int, th: int) -> bytes:
    """Stand-in for PIL resize: tile/truncate the payload to tw*th bytes
    — deterministic, size-exact, codec-free."""
    n = max(tw * th, 1)
    if not payload:
        return b"\x00" * n
    return (payload * (n // len(payload) + 1))[:n]


def resize_images(payloads: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving image resize. The geometry is planned JVM-side
    (scale = min(1, max_side/max(w,h)), floor'd target dims as columns)
    so Python receives only image rows that actually shrink, already
    annotated with their target size — the same explode-before-Python
    stance as ``frame_sample_plan``. Output schema = input schema with
    payload and meta.width/height rewritten.
    """
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double"))
    planned = payloads.filter(F.col("media_kind") == "image").select(
        "media_ref",
        "media_kind",
        "payload",
        "meta",
        F.greatest(F.floor(w * scale).cast("int"), F.lit(1)).alias("_tw"),
        F.greatest(F.floor(h * scale).cast("int"), F.lit(1)).alias("_th"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resizer = _RESIZER
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "no image resizer installed in this environment; "
                    "call set_resizer(...) (image libs not in container)"
                )
            out = pdf.copy()
            out["payload"] = [
                resizer(bytes(p) if p is not None else b"", k, tw, th)
                for p, k, tw, th in zip(
                    pdf["payload"], pdf["media_kind"], pdf["_tw"], pdf["_th"]
                )
            ]
            out["meta"] = [
                {**(m if isinstance(m, dict) else m._asdict() if hasattr(m, "_asdict") else dict(m)),
                 "width": int(tw), "height": int(th)}
                for m, tw, th in zip(pdf["meta"], pdf["_tw"], pdf["_th"])
            ]
            yield out[["media_ref", "media_kind", "payload", "meta"]]

    return planned.mapInPandas(run, MEDIA_PAYLOAD_SCHEMA)
