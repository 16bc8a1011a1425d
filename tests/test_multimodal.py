from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zparse_spark.multimodal import (
    deterministic_fake_decoder,
    extract_features,
    frame_sample_plan,
    set_decoder,
    synthesize_payloads,
)
from zparse_spark.sources.interleave import derive_media_catalog


@pytest.fixture()
def payloads(spark):
    cat = derive_media_catalog(spark, n_media_refs=64)
    return synthesize_payloads(spark, cat)


def test_payload_synthesis_deterministic(spark, payloads):
    a = {r["media_ref"]: bytes(r["payload"]) for r in payloads.collect()}
    b = {r["media_ref"]: bytes(r["payload"]) for r in payloads.collect()}
    assert a == b and len(a) == 64
    assert all(len(v) == 64 for v in a.values())  # 128 hex chars → 64 bytes


def test_extract_features_with_fake_decoder(spark, payloads):
    set_decoder(deterministic_fake_decoder)
    try:
        feats = extract_features(payloads)
        rows = feats.collect()
        assert len(rows) == 64
        for r in rows:
            assert r["n_bytes"] == 64
            assert len(r["feature"]) == 8
            assert r["feature"][0] == 64.0  # n
        # arrow path, not row-at-a-time python
        plan = feats._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    finally:
        set_decoder(None)


def test_extract_features_without_decoder_raises(spark, payloads):
    set_decoder(None)
    feats = extract_features(payloads.limit(1))
    with pytest.raises(Exception, match="no media decoder"):
        feats.collect()


def test_frame_sample_plan_jvm_side(spark, payloads):
    frames = frame_sample_plan(payloads, every_ms=200)
    rows = frames.collect()
    # duration 1000ms / 200ms = 5 frames per video payload
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r["ts_ms"])
    for ref, ts in by_ref.items():
        assert sorted(ts) == [0, 200, 400, 600, 800]
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # bookkeeping stays JVM-side


def test_resize_images_plans_dims_jvm_side(spark):
    from zparse_spark.multimodal import (
        deterministic_fake_resizer,
        resize_images,
        set_resizer,
        synthesize_payloads,
    )
    from pyspark.sql import functions as F

    cat = spark.createDataFrame(
        [("m1", "image"), ("m2", "image"), ("m3", "audio")],
        ["media_ref", "media_kind"],
    )
    payloads = synthesize_payloads(spark, cat)
    # give m2 an oversized frame so only it shrinks
    payloads = payloads.withColumn(
        "meta",
        F.when(
            F.col("media_ref") == "m2",
            F.struct(
                F.lit(1024).alias("width"), F.lit(512).alias("height"),
                F.col("meta.sample_rate").alias("sample_rate"),
                F.col("meta.duration_ms").alias("duration_ms"),
                F.col("meta.codec").alias("codec"),
            ),
        ).otherwise(F.col("meta")),
    )

    set_resizer(deterministic_fake_resizer)
    try:
        out = {r["media_ref"]: r for r in resize_images(payloads, max_side=256).collect()}
    finally:
        set_resizer(None)

    assert set(out) == {"m1", "m2"}  # audio rows never reach Python
    # m1 is 64x64, under the cap: dims unchanged
    assert (out["m1"]["meta"]["width"], out["m1"]["meta"]["height"]) == (64, 64)
    assert len(out["m1"]["payload"]) == 64 * 64
    # m2 1024x512 -> scale 0.25 -> 256x128, aspect preserved
    assert (out["m2"]["meta"]["width"], out["m2"]["meta"]["height"]) == (256, 128)
    assert len(out["m2"]["payload"]) == 256 * 128


def test_resize_images_requires_resizer(spark):
    import pytest

    from zparse_spark.multimodal import resize_images, synthesize_payloads

    cat = spark.createDataFrame([("m1", "image")], ["media_ref", "media_kind"])
    with pytest.raises(Exception, match="resizer"):
        resize_images(synthesize_payloads(spark, cat)).collect()
