"""Interleaver invariants: determinism, strictly increasing offsets,
referential closure with the derived catalog, text reassembly."""

from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.canonical import span_fingerprint
from zparse_spark.sources.interleave import derive_media_catalog, interleave_documents
from zparse_spark.sources.readers import load_documents


def test_deterministic_across_runs_and_parallelism(spark, sf_dir):
    flat = load_documents(spark, sf_dir)
    a = interleave_documents(flat)
    b = interleave_documents(flat.repartition(13))  # different layout
    fa = {r["doc_id"]: r["fp"] for r in a.select("doc_id", span_fingerprint(F.col("spans")).alias("fp")).collect()}
    fb = {r["doc_id"]: r["fp"] for r in b.select("doc_id", span_fingerprint(F.col("spans")).alias("fp")).collect()}
    assert fa == fb


def test_offsets_strictly_increasing(spark, sf_dir):
    docs = interleave_documents(load_documents(spark, sf_dir))
    bad = docs.select(
        F.size(
            F.filter(
                F.transform(F.col("spans"), lambda s, i: F.struct(s.alias("s"), i.alias("i"))),
                lambda x: (x["i"] >= 1)
                & (x["s"]["offset"] <= F.element_at(F.col("spans"), x["i"].cast("int"))["offset"]),
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert bad == 0


def test_media_refs_all_join_catalog(spark, sf_dir):
    docs = interleave_documents(load_documents(spark, sf_dir), n_media_refs=1024)
    cat = derive_media_catalog(spark, n_media_refs=1024)
    refs = docs.select(F.explode("spans").alias("s")).select(
        F.col("s.media_ref").alias("media_ref")
    ).filter(F.col("media_ref").isNotNull())
    dangling = refs.join(cat, "media_ref", "left_anti").count()
    assert dangling == 0
    assert refs.count() > 0  # interleaving actually produced media spans


def test_text_reassembles(spark, sf_dir):
    """Concatenating text spans in offset order reproduces the flat text —
    the parse∘serialize = identity property (tests/property_tests.rs:121-156
    analog) for the interleaver."""
    flat = load_documents(spark, sf_dir)
    docs = interleave_documents(flat)
    rebuilt = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == "text"), lambda s: s["text"]
            ),
            "",
        ).alias("rebuilt"),
    )
    joined = rebuilt.join(
        flat.select(F.col("doc_id").cast("string").alias("doc_id"), "text"), "doc_id"
    )
    mismatches = joined.filter(F.col("rebuilt") != F.col("text")).count()
    assert mismatches == 0
