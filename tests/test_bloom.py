"""Bloom bitmap + exact probe-side pruning (operators/rules.py
bloom_bitmap / bloom_prune / referential_violations strategy='bloom').

The load-bearing claim is EXACTNESS: a Bloom of the probe keys has no
false negatives, so pruning the other side of an equi/anti join never
changes the join result — every test here compares against the plain
anti-join across adversarial regimes (tiny bitmap = FP-heavy, empty
catalog = all-dangling fallback, decoy-inflated catalog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.rules import (
    bloom_bitmap,
    bloom_prune,
    referential_violations,
)
from tests.conftest import make_docs


def _cat(spark, names):
    return spark.createDataFrame([(n,) for n in names], "media_ref string")


def test_prune_is_exact_for_anti_join(spark):
    cat = spark.range(0, 5000).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_ref")
    )
    refs = spark.range(0, 600, 3).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_ref")
    ).union(
        spark.range(0, 40).select(F.concat(F.lit("x"), F.col("id")).alias("media_ref"))
    )
    bm = bloom_bitmap(refs.distinct(), "media_ref", n_words=128, n_hashes=5)
    pruned = bloom_prune(cat, "media_ref", bm, n_words=128, n_hashes=5)
    n_cat, n_pruned = cat.count(), pruned.count()
    assert n_pruned < n_cat  # the prune actually prunes
    assert n_pruned >= 200  # and keeps every true member (200 m-refs)
    a = sorted(r.media_ref for r in refs.join(cat, "media_ref", "left_anti").collect())
    b = sorted(
        r.media_ref for r in refs.join(pruned, "media_ref", "left_anti").collect()
    )
    assert a == b and len(a) == 40


def test_fp_heavy_bitmap_still_exact(spark):
    # 1 word = 64 bits for 100 keys: nearly every probe is a false
    # positive — the prune keeps almost everything, the RESULT is
    # still exact (FPs cost bytes, never correctness)
    cat = spark.range(0, 500).select(F.col("id").cast("string").alias("media_ref"))
    refs = spark.range(0, 100).select(F.col("id").cast("string").alias("media_ref"))
    bm = bloom_bitmap(refs, "media_ref", n_words=1, n_hashes=2)
    pruned = bloom_prune(cat, "media_ref", bm, n_words=1, n_hashes=2)
    a = sorted(r.media_ref for r in refs.join(cat, "media_ref", "left_anti").collect())
    b = sorted(
        r.media_ref for r in refs.join(pruned, "media_ref", "left_anti").collect()
    )
    assert a == b == []


def test_bitmap_is_mergeable(spark):
    half1 = spark.range(0, 50).select(F.col("id").cast("string").alias("k"))
    half2 = spark.range(50, 100).select(F.col("id").cast("string").alias("k"))
    both = half1.union(half2)
    merged = (
        bloom_bitmap(half1, "k", 32, 4)
        .unionByName(bloom_bitmap(half2, "k", 32, 4))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    direct = bloom_bitmap(both, "k", 32, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def _r1_rows(df):
    return sorted(
        (r.partition, r.doc_id, r.span_pos, r.offset, r.message)
        for r in df.collect()
    )


def _pack(spark):
    return make_docs(
        spark,
        [
            ("d1", [("text", "a", None, 0), ("image", None, "ok1", 1)], "p0"),
            ("d2", [("image", None, "bad1", 0), ("audio", None, "ok2", 1)], "p0"),
            ("d3", [("video", None, "bad2", 0)], "p1"),
            ("d4", [("text", "b", None, 0)], "p1"),
        ],
    )


def test_strategy_bloom_matches_plain_and_distinct(spark):
    docs = _pack(spark)
    cat = _cat(spark, ["ok1", "ok2", "unused1", "unused2"])
    plain = _r1_rows(referential_violations(docs, cat))
    dist = _r1_rows(referential_violations(docs, cat, strategy="distinct"))
    bloom = _r1_rows(referential_violations(docs, cat, strategy="bloom"))
    assert plain == dist == bloom
    assert len(bloom) == 2  # bad1, bad2


def test_strategy_bloom_empty_and_wrong_catalog(spark):
    docs = _pack(spark)
    # empty catalog: every ref dangles — the all-dangling regime that
    # also exercises the distinct path's broadcast-budget guard
    empty = _cat(spark, []).filter(F.lit(False))
    assert len(_r1_rows(referential_violations(docs, empty, strategy="bloom"))) == 4
    # wrong catalog: zero overlap with the refs
    wrong = _cat(spark, [f"w{i}" for i in range(64)])
    assert _r1_rows(
        referential_violations(docs, wrong, strategy="bloom")
    ) == _r1_rows(referential_violations(docs, wrong))
