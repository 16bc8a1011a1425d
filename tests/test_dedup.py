from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_duplicates,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"
NEAR = "the quick brown fox jumps over the lazy dog and runs far away tonight"
DIFF = "completely different content about spark distributed validation engines"


def corpus(spark):
    rows = [
        ("d1", BASE),
        ("d2", BASE),  # exact dup of d1 (after normalization)
        ("d3", "  The Quick  brown fox jumps over the lazy dog and runs far away today "),  # normalized dup
        ("d4", NEAR),  # near dup
        ("d5", DIFF),
        ("d6", "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark):
    got = exact_duplicates(corpus(spark)).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 3 and got[0]["keep_id"] == "d1" and got[0]["max_id"] == "d3"


def test_shingles_and_signature_deterministic(spark):
    df = corpus(spark).select("doc_id", shingles(F.col("text")).alias("sh"))
    sh = {r["doc_id"]: set(r["sh"]) for r in df.collect()}
    assert "the quick brown" in sh["d1"]
    assert sh["d1"] == sh["d3"]
    sig_df = corpus(spark).select(
        "doc_id", minhash_signature(shingles(F.col("text")), 32).alias("sig")
    )
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in sig_df.collect()}
    assert sigs["d1"] == sigs["d2"] == sigs["d3"]
    assert len(sigs["d1"]) == 32
    # near dup shares most minhashes, different doc shares few
    share_near = sum(a == b for a, b in zip(sigs["d1"], sigs["d4"]))
    share_diff = sum(a == b for a, b in zip(sigs["d1"], sigs["d5"]))
    assert share_near > share_diff


def test_minhash_lsh_pipeline(spark):
    pairs = minhash_dedup(corpus(spark), threshold=0.6, n_hashes=64, n_bands=16)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert ("d1", "d2") in got and got[("d1", "d2")] == 1.0
    assert ("d1", "d3") in got
    assert ("d1", "d4") in got and 0.6 <= got[("d1", "d4")] < 1.0
    assert not any("d5" in p for p in got)


def test_lsh_candidates_never_cross_join(spark):
    cands = minhash_lsh_candidates(corpus(spark))
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_jaccard_verification_rejects_low_overlap(spark):
    df = corpus(spark)
    cand = spark.createDataFrame([("d1", "d5")], ["id_a", "id_b"])
    assert ngram_jaccard_pairs(df, cand, threshold=0.5).count() == 0


def test_simhash_near_duplicates(spark):
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_near_duplicates(corpus(spark), max_hamming=7).collect()}
    assert ("d1", "d2") in got and got[("d1", "d2")] == 0
    assert ("d1", "d3") in got and got[("d1", "d3")] == 0
    assert ("d1", "d4") in got and got[("d1", "d4")] <= 7  # near dup in budget
    assert ("d1", "d5") not in got


def test_embedding_near_duplicates(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    v1 = rng.standard_normal(64)
    v2 = v1 + rng.standard_normal(64) * 0.01  # near dup
    v3 = rng.standard_normal(64)  # unrelated
    df = spark.createDataFrame(
        [("e1", [float(x) for x in v1]), ("e2", [float(x) for x in v2]), ("e3", [float(x) for x in v3])],
        ["vec_id", "embedding"],
    )
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           embedding_near_duplicates(df, dim=64, threshold=0.99).collect()}
    assert ("e1", "e2") in got and got[("e1", "e2")] > 0.99
    assert len(got) == 1
