from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.similarity import brute_force_topk, lsh_topk


def load(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return emb, queries


def test_brute_force_self_is_top1(spark, sf_dir):
    emb, queries = load(spark, sf_dir)
    top = brute_force_topk(emb, queries, k=5)
    first = {r["query_id"]: (r["corpus_id"], r["cosine"]) for r in top.filter("rank = 1").collect()}
    for qid, (cid, cos) in first.items():
        assert cid == qid and cos >= 0.999999  # self-match


def test_topk_exactly_k_rows_ordered(spark, sf_dir):
    emb, queries = load(spark, sf_dir)
    rows = brute_force_topk(emb, queries, k=7).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 7
        cosines = [r["cosine"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_recall_on_clustered_data(spark):
    """ANN recall is meaningful on clustered data (random noise has no
    neighborhood structure): 20 cluster centers × 25 members, query 5
    centers, expect the LSH path to recover most true neighbors."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 64))
    rows = []
    for ci, c in enumerate(centers):
        for m in range(25):
            v = c + rng.standard_normal(64) * 0.15
            rows.append((ci * 100 + m, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(ci * 100, [float(x) for x in centers[ci]]) for ci in range(5)],
        ["query_id", "embedding"],
    )
    exact = brute_force_topk(emb, queries, k=10)
    approx = lsh_topk(emb, queries, k=10, n_planes=8)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall


def test_lsh_self_match_on_random_data(spark, sf_dir):
    emb, queries = load(spark, sf_dir)
    approx = lsh_topk(emb, queries, k=10, n_planes=6)
    # self-match always survives bucketing (identical vector, same bucket)
    self_hits = {r["query_id"] for r in approx.filter("rank = 1").collect()
                 if r["query_id"] == r["corpus_id"]}
    assert len(self_hits) == 5
