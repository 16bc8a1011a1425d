"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k — broadcast the (small) query
  set against the corpus; one scan, per-partition partial top-k via
  window row_number (Spark pushes the rank filter into a TopK sort).
- lsh_topk: the scale path — random-hyperplane bucketing with
  multi-probe (hamming-1 neighbors of the query bucket) so the scan
  touches only matching buckets. At 100 TB the corpus side is
  pre-bucketed and written partitioned-by-bucket, turning the probe
  into partition pruning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zparse_spark.operators.dedup import _hyperplanes, cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (query_id, embedding). The join is a broadcast cross join
    (|queries| small); ranking is a window per query id with row_number,
    which AQE executes as a partial top-k, never a full global sort.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    vec = F.col(vec_col)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(w) for w in p]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in planes
    ]
    out = F.lit(0).cast("long")
    for b in bits:
        out = out * 2 + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (plus hamming-1 probe buckets for recall). Same output schema
    as brute_force_topk; recall measured against it in tests."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("_cv"),
        _bucket_expr(vec_col, planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _bucket_expr(vec_col, planes).alias("_qbucket"),
    )
    if multiprobe:
        # hamming-1 neighbors: flip each plane bit (static shift amounts)
        probes = F.array(
            F.col("_qbucket"),
            *[F.col("_qbucket").bitwiseXOR(F.lit(1 << b).cast("long")) for b in range(n_planes)],
        )
    else:
        probes = F.array(F.col("_qbucket"))
    q = qb.select("query_id", "_qv", F.explode(probes).alias("bucket"))
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "corpus_id",
        cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
