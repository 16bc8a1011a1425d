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


def test_ivf_recall_on_clustered_data(spark):
    """Same clustered fixture as the LSH recall test: IVF probing nprobe
    of nlist cells must recover most true top-10 neighbors."""
    import numpy as np

    from zparse_spark.operators.similarity import ivf_topk

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
    approx = ivf_topk(emb, queries, k=10, nprobe=4, nlist=16)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall


def test_ivf_self_match_and_determinism(spark, sf_dir):
    from zparse_spark.operators.similarity import ivf_topk

    emb, queries = load(spark, sf_dir)
    out1 = ivf_topk(emb, queries, k=10)
    out2 = ivf_topk(emb, queries, k=10)
    rows1 = sorted(map(tuple, out1.collect()))
    assert rows1 == sorted(map(tuple, out2.collect()))
    self_hits = {r["query_id"] for r in out1.filter("rank = 1").collect()
                 if r["query_id"] == r["corpus_id"]}
    assert len(self_hits) == 5  # a vector always probes its own cell


def test_train_codebook_improves_assignment(spark):
    """Lloyd iterations on clustered data: trained centroids give higher
    mean best-cell dot score than the seeded random book, and training
    is deterministic."""
    import numpy as np

    from zparse_spark.operators.similarity import (
        _codebook,
        _cell_scores,
        train_codebook,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 64)) * 2
    rows = []
    for ci, c in enumerate(centers):
        for m in range(30):
            v = c + rng.standard_normal(64) * 0.1
            rows.append((ci * 100 + m, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def mean_best(cents):
        return (
            emb.select(F.array_max(_cell_scores(F.col("embedding"), cents)).alias("s"))
            .agg(F.avg("s"))
            .first()[0]
        )

    random_book = _codebook(64, 8, 42)
    trained = train_codebook(emb, nlist=8, dim=64, iters=3, seed=42)
    trained2 = train_codebook(emb, nlist=8, dim=64, iters=3, seed=42)
    assert trained == trained2
    assert mean_best(trained) > mean_best(random_book)


def test_ivf_arrow_and_expr_assignments_agree(spark, sf_dir):
    from zparse_spark.operators.similarity import _codebook, ivf_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = _codebook(64, 16, 42)
    a = {r["corpus_id"]: r["cell"]
         for r in ivf_assign(emb, cents, impl="arrow").collect()}
    e = {r["corpus_id"]: r["cell"]
         for r in ivf_assign(emb, cents, impl="expr").collect()}
    assert a == e


def test_brute_force_arrow_agrees_with_expr(spark, sf_dir):
    emb, queries = load(spark, sf_dir)
    emb = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = queries.select("query_id", F.col("embedding").cast("array<double>").alias("embedding"))
    e = {(r["query_id"], r["corpus_id"], r["rank"], r["cosine"])
         for r in brute_force_topk(emb, queries, k=10, impl="expr").collect()}
    a = {(r["query_id"], r["corpus_id"], r["rank"], r["cosine"])
         for r in brute_force_topk(emb, queries, k=10, impl="arrow").collect()}
    assert e == a


def test_ivf_and_brute_force_on_empty_corpus(spark):
    from pyspark.sql import types as T

    from zparse_spark.operators.similarity import brute_force_topk, ivf_topk

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    q = spark.createDataFrame(
        [(0, [1.0] * 64)],
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    assert brute_force_topk(empty, q, k=5).count() == 0
    assert ivf_topk(empty, q, k=5, impl="expr").count() == 0
    assert ivf_topk(empty, q, k=5, impl="arrow").count() == 0


def test_lsh_arrow_buckets_and_results_agree(spark, sf_dir):
    """The arrow corpus-bucket path must produce identical buckets (and
    therefore identical top-k) to the expr path on real embeddings."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import _hyperplanes
    from zparse_spark.operators.similarity import (
        _bucket_arrow_udf,
        _bucket_expr,
        lsh_topk,
    )

    emb, queries = load(spark, sf_dir)
    planes = _hyperplanes(64, 8, 42)
    both = emb.select(
        _bucket_expr("embedding", planes).alias("b_expr"),
        _bucket_arrow_udf(planes)(F.col("embedding")).alias("b_arrow"),
    )
    assert both.filter("b_expr <> b_arrow").count() == 0

    r_expr = sorted(map(tuple, lsh_topk(emb, queries, k=5, impl="expr").collect()))
    r_arrow = sorted(map(tuple, lsh_topk(emb, queries, k=5, impl="arrow").collect()))
    assert r_expr == r_arrow


def test_brute_force_arrow_empty_queries(spark, sf_dir):
    """Empty query frame must return an empty, correctly-typed result
    on the arrow path (previously crashed in np.linalg.norm)."""
    from zparse_spark.operators.similarity import brute_force_topk

    emb, queries = load(spark, sf_dir)
    out = brute_force_topk(emb, queries.limit(0), k=5, impl="arrow")
    assert out.count() == 0
    assert out.columns == ["query_id", "corpus_id", "cosine", "rank"]


def test_lsh_index_pruning_and_equivalence(spark, sf_dir, tmp_path):
    """write_lsh_index + lsh_topk_indexed: probed buckets reach the scan
    as partition filters, and results equal the unindexed lsh_topk."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.similarity import (
        lsh_topk,
        lsh_topk_indexed,
        write_lsh_index,
    )

    emb, queries = load(spark, sf_dir)
    # double vectors on both paths: the indexed probe side carries
    # float64 query vectors, so float32 inputs would differ in the 6th
    # cosine decimal between the two formulations
    emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    queries = queries.withColumn("embedding", F.col("embedding").cast("array<double>"))
    idx = str(tmp_path / "lsh_index")
    write_lsh_index(emb, idx, n_planes=8)
    out = lsh_topk_indexed(spark, idx, queries, k=5, n_planes=8)

    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and any("bucket" in l for l in scan)

    base = lsh_topk(emb, queries, k=5, n_planes=8)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))


def test_embedding_validation_rules_matrix(spark):
    """Each damage class fires exactly its own rule: NULL fires only E1
    (no cascade), wrong dim reports the dim, one NaN or one Inf fires
    E3 with the count, zero vector fires E4 only (finiteness-guarded),
    norm range fires E5 only for finite nonzero vectors, and a healthy
    vector emits nothing."""
    from zparse_spark.operators.similarity import embedding_validation

    rows = [
        (0, None),
        (1, [1.0, 0.0]),              # healthy (dim 2)
        (2, [1.0, 0.0, 0.0]),         # wrong dim
        (3, [float("nan"), 1.0]),     # one NaN
        (4, [float("inf"), 1.0]),     # one Inf
        (5, [0.0, 0.0]),              # zero norm
        (6, [300.0, 400.0]),          # norm 500 > hi
        (7, [0.001, 0.0]),            # norm below lo
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(3)
    out = embedding_validation(df, expected_dim=2, norm_lo=0.5, norm_hi=50.0)
    got = sorted((r["vec_id"], r["rule_id"], r["detail"]) for r in out.collect())
    assert got == [
        (0, "E1_NULL_VECTOR", "vector is NULL"),
        (2, "E2_WRONG_DIM", "dim=3"),
        (3, "E3_NON_FINITE", "n_nonfinite=1"),
        (4, "E3_NON_FINITE", "n_nonfinite=1"),
        (5, "E4_ZERO_NORM", "zero vector"),
        (6, "E5_NORM_RANGE", "norm out of [0.5, 50.0]"),
        (7, "E5_NORM_RANGE", "norm out of [0.5, 50.0]"),
    ]


def test_embedding_validation_plan_no_python_no_shuffle(spark):
    """The whole gate is one map-only array-expression projection."""
    from zparse_spark.operators.similarity import embedding_validation

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    plan = (
        embedding_validation(df, expected_dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_quantize_embeddings_contract(spark):
    """Hand grid: [0.5, -0.25, 1.0] at scale 1.0 → q = [64, -31, 127]
    (floor(x·127 + 0.5): 63.5→63? no — 0.5·127+0.5 = 64.0 → 64;
    -0.25·127+0.5 = -31.25 → floor → -32? -31.75+0.5 = -31.25 →
    floor = -32 is wrong — verify against python below). Bounds stay in
    [-127, 127], zero/NULL vectors degrade to scale 0 / all-zero q, and
    dequantized cosine ≥ 0.995 on random unit-ish vectors."""
    import math

    from zparse_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    def ref_q(vals):
        s = max((abs(x) for x in vals), default=0.0)
        if s == 0:
            return [0] * len(vals), 0.0
        return [math.floor(x * 127.0 / s + 0.5) for x in vals], s

    rows = [
        ("a", [0.5, -0.25, 1.0]),
        ("zero", [0.0, 0.0, 0.0]),
        ("null", None),
        ("neg", [-1.0, 0.3, -0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for vid, vals in rows:
        if vals is None:
            assert got[vid]["q"] is None and got[vid]["scale"] == 0.0
            continue
        exp_q, exp_s = ref_q([float(np_f32(x)) for x in vals])
        assert got[vid]["q"] == exp_q, (vid, got[vid]["q"], exp_q)
        assert abs(got[vid]["scale"] - exp_s) < 1e-12
        assert all(-127 <= q <= 127 for q in got[vid]["q"])
    # cosine preservation on a real-ish batch
    vecs = spark.range(1, 51).selectExpr(  # id=0 would be the zero vector
        "CAST(id AS STRING) AS vec_id",
        "transform(sequence(1, 64), i -> CAST(sin(id * i * 0.37) AS FLOAT)) AS embedding",
    )
    dq = dequantize_embeddings(quantize_embeddings(vecs))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, t: s + t)

    cos = dot(v, F.col("dq")) / (F.sqrt(dot(v, v)) * F.sqrt(dot(F.col("dq"), F.col("dq"))))
    assert dq.select(F.min(cos).alias("m")).first()["m"] >= 0.995


def np_f32(x):
    import numpy as np

    return np.float32(x)


def test_quantized_topk_arrow_matches_expr(spark):
    """The production int8-matmul path must produce the identical final
    ranking as the oracled expr fold, and recall@k vs exact brute force
    must be perfect on well-separated synthetic vectors (rounding can't
    reorder them)."""
    from zparse_spark.operators.similarity import brute_force_topk, quantized_topk

    corpus = spark.range(1, 301).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 32), i -> CAST(sin(id * i * 0.61) AS FLOAT)) AS embedding",
    )
    qs = corpus.limit(4).selectExpr("vec_id AS query_id", "embedding")
    expr = quantized_topk(corpus, qs, k=5, rerank=4, impl="expr").collect()
    arrow = quantized_topk(corpus, qs, k=5, rerank=4, impl="arrow").collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["corpus_id"], r["cosine"]) for r in rows)  # noqa: E731
    assert key(expr) == key(arrow)
    exact = brute_force_topk(corpus, qs, k=5)
    exact_set = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    quant_set = {(r["query_id"], r["corpus_id"]) for r in expr}
    assert quant_set == exact_set  # rerank=4 buys back full recall here


def test_centroid_drift_hand_case(spark):
    """X139. Orthogonal groups: A all [1,0], B all [0,1] -> global
    centroid [0.5,0.5]; cosine(A,G)=1/sqrt(2), norm_ratio=sqrt(2).
    Identical groups -> cosine 1, ratio 1. NULL vectors ignored."""
    import math

    from zparse_spark.operators.similarity import centroid_drift

    rows = [(0, [1.0, 0.0]) for _ in range(4)] + [(1, [0.0, 1.0]) for _ in range(4)]
    df = spark.createDataFrame(rows + [(0, None)], "label int, embedding array<float>")
    out = {r["label"]: r for r in centroid_drift(df, "embedding", "label").collect()}
    assert out[0]["n_vecs"] == 4 and out[1]["n_vecs"] == 4  # NULL ignored
    for lbl in (0, 1):
        assert abs(out[lbl]["centroid_cosine"] - 1 / math.sqrt(2)) < 1e-6
        assert abs(out[lbl]["norm_ratio"] - math.sqrt(2)) < 1e-6

    same = spark.createDataFrame(
        [(g, [0.6, 0.8]) for g in (0, 1) for _ in range(3)],
        "label int, embedding array<float>",
    )
    out2 = {r["label"]: r for r in centroid_drift(same, "embedding", "label").collect()}
    for lbl in (0, 1):
        assert abs(out2[lbl]["centroid_cosine"] - 1.0) < 1e-6
        assert abs(out2[lbl]["norm_ratio"] - 1.0) < 1e-6


def test_centroid_drift_zero_norm_group_is_null_not_nan(spark):
    from zparse_spark.operators.similarity import centroid_drift

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (0, [0.0, 0.0]), (1, [1.0, 0.0])],
        "label int, embedding array<float>",
    )
    out = {r["label"]: r for r in centroid_drift(df, "embedding", "label").collect()}
    assert out[0]["centroid_cosine"] is None  # undefined, not NaN
    assert out[1]["centroid_cosine"] is not None
