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
import pandas
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
    impl: str = "expr",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (query_id, embedding). The join is a broadcast cross join
    (|queries| small); ranking is a window per query id with row_number,
    which AQE executes as a partial top-k, never a full global sort.

    ``impl='arrow'`` replaces the per-(row, query) HOF cosine with one
    normalized matmul per Arrow batch against the broadcast query
    matrix — measured on 1M×64 corpus, 5 queries, local[8]: 1.3 s vs
    7.4 s (5.7×, checksums equal). Default stays 'expr' so the oracled
    query shares DuckDB's exact fold-left summation; pick 'arrow' for
    the 100 TB corpus scan.
    """
    if impl == "arrow":
        qrows = sorted(
            (r[0], r[1]) for r in queries.select(query_id_col, vec_col).collect()
        )
        if not qrows:
            # np.vstack/norm on a 0-row matrix would crash; the expr path
            # produces the correctly-typed empty result for free
            return brute_force_topk(
                corpus, queries, k, id_col, vec_col, query_id_col, impl="expr"
            )
        if len(qrows) > 100_000:
            raise ValueError(
                f"brute_force_topk(impl='arrow') collects the query set to the "
                f"driver; got {len(qrows)} queries — partition the query set or "
                f"use lsh_topk/ivf_topk for query sets this large"
            )
        qmat = np.asarray([v for _, v in qrows], dtype=np.float64)
        qmat = qmat / np.maximum(
            np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12
        )
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def _cosines(vecs: pandas.Series) -> pandas.Series:
            m = np.vstack(vecs.to_numpy())
            mn = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return pandas.Series(list((m / mn) @ qmat.T))

        qid_lit = F.array(*[F.lit(qid) for qid, _ in qrows])
        scored = corpus.select(
            F.col(id_col).alias("corpus_id"),
            F.posexplode(_cosines(F.col(vec_col))).alias("_qi", "cosine"),
        ).select(
            F.element_at(qid_lit, F.col("_qi") + 1).alias("query_id"),
            "corpus_id",
            "cosine",
        )
    else:
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


def _bucket_arrow_udf(planes: list[list[float]]):
    """Arrow-batched sign-bucket assignment: one (batch × dim) @ (dim ×
    n_planes) matmul plus a bit-weight dot per batch, replacing n_planes
    interpreted aggregate-lambdas per row (`_bucket_expr`). Bit order
    matches _bucket_expr exactly: planes[0] is the MSB. Measured on a
    1M×64 corpus, 8 planes, local[8], best-of-3: arrow 0.51 s vs expr
    3.54 s (7.0×, identical bucket checksums)."""
    from pyspark.sql.functions import pandas_udf

    pm = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    weights = (1 << np.arange(len(planes) - 1, -1, -1)).astype(np.int64)

    @pandas_udf("long")
    def bucket(vecs: pandas.Series) -> pandas.Series:
        m = np.vstack(vecs.to_numpy())
        return pandas.Series(((m @ pm) > 0).astype(np.int64) @ weights)

    return bucket


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
    impl: str = "expr",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (plus hamming-1 probe buckets for recall). Same output schema
    as brute_force_topk; recall measured against it in tests.

    ``impl`` picks the CORPUS-side bucket assignment: 'expr' (pure
    columns — exact fold-left parity with the DuckDB oracle) or 'arrow'
    (one matmul per Arrow batch — the 100 TB corpus-scan path; see
    ``_bucket_arrow_udf`` for the measured speedup). The tiny query side
    always uses expressions. Sign disagreement between the paths needs a
    |dot| within accumulation error of zero — measure-zero for
    random-normal planes (same argument as the embedding-LSH oracle).
    At scale the corpus is bucketed ONCE and written
    ``partitionBy("bucket")``, so assignment is a one-time cost and
    probes become partition pruning."""
    planes = _hyperplanes(dim, n_planes, seed)
    if impl == "arrow":
        corpus_bucket = _bucket_arrow_udf(planes)(F.col(vec_col))
    else:
        corpus_bucket = _bucket_expr(vec_col, planes)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("_cv"),
        corpus_bucket.alias("bucket"),
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


def write_lsh_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    impl: str = "arrow",
) -> None:
    """Materialize the LSH-bucketed corpus: assign sign-buckets (Arrow
    matmul by default) and write ``partitionBy("bucket")`` — the one-time
    cost the multiprobe path amortizes; probes then read only matching
    bucket directories (partition pruning), never the full corpus."""
    planes = _hyperplanes(dim, n_planes, seed)
    if impl == "arrow":
        bucket = _bucket_arrow_udf(planes)(F.col(vec_col))
    else:
        bucket = _bucket_expr(vec_col, planes)
    corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv"), bucket.alias("bucket")
    ).write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    max_queries: int = 100_000,
) -> DataFrame:
    """Approximate top-k over a ``write_lsh_index`` table with static
    partition pruning: query buckets (plus hamming-1 probes) are
    computed driver-side from the same hyperplanes and pushed into the
    scan as ``bucket IN (...)``. Same output schema as lsh_topk."""
    from pyspark.sql import types as T

    planes = _hyperplanes(dim, n_planes, seed)
    pm = np.asarray(planes, dtype=np.float64)
    qrows = queries.select(query_id_col, vec_col).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"lsh_topk_indexed computes probes driver-side; got {len(qrows)} "
            f"queries (> {max_queries}) — split the query batch"
        )
    qid_type = queries.schema[query_id_col].dataType
    probe_schema = T.StructType(
        [
            T.StructField("query_id", qid_type, True),
            T.StructField("_qv", T.ArrayType(T.DoubleType()), True),
            T.StructField("bucket", T.LongType(), False),
        ]
    )
    probe_rows, probe_buckets = [], set()
    for qid, vec in qrows:
        bits = (pm @ np.asarray(vec, dtype=np.float64)) > 0
        base = 0
        for b in bits:  # planes[0] is the MSB, matching _bucket_expr
            base = base * 2 + int(b)
        buckets = [base] + (
            [base ^ (1 << b) for b in range(n_planes)] if multiprobe else []
        )
        for bk in buckets:
            probe_rows.append((qid, [float(x) for x in vec], bk))
            probe_buckets.add(bk)
    if not probe_rows:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", qid_type, True),
                    T.StructField("corpus_id", T.LongType(), True),
                    T.StructField("cosine", T.DoubleType(), True),
                    T.StructField("rank", T.IntegerType(), True),
                ]
            ),
        )
    probes = spark.createDataFrame(probe_rows, probe_schema)
    c = spark.read.parquet(index_path).filter(
        F.col("bucket").isin(sorted(probe_buckets))
    )
    scored = c.join(F.broadcast(probes), "bucket").select(
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cell-probed scale path
# ---------------------------------------------------------------------------


def _codebook(dim: int, nlist: int, seed: int) -> list[list[float]]:
    """Deterministic unit-norm codebook. At scale the codebook comes from
    ``train_codebook`` (k-means on a sample); the seeded random book is
    the bootstrap/initialization and keeps the whole pipeline (and its
    DuckDB oracle) reproducible with no training dependency."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((nlist, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def _cell_scores(vec, centroids: list[list[float]]):
    """Array of <v, c_i> dots, one per centroid — unit centroids make
    argmax(dot) ≡ argmax(cosine) without normalizing the data side."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(w) for w in c]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """(id, vec, cell): each vector keyed by its nearest-centroid cell
    (1-based; first-max wins on exact ties, matching ``array_position``
    and ``np.argmax`` alike). At 100 TB the corpus is written
    ``partitionBy("cell")`` so probes become partition pruning — the IVF
    twin of lsh_topk's pre-bucketed corpus story.

    ``impl='arrow'`` (default) assigns via one BLAS matmul per Arrow
    batch; ``'expr'`` uses the pure-column HOF formulation. Dense linear
    algebra is the one place the vectorized-UDF path beats codegen:
    measured on 1M×64 vectors, nlist=16, local[8], arrow = 1.3 s vs
    expr = 8.9 s (6.8×, identical assignments) — nlist interpreted
    aggregate-lambdas per row don't pipeline, a matmul does. The oracle
    query pins ``impl='expr'`` so the DuckDB twin shares the exact
    fold-left summation order."""
    if impl == "arrow":
        cell = _assign_arrow_udf(centroids)(F.col(vec_col))
    else:
        scores = _cell_scores(F.col(vec_col), centroids)
        cell = F.array_position(scores, F.array_max(scores))
    return df.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("_cv"),
        cell.alias("cell"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Approximate top-k via inverted-file probing: corpus vectors are
    scored only when they live in one of the query's ``nprobe`` best
    cells. Same output schema as brute_force_topk (recall measured
    against it in tests). ``impl`` picks the corpus assignment path
    (see ``ivf_assign``); the tiny query side always uses expressions.

    Plan shape: centroid dots are plan literals (no shuffle to assign);
    the probe list explodes to ``nprobe`` rows per query and the
    broadcast join against the (tiny) query side touches each corpus
    row once — one scan, one window top-k, zero corpus self-joins.
    Probe ordering tie-breaks (score desc, cell desc) are deterministic
    and mirrored exactly by the DuckDB oracle.
    """
    cents = centroids or _codebook(dim, nlist, seed)
    c = ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col, impl=impl)
    qscores = _cell_scores(F.col(vec_col), cents)
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    qscores, lambda s, i: F.struct(s.alias("s"), (i + 1).alias("c"))
                )
            )
        ),
        1,
        nprobe,
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(F.transform(ranked, lambda x: x["c"])).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").select(
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


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    dim: int = 64,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    impl: str = "arrow",
) -> list[list[float]]:
    """Materialize the IVF index: assign every corpus vector to its cell
    (Arrow matmul) and write ``partitionBy("cell")`` — the one-time cost
    that turns every later probe into PARTITION PRUNING instead of a full
    corpus scan. At 100 TB this is the difference between reading
    nprobe/nlist of the table per query batch and reading all of it.
    Returns the codebook (persist it next to the index in real use)."""
    cents = centroids or _codebook(dim, nlist, seed)
    ivf_assign(corpus, cents, impl=impl).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    return cents


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    nlist: int = 16,
    dim: int = 64,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
    probe_impl: str = "numpy",
) -> DataFrame:
    """Top-k over a ``write_ivf_index`` table with STATIC partition
    pruning: the query batch is small (ANN query sets are — guarded by
    ``max_queries``), so probe cells are computed driver-side and pushed
    into the scan as ``cell IN (...)`` — the plan's PartitionFilters
    prove only nprobe-cell directories are read (plan-asserted in
    tests/test_plans.py). Probe ranking tie-breaks (score desc, cell
    desc) match ``ivf_topk`` exactly, so results are identical to the
    unindexed operator on the same codebook.

    ``probe_impl``: 'numpy' (default — matmul probe scores, pairwise
    summation) or 'expr' — sequential left-to-right accumulation,
    bit-identical to the ``impl='expr'`` fold-left and DuckDB's
    list_dot_product; oracled queries pin 'expr' on BOTH the index build
    and the probe so a near-tie centroid score can never flip a cell
    assignment or probe ordering between the engines."""
    cents = centroids or _codebook(dim, nlist, seed)
    cmat = np.asarray(cents, dtype=np.float64)  # (nlist, dim)
    qrows = queries.select(query_id_col, vec_col).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_topk_indexed computes probes driver-side; got {len(qrows)} "
            f"queries (> {max_queries}) — split the query batch"
        )
    from pyspark.sql import types as T

    qid_type = queries.schema[query_id_col].dataType
    probe_schema = T.StructType(
        [
            T.StructField("query_id", qid_type, True),
            T.StructField("_qv", T.ArrayType(T.DoubleType()), True),
            T.StructField("cell", T.LongType(), False),
        ]
    )
    probe_rows = []
    probe_cells = set()
    for qid, vec in qrows:
        if probe_impl == "expr":
            # fold-left float accumulation, same op sequence as the expr
            # path's F.aggregate and DuckDB's list_dot_product
            scores = []
            for crow in cents:
                s = 0.0
                for cj, vj in zip(crow, vec):
                    s += cj * vj
                scores.append(s)
        else:
            scores = cmat @ np.asarray(vec, dtype=np.float64)
        # rank by (score desc, cell desc): sort keys mirror ivf_topk's
        # array_sort(struct(s, c)) reversed — identical tie handling
        order = sorted(range(len(scores)), key=lambda i: (scores[i], i + 1), reverse=True)
        for cell0 in order[:nprobe]:
            probe_rows.append((qid, [float(x) for x in vec], cell0 + 1))
            probe_cells.add(cell0 + 1)
    if not probe_rows:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", qid_type, True),
                    T.StructField("corpus_id", T.LongType(), True),
                    T.StructField("cosine", T.DoubleType(), True),
                    T.StructField("rank", T.IntegerType(), True),
                ]
            ),
        )
    probes = spark.createDataFrame(probe_rows, probe_schema)
    c = spark.read.parquet(index_path).filter(F.col("cell").isin(sorted(probe_cells)))
    scored = c.join(F.broadcast(probes), "cell").select(
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


def train_codebook(
    df: DataFrame,
    nlist: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd iterations: assign (centroid literals in-plan,
    no shuffle) → per-cell mean via posexplode + groupBy(cell, dim_pos)
    (map-side combine keeps the shuffle at nlist×dim rows) → collect the
    tiny codebook to the driver for the next round. Deterministic for a
    fixed seed and input. Empty cells keep their previous centroid.

    Runs ``iters`` Spark jobs over the sample ``df`` — train on a
    sample (it's a codebook, not a model), then ``ivf_assign`` the full
    corpus once with the result.
    """
    cents = _codebook(dim, nlist, seed)
    for _ in range(iters):
        assigned = ivf_assign(df, cents, id_col=vec_col, vec_col=vec_col).select(
            "cell", F.posexplode(F.col("_cv")).alias("pos", "x")
        )
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )
        for r in rows:
            cents[r["cell"] - 1] = [s["m"] for s in r["ms"]]
    return cents


def _assign_arrow_udf(centroids: list[list[float]]):
    """Arrow-batched argmax(dot) assignment: one BLAS matmul per batch.

    The expression path (`_cell_scores`) evaluates nlist interpreted
    HOF lambdas per row — fine for the tiny query side, but the corpus
    side at scale is dense linear algebra, exactly what a vectorized
    pandas UDF is for. Measured on 1M×64 vectors, nlist=16, local[8]:
    see ``ivf_assign`` docstring. Ties: np.argmax takes the first
    maximum, identical to ``array_position``."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64).T  # (dim, nlist)

    @pandas_udf("long")
    def assign(vecs: pandas.Series) -> pandas.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        return pandas.Series(np.argmax(m @ cents, axis=1) + 1)

    return assign


def embedding_validation(
    df,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    expected_dim: int | None = None,
    norm_lo: float | None = None,
    norm_hi: float | None = None,
):
    """ANN-ingest gate: violation rows for malformed embedding vectors —
    the similarity pipeline's analog of the span-pack structural rules
    (a NaN that reaches the dot-product stage poisons every similarity
    it touches; a wrong-dim vector crashes the Arrow matmul batch).

    Rules (id, fired when):
      E1_NULL_VECTOR  vector IS NULL
      E2_WRONG_DIM    size != expected_dim               (detail: dim=N)
      E3_NON_FINITE   any NaN/±Inf element            (detail: count)
      E4_ZERO_NORM    all elements 0 (finite vectors only)
      E5_NORM_RANGE   L2 norm outside [norm_lo, norm_hi] (finite,
                      nonzero vectors only)
    A NULL vector fires ONLY E1; E4/E5 are guarded on finiteness so one
    bad element doesn't cascade into three rows for the same cause.

    Scale shape (100 TB): everything is array expressions in ONE
    map-only projection over the (id, vec) pruned columns — the fold
    for sum-of-squares and the exists() probe run inside codegen, no
    explode of the vector, no shuffle, no Python; the k checks share
    the project-array-then-explode shape of check_constraint_violations
    so one scan serves all rules. Output is violation-sparse.
    """
    from pyspark.sql import functions as F

    v = F.col(vec_col)
    vd = F.transform(v, lambda x: x.cast("double"))
    sumsq = F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x)
    norm = F.sqrt(sumsq)
    n_nonfinite = F.size(
        F.filter(vd, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))))
    )
    finite = v.isNotNull() & (n_nonfinite == 0)

    checks: list[tuple[str, object, object]] = [
        ("E1_NULL_VECTOR", v.isNull(), F.lit("vector is NULL")),
    ]
    if expected_dim is not None:
        checks.append(
            (
                "E2_WRONG_DIM",
                v.isNotNull() & (F.size(v) != F.lit(expected_dim)),
                F.concat(F.lit("dim="), F.size(v).cast("string")),
            )
        )
    checks.append(
        (
            "E3_NON_FINITE",
            v.isNotNull() & (n_nonfinite > 0),
            F.concat(F.lit("n_nonfinite="), n_nonfinite.cast("string")),
        )
    )
    checks.append(("E4_ZERO_NORM", finite & (sumsq == 0.0), F.lit("zero vector")))
    if norm_lo is not None or norm_hi is not None:
        lo = 0.0 if norm_lo is None else norm_lo
        out_of_range = (norm > F.lit(norm_hi)) if norm_hi is not None else F.lit(False)
        out_of_range = out_of_range | (norm < F.lit(lo))
        checks.append(
            (
                "E5_NORM_RANGE",
                finite & (sumsq > 0.0) & out_of_range,
                F.lit(f"norm out of [{lo}, {norm_hi}]"),
            )
        )

    fails = F.filter(
        F.array(
            *[
                F.when(cond, F.lit(i)).otherwise(F.lit(None).cast("int"))
                for i, (_, cond, _) in enumerate(checks)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    rid = F.element_at(F.array(*[F.lit(r) for r, _, _ in checks]), F.col("_i") + 1)
    detail = F.element_at(F.array(*[d for _, _, d in checks]), F.col("_i") + 1)
    return (
        df.select(F.col(id_col).alias("vec_id"), v.alias(vec_col), F.explode(fails).alias("_i"))
        .select("vec_id", rid.alias("rule_id"), detail.alias("detail"))
    )


# ---------------------------------------------------------------------------
# scalar quantization — int8 embeddings for memory-bandwidth-bound ANN
# ---------------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", bits: int = 8
) -> DataFrame:
    """Symmetric per-vector scalar quantization to int8: q_i =
    floor(v_i · 127 / scale + 0.5) with scale = max|v_i| — the standard
    4× memory cut for brute-force/IVF scans, whose inner loop is
    memory-bandwidth-bound (the ANN benches here measure exactly that):
    reading a 10^9-vector corpus at float32 is 256 GB per probe batch;
    int8 is 64 GB with the per-vector scale re-applied once per dot
    product, and cosine is SCALE-INVARIANT per vector, so ranking by
    quantized dot products against a float query only suffers the
    rounding term (≲0.4% of max amplitude per component).

    Appends (q: array<int>, scale: double). Zero/empty/NULL vectors get
    scale 0 and an all-zero/NULL q — dequantize to the zero vector.
    Pure array expressions (floor/div are exact IEEE, identical in any
    engine — the oracle certifies bit-equality); map-only, no shuffle.

    ``bits`` sets the grid (default int8: ±(2^(bits-1) − 1)).
    """
    qmax = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col)
    vd = F.transform(v, lambda x: x.cast("double"))
    scale = F.coalesce(
        F.array_max(F.transform(vd, lambda x: F.abs(x))), F.lit(0.0)
    )
    # tinyint, not int: array<int> is int32 in Arrow/parquet — storing the
    # grid at 4 bytes/component would silently forfeit the whole 4× read
    # win the quantization exists for
    q = F.when(
        F.col("_q_scale") > 0,
        F.transform(
            vd, lambda x: F.floor(x * qmax / F.col("_q_scale") + F.lit(0.5)).cast("tinyint")
        ),
    ).otherwise(F.transform(vd, lambda x: F.lit(0).cast("tinyint")))
    return (
        df.withColumn("_q_scale", scale)
        .withColumn("q", q)
        .withColumnRenamed("_q_scale", "scale")
    )


def dequantize_embeddings(
    df: DataFrame, q_col: str = "q", scale_col: str = "scale", bits: int = 8
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: v̂_i = q_i · scale / 127 as
    array<double> in column ``dq``. Exact same constant both ways, so
    quantize→dequantize is a pure function of the stored pair."""
    qmax = float((1 << (bits - 1)) - 1)
    return df.withColumn(
        "dq",
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col) / qmax),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    impl: str = "expr",
    corpus_q: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN over the int8-quantized corpus — the production
    bandwidth shape: stage 1 ranks every corpus vector by the QUANTIZED
    cosine (the per-vector scale cancels out of cosine, so the int8 grid
    alone scores the scan at 1/4 the bytes of float32), keeps k·rerank
    candidates per query; stage 2 re-scores only those against the
    float corpus via an equi-join (candidate side is k·rerank·|queries|
    rows → AQE broadcasts it) and emits the exact top-k.

    ``corpus_q``: a pre-materialized quantized index (id, q) — the
    production path: quantize ONCE at ingest, persist, and stage 1 then
    reads ONLY the int8 table (``corpus`` float vectors are touched just
    for the candidate re-rank). Omitted → quantized on the fly from
    ``corpus`` (convenient, but the scan then reads float bytes and the
    bandwidth win evaporates; scripts/quantized_ann_bench.py measures
    both).

    Both ranks order by the 6-decimal-rounded score with corpus_id
    tiebreak (the tfidf determinism contract), so candidate sets are
    engine-portable. Zero-scale (zero/NULL) corpus vectors are excluded
    from scoring — cosine is undefined for them (the E4 ingest rule
    exists to catch these upstream).

    ``impl='arrow'``: one int8 matmul per Arrow batch against the
    broadcast query matrix — the inner loop a 10^9-vector scan actually
    runs; 'expr' keeps the fold shared with the DuckDB oracle.
    """
    if corpus_q is not None:
        # (id, q, scale) — quantize_embeddings' output persisted; scale
        # guards the zero vector exactly like the inline path
        qc = corpus_q.filter(F.col("scale") > 0)
    else:
        qc = quantize_embeddings(corpus, vec_col).filter(F.col("scale") > 0)
    qs = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    if impl == "arrow":
        qrows = sorted((r[0], r[1]) for r in qs.collect())
        if not qrows:
            return quantized_topk(corpus, queries, k, rerank, id_col, vec_col,
                                  query_id_col, impl="expr")
        qmat = np.asarray([v for _, v in qrows], dtype=np.float64)
        qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def _qcos(qvecs: pandas.Series) -> pandas.Series:
            m = np.vstack(qvecs.to_numpy()).astype(np.float64)  # int8 grid widened once
            mn = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return pandas.Series(list((m / mn) @ qmat.T))

        qid_lit = F.array(*[F.lit(qid) for qid, _ in qrows])
        scored = qc.select(
            F.col(id_col).alias("corpus_id"),
            F.posexplode(_qcos(F.col("q"))).alias("_qi", "_qcos"),
        ).select(
            F.element_at(qid_lit, F.col("_qi") + 1).alias("query_id"),
            "corpus_id",
            F.round("_qcos", 6).alias("quantized_cosine"),
        )
    else:
        qd = F.transform(F.col("q"), lambda x: x.cast("double"))
        scored = (
            qc.select(F.col(id_col).alias("corpus_id"), qd.alias("_qd"))
            .crossJoin(F.broadcast(qs))
            .select(
                "query_id",
                "corpus_id",
                F.round(cosine_similarity(F.col("_qd"), F.col("_qv")), 6).alias(
                    "quantized_cosine"
                ),
            )
        )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("quantized_cosine"), F.asc("corpus_id")
    )
    cand = (
        scored.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k * rerank)
        .drop("_r")
    )
    re = (
        cand.join(
            corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")),
            "corpus_id",
        )
        .join(F.broadcast(qs), "query_id")
        .select(
            "query_id",
            "corpus_id",
            "quantized_cosine",
            F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        re.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "quantized_cosine", "cosine", "rank")
    )


def centroid_drift(
    df,
    vec_col: str = "embedding",
    group_col: str = "label",
) -> "DataFrame":
    """X139: embedding-space distribution drift per group — the vector
    modality's seat in the drift family (PSI/KL for categorical kinds,
    KS/EMD for scalars, THIS for array<float> columns): each group's
    centroid compared to the global centroid by cosine and by norm
    ratio. A group whose centroid swings away from the corpus (cosine
    drops) or collapses/inflates (norm ratio moves off 1) signals a
    shifted embedding distribution — a new model version writing into
    an old table, a poisoned source, a re-normalization bug — long
    before per-vector checks (embedding_validation) fire.

    Scale shape: ONE posexplode of the vectors into (group, dim, v) is
    immediately reduced by groupBy(group, dim) with map-side combine —
    the shuffle carries |groups| x dim partial sums, never vectors. The
    global centroid derives from the SAME reduced table (no second
    scan), is dim rows, and broadcasts into a |groups| x dim join; the
    cosine/norm arithmetic happens on that grid. NULL vectors are
    ignored (embedding_validation owns flagging them).

    Determinism: elements are float32 read exactly into doubles; sums
    of ~n doubles differ across engines only in last-ulp association
    noise, absorbed by the 6-decimal rounding of the two final metrics
    (same contract as the ANN cosine oracles).
    """
    from pyspark.sql import functions as F

    ex = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    per = ex.groupBy("grp", "dim").agg(
        F.sum(F.col("v").cast("double")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    glob = per.groupBy("dim").agg(
        (F.sum("s") / F.sum("n")).alias("gc"),
    )
    cent = per.select("grp", "dim", (F.col("s") / F.col("n")).alias("c"), "n")
    j = cent.join(F.broadcast(glob), "dim")
    return (
        j.groupBy("grp")
        .agg(
            F.max("n").alias("n_vecs"),
            F.sum(F.col("c") * F.col("gc")).alias("dot"),
            F.sum(F.col("c") * F.col("c")).alias("nc"),
            F.sum(F.col("gc") * F.col("gc")).alias("ng"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_vecs",
            # a zero-norm centroid (all-zero vectors in a group, or a
            # degenerate corpus) has no direction: cosine is undefined,
            # so emit NULL rather than NaN (embedding_validation's
            # E4_ZERO_NORM owns flagging the vectors themselves)
            F.when(
                (F.col("nc") > 0) & (F.col("ng") > 0),
                F.round(
                    F.col("dot") / (F.sqrt(F.col("nc")) * F.sqrt(F.col("ng"))), 6
                ),
            ).alias("centroid_cosine"),
            F.when(
                F.col("ng") > 0, F.round(F.sqrt(F.col("nc")) / F.sqrt(F.col("ng")), 6)
            ).alias("norm_ratio"),
        )
    )
