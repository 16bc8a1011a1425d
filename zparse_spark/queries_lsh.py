"""LSH dedup oracle queries — MinHash and SimHash, DuckDB-gated.

Round 1 left ``dedup_minhash_documents`` / ``dedup_simhash_documents``
rows-only because xxhash64 has no DuckDB counterpart. These rebuild the
same pipelines on portable hash primitives — md5 hex strings (min is
plain lexicographic) and md5-nibble bit extraction (ascii arithmetic) —
so DuckDB can reproduce every stage: shingle → signature → band buckets
→ candidate self-join → exact verification. The xxhash64 path stays the
production default (tests assert the md5 path finds the same verified
pairs); the hot-bucket cap is disabled here (its sampling hash is not
portable) and is pytest-gated instead.
"""

from __future__ import annotations

from zparse_spark.queries import register

_SEED = 42
_N_HASHES = 64
_N_BANDS = 16
_ROWS_PER_BAND = _N_HASHES // _N_BANDS
_JACCARD_T = 0.8
_N_BITS = 64
_BAND_BITS = 8
_SIM_BANDS = _N_BITS // _BAND_BITS
_MAX_HAMMING = 3

# normalized text + word-3-shingles — the SQL twin of
# functions.text.normalize_text and operators.dedup.shingles(mode='word')
_NORM_SH_TAIL = """,
norm AS (
  SELECT doc_id, lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS t
  FROM input
),
toks AS (SELECT doc_id, string_split(t, ' ') AS w, t FROM norm),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN
           list_distinct(list_transform(range(1, len(w) - 1),
                                        i -> array_to_string(w[i:i+2], ' ')))
         ELSE [t] END AS sh
  FROM toks
)"""

_SHINGLE_CTE = (
    """
base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
input AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT 'dup_' || doc_id, text FROM base WHERE CAST(doc_id AS BIGINT) % 10 = 0
)"""
    + _NORM_SH_TAIL
)

_min_cols = ",\n         ".join(
    f"min(md5(s || ':{h}:{_SEED}')) AS h{h}" for h in range(_N_HASHES)
)
_band_rows = "\n  UNION ALL\n".join(
    "  SELECT doc_id, {b} AS band, md5({cc}) AS bucket FROM sig".format(
        b=b,
        cc=" || ',' || ".join(f"h{b * _ROWS_PER_BAND + j}" for j in range(_ROWS_PER_BAND)),
    )
    for b in range(_N_BANDS)
)

_MINHASH_SQL = f"""WITH{_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sig AS (
  SELECT doc_id,
         {_min_cols}
  FROM ex GROUP BY doc_id
),
banded AS (
{_band_rows}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
ver AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS j
  FROM cand
  JOIN sh a ON a.doc_id = cand.id_a
  JOIN sh b ON b.doc_id = cand.id_b
)
SELECT id_a, id_b, round(j, 6) AS jaccard FROM ver WHERE j >= {_JACCARD_T}"""


@register("dedup_minhash_documents", _MINHASH_SQL)
def dedup_minhash_documents(spark, sf_dir):
    """MinHash→LSH→Jaccard near-dup pairs on planted duplicates, md5
    hash family — the full pipeline (signature, banding, candidate join,
    exact verify) reproduced stage-for-stage by the DuckDB oracle."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup

    d = _docs_with_planted(spark, sf_dir, F)
    return minhash_dedup(d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED)


def _docs_with_planted(spark, sf_dir, F):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    planted = d.filter(F.col("doc_id").cast("long") % 10 == 0).select(
        F.concat(F.lit("dup_"), F.col("doc_id")).alias("doc_id"), "text"
    )
    return d.unionByName(planted)


# --- Capped-pipeline twin: the hot-bucket cap IS oracle-gated ----------
#
# The scale guard itself (cap_hot_buckets) runs inside the oracled
# pipeline here: a planted 40-copy boilerplate cluster makes every band
# bucket hot (40 > max_bucket=8), the md5-derived keep-hash samples the
# same survivors in both engines, and the verified pair set after
# truncation must agree exactly. hot-bucket membership counts are
# oracled separately so the round record shows the truncation FIRED.

_CAP_MB = 8
_N_BOILER = 40
_BOILER_TEXT = (
    "lorem ipsum boilerplate navigation footer copyright terms privacy contact about us"
)

_BOILER_SHINGLE_CTE = (
    f"""
base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
input AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT 'boiler_' || lpad(CAST(j AS VARCHAR), 2, '0'), '{_BOILER_TEXT}'
  FROM unnest(range({_N_BOILER})) t(j)
)"""
    + _NORM_SH_TAIL
)


def _hv_sql(col: str) -> str:
    """First 8 hex nibbles of md5(col) as an integer — the SQL twin of
    cap_hot_buckets(sample_hash='md5')'s F.conv(substring(md5,1,8),16,10)."""
    m = f"md5({col})"
    terms = []
    for k in range(8):
        c = f"ascii(substr({m}, {k + 1}, 1))"
        nib = f"CAST(CASE WHEN {c} >= 97 THEN {c} - 87 ELSE {c} - 48 END AS BIGINT)"
        terms.append(f"{nib} * {16 ** (7 - k)}")
    return "(" + " + ".join(terms) + ")"


_CAPPED_SQL = f"""WITH{_BOILER_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sig AS (
  SELECT doc_id,
         {_min_cols}
  FROM ex GROUP BY doc_id
),
banded AS (
{_band_rows}
),
bcnt AS (
  SELECT band, bucket, count(*) AS n FROM banded GROUP BY band, bucket
  HAVING count(*) > {_CAP_MB}
),
capped AS (
  SELECT b.doc_id, b.band, b.bucket
  FROM banded b LEFT JOIN bcnt c USING (band, bucket)
  WHERE c.n IS NULL
     OR ({_hv_sql('b.doc_id')} % CAST(ceil(CAST(c.n AS DOUBLE) / {_CAP_MB}) AS BIGINT)) = 0
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM capped l JOIN capped r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
ver AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS j
  FROM cand
  JOIN sh a ON a.doc_id = cand.id_a
  JOIN sh b ON b.doc_id = cand.id_b
)
SELECT id_a, id_b, round(j, 6) AS jaccard FROM ver WHERE j >= {_JACCARD_T}"""


def _docs_with_boiler(spark, sf_dir):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    boiler = spark.range(_N_BOILER).select(
        F.concat(F.lit("boiler_"), F.lpad(F.col("id").cast("string"), 2, "0")).alias("doc_id"),
        F.lit(_BOILER_TEXT).alias("text"),
    )
    return d.unionByName(boiler)


@register("dedup_minhash_capped", _CAPPED_SQL)
def dedup_minhash_capped(spark, sf_dir):
    """MinHash near-dup pairs WITH the hot-bucket cap active
    (max_bucket=8 against a planted 40-copy boilerplate cluster): the
    deterministic md5 keep-hash truncation is reproduced by DuckDB, so
    the oracle certifies the capped pipeline — the exact plan shape a
    100 TB run uses — not just the exhaustive small-data variant."""
    from zparse_spark.operators.dedup import minhash_dedup

    d = _docs_with_boiler(spark, sf_dir)
    return minhash_dedup(
        d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=_CAP_MB, seed=_SEED
    )


_HOT_STATS_SQL = f"""WITH{_BOILER_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sig AS (
  SELECT doc_id,
         {_min_cols}
  FROM ex GROUP BY doc_id
),
banded AS (
{_band_rows}
)
SELECT band, bucket, CAST(count(*) AS BIGINT) AS n_members
FROM banded GROUP BY band, bucket HAVING count(*) > {_CAP_MB}"""


@register("dedup_lsh_hot_bucket_stats", _HOT_STATS_SQL)
def dedup_lsh_hot_bucket_stats(spark, sf_dir):
    """The truncation evidence: per-(band, bucket) membership of every
    hot bucket the cap trims — non-empty by construction (the planted
    boilerplate cluster floods all 16 bands), value-matched by DuckDB."""
    from zparse_spark.operators.dedup import hot_bucket_stats, minhash_banded

    d = _docs_with_boiler(spark, sf_dir)
    banded = minhash_banded(d, hash_fn="md5", seed=_SEED)
    return hot_bucket_stats(banded, ["band", "bucket"], _CAP_MB)


# --- SimHash twin: md5-nibble bit votes --------------------------------

def _nib_sql(b: int) -> str:
    pos = b // 4 + 1
    return (
        f"(CASE WHEN ascii(substr(m, {pos}, 1)) >= 97 "
        f"THEN ascii(substr(m, {pos}, 1)) - 87 "
        f"ELSE ascii(substr(m, {pos}, 1)) - 48 END)"
    )


_vote_cols = ",\n         ".join(
    f"sum(CASE WHEN (({_nib_sql(b)} >> {b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(_N_BITS)
)
_bit = lambda b: f"(CASE WHEN v{b} > 0 THEN 1 ELSE 0 END)"  # noqa: E731
_band_vals = ",\n         ".join(
    "("
    + " + ".join(
        f"{_bit(band * _BAND_BITS + j)} * {1 << (_BAND_BITS - 1 - j)}" for j in range(_BAND_BITS)
    )
    + f") AS b{band}"
    for band in range(_SIM_BANDS)
)
_sim_band_rows = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band, b{b} AS bucket FROM sig" for b in range(_SIM_BANDS)
)
_hamming = " + ".join(f"bit_count(xor(a.b{b}, bb.b{b}))" for b in range(_SIM_BANDS))

_SIMHASH_SQL = f"""WITH{_SHINGLE_CTE},
tok AS (SELECT doc_id, md5(unnest(w)) AS m FROM toks),
votes AS (
  SELECT doc_id,
         {_vote_cols}
  FROM tok GROUP BY doc_id
),
sig AS (
  SELECT doc_id,
         {_band_vals}
  FROM votes
),
banded AS (
{_sim_band_rows}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
ham AS (
  SELECT id_a, id_b, ({_hamming}) AS hamming
  FROM cand
  JOIN sig a ON a.doc_id = cand.id_a
  JOIN sig bb ON bb.doc_id = cand.id_b
)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
FROM ham WHERE hamming <= {_MAX_HAMMING}"""


@register("dedup_simhash_documents", _SIMHASH_SQL)
def dedup_simhash_documents(spark, sf_dir):
    """SimHash near-dup pairs, md5-nibble bit family — band bucketing
    and exact hamming verification mirrored bit-for-bit in DuckDB."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import simhash_near_duplicates

    d = _docs_with_planted(spark, sf_dir, F)
    return simhash_near_duplicates(d, max_hamming=_MAX_HAMMING, hash_fn="md5", max_bucket=0)


# --- Embedding near-dup twin: literal-hyperplane sign LSH --------------
#
# The production path (operators.dedup.embedding_near_duplicates) already
# uses a DETERMINISTIC hyperplane matrix (seeded numpy literals baked into
# the plan), so the oracle needs no portable-hash substitute at all: the
# same 16x64 doubles are emitted as DuckDB list literals (repr() gives the
# shortest round-tripping decimal, which both engines parse back to the
# identical IEEE double). Sign ties would be the only cross-engine risk
# (fold-left vs DuckDB's dot-product order) and require |dot| within
# accumulation error of 0 — measure-zero for random-normal planes.

_E_DIM = 64
_E_PLANES = 16
_E_SEED = 42
_E_THRESHOLD = 0.95


def _embedding_oracle_sql() -> str:
    from zparse_spark.operators.dedup import _hyperplanes

    planes = _hyperplanes(_E_DIM, _E_PLANES, _E_SEED)
    bits = " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(w) for w in p)
        + "]) > 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    return f"""WITH base AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
input AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 1000000, list_transform(v, x -> x + 0.02) FROM base
  WHERE vec_id % 10 = 0
),
sig AS (
  SELECT vec_id, v, {bits} AS bucket FROM input
),
ver AS (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         list_dot_product(l.v, r.v)
           / greatest(sqrt(list_dot_product(l.v, l.v))
                      * sqrt(list_dot_product(r.v, r.v)), 1e-12) AS c
  FROM sig l JOIN sig r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
)
SELECT id_a, id_b, round(c, 6) AS cosine FROM ver WHERE c >= {_E_THRESHOLD}"""


@register("dedup_embedding_documents", _embedding_oracle_sql())
def dedup_embedding_documents(spark, sf_dir):
    """Embedding cosine near-dup pairs via sign-hyperplane LSH, planted
    +0.02 perturbed duplicates — bucketing AND exact cosine verification
    reproduced by DuckDB from the identical hyperplane literals."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import embedding_near_duplicates

    d = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    planted = d.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )
    return embedding_near_duplicates(
        d.unionByName(planted),
        id_col="vec_id",
        vec_col="embedding",
        dim=_E_DIM,
        n_planes=_E_PLANES,
        threshold=_E_THRESHOLD,
        seed=_E_SEED,
        max_bucket=0,
    )


# --- IVF-ANN twin: literal-codebook cell probing ------------------------

_IVF_NLIST = 16
_IVF_NPROBE = 4
_IVF_K = 10
_IVF_NQ = 5


# everything downstream of the cents CTE is codebook-agnostic: the same
# assignment/probe/top-k twin verifies the seeded-literal codebook AND a
# trained codebook read back from parquet
_IVF_TAIL = """,
input AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
scored AS (
  SELECT vec_id, cell, list_dot_product(v, cv) AS s FROM input CROSS JOIN cents
),
mx AS (SELECT vec_id, max(s) AS ms FROM scored GROUP BY vec_id),
assign AS (
  -- first-max wins, matching Spark's array_position on exact ties
  SELECT s.vec_id, min(s.cell) AS cell
  FROM scored s JOIN mx ON s.vec_id = mx.vec_id AND s.s = mx.ms
  GROUP BY s.vec_id
),
qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS pr
    FROM scored WHERE vec_id < {nq}
  ) WHERE pr <= {nprobe}
),
cand AS (
  SELECT q.query_id, a.vec_id AS corpus_id, qi.v AS qv, ci.v AS cv
  FROM qprobe q
  JOIN assign a ON a.cell = q.cell
  JOIN input qi ON qi.vec_id = q.query_id
  JOIN input ci ON ci.vec_id = a.vec_id
),
cos AS (
  SELECT query_id, corpus_id,
         list_dot_product(qv, cv)
           / greatest(sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv)), 1e-12) AS c
  FROM cand
),
topk AS (
  SELECT query_id, corpus_id, c,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, corpus_id ASC) AS rank
  FROM cos
)
SELECT query_id, corpus_id, round(c, 6) AS cosine, CAST(rank AS INT) AS rank
FROM topk WHERE rank <= {k}"""


def _ivf_oracle_sql() -> str:
    from zparse_spark.operators.similarity import _codebook

    cents = _codebook(64, _IVF_NLIST, _SEED)
    cent_rows = "\n  UNION ALL\n".join(
        f"  SELECT {i + 1} AS cell, [" + ", ".join(repr(w) for w in c) + "] AS cv"
        for i, c in enumerate(cents)
    )
    tail = _IVF_TAIL.format(nq=_IVF_NQ, nprobe=_IVF_NPROBE, k=_IVF_K)
    return f"WITH cents AS (\n{cent_rows}\n){tail}"


@register("similarity_ivf_topk_embeddings", _ivf_oracle_sql())
def similarity_ivf_topk_embeddings(spark, sf_dir):
    """IVF-ANN top-k with the seeded literal codebook — cell assignment,
    nprobe probe ranking (score desc, cell desc), and exact-cosine
    re-ranking reproduced stage-for-stage by DuckDB from the identical
    centroid literals."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.similarity import ivf_topk

    d = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    q = d.filter(F.col("vec_id") < _IVF_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        d, q, k=_IVF_K, nprobe=_IVF_NPROBE, nlist=_IVF_NLIST, seed=_SEED,
        impl="expr",  # exact fold-left parity with the DuckDB twin
    )


@register("similarity_ivf_indexed_embeddings", _ivf_oracle_sql())
def similarity_ivf_indexed_embeddings(spark, sf_dir):
    """The pre-bucketed IVF story, oracle-gated: the corpus is written
    partitionBy(cell) once (write_ivf_index), then probed with STATIC
    partition pruning (cell IN (...) reaches the scan's
    PartitionFilters — plan-asserted in test_plans). Same codebook and
    tie-breaks as similarity_ivf_topk_embeddings, so the same DuckDB
    twin verifies the results."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.similarity import ivf_topk_indexed, write_ivf_index

    d = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    idx = "/root/repo/spark-warehouse/oracle/ivf_index"
    # impl/probe_impl pinned to the fold-left 'expr' path: the DuckDB twin
    # scores cells with list_dot_product (sequential accumulation), and a
    # near-tie centroid score under numpy's pairwise summation could flip
    # an assignment or probe ordering. Bench paths keep the arrow default.
    cents = write_ivf_index(d, idx, nlist=_IVF_NLIST, seed=_SEED, impl="expr")
    q = d.filter(F.col("vec_id") < _IVF_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_indexed(
        spark, idx, q, k=_IVF_K, nprobe=_IVF_NPROBE, nlist=_IVF_NLIST,
        seed=_SEED, centroids=cents, probe_impl="expr",
    )


# --- Cluster resolution twin: recursive-CTE connected components -------


def _cluster_oracle_sql() -> str:
    """Components over the md5-MinHash verified pairs: the iterative
    min-label propagation's fixpoint equals min(reachable id) per node,
    which DuckDB computes directly with a recursive CTE over the SAME
    pair SQL."""
    head, _, final = _MINHASH_SQL.rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    return f"""{head.replace("WITH", "WITH RECURSIVE", 1)},
pairs AS (
  {pairs_select}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
)
SELECT node AS doc_id, min(r) AS rep_id FROM reach GROUP BY node"""


@register("dedup_clusters_documents", _cluster_oracle_sql())
def dedup_clusters_documents(spark, sf_dir):
    """Near-dup pairs → connected components → per-doc representative:
    Spark's iterative min-label propagation (checkpointed joins) against
    DuckDB's recursive-CTE transitive closure over the identical pair
    set — the fixpoints must agree exactly."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup, resolve_duplicate_clusters

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED)
    return resolve_duplicate_clusters(pairs)


# --- Quality-prior representatives twin: closure + argmax window -------


def _reps_quality_oracle_sql() -> str:
    """Same recursive-CTE closure as the cluster twin, then the
    representative is re-chosen per component by the portable md5
    pseudo-score (argmax, ties to min id) — the quality-prior keep
    policy with an engine-independent score."""
    head, _, final = _MINHASH_SQL.rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    hv = _hv_sql("node")
    return f"""{head.replace("WITH", "WITH RECURSIVE", 1)},
pairs AS (
  {pairs_select}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
scored AS (SELECT node, component, {hv} AS q FROM comp),
best AS (
  SELECT component, node AS rep_id,
         row_number() OVER (PARTITION BY component ORDER BY q DESC, node ASC) AS rk
  FROM scored
)
SELECT s.node AS doc_id, b.rep_id
FROM scored s JOIN best b ON b.component = s.component AND b.rk = 1"""


@register("dedup_reps_quality", _reps_quality_oracle_sql())
def dedup_reps_quality(spark, sf_dir):
    """Quality-prior cluster representatives: min-label components, but
    the kept doc is the component's argmax of a per-doc score (here the
    portable md5 pseudo-score so both engines derive the identical
    value; in production this is a quality/token-count column). Ties
    break to min id — fully deterministic either way."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup, select_representatives

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED)
    scored = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id")), 1, 8), 16, 10)
        .cast("long")
        .alias("q"),
    )
    return select_representatives(scored, pairs, prefer_col="q")


# --- Trained-codebook IVF twin: Lloyd-trained centroids, table-fed -----

_IVF_W = "/root/repo/spark-warehouse/oracle"


def _ivf_trained_oracle_sql() -> str:
    """Same assignment/probe/top-k twin as the literal-codebook oracle,
    but the cents CTE reads the TRAINED centroids the Spark side
    persisted to parquet this run — parquet round-trips float64 exactly,
    so DuckDB scores against bit-identical centroid values."""
    tail = _IVF_TAIL.format(nq=_IVF_NQ, nprobe=_IVF_NPROBE, k=_IVF_K)
    return (
        "WITH cents AS (\n"
        f"  SELECT cell, cv FROM read_parquet('{_IVF_W}/ivf_trained_cents/*.parquet')\n"
        f"){tail}"
    )


@register("similarity_ivf_trained_embeddings", _ivf_trained_oracle_sql())
def similarity_ivf_trained_embeddings(spark, sf_dir):
    """The FULL IVF story oracle-gated end to end: distributed Lloyd
    training (2 deterministic iterations from the seeded codebook) →
    trained centroids persisted → index materialized partitionBy(cell)
    → probed with static partition pruning. Earlier rounds oracled only
    the seeded random codebook; this closes the trained-codebook gap —
    DuckDB re-derives cells, probes and top-k from the exact trained
    centroid doubles. Fold-left 'expr' impl on both build and probe
    (same near-tie rationale as similarity_ivf_indexed_embeddings)."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.similarity import (
        ivf_topk_indexed,
        train_codebook,
        write_ivf_index,
    )

    d = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = train_codebook(d, nlist=_IVF_NLIST, iters=2, seed=_SEED)
    spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(cents)], "cell int, cv array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{_IVF_W}/ivf_trained_cents")
    idx = f"{_IVF_W}/ivf_trained_index"
    write_ivf_index(d, idx, nlist=_IVF_NLIST, centroids=cents, impl="expr")
    q = d.filter(F.col("vec_id") < _IVF_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_indexed(
        spark, idx, q, k=_IVF_K, nprobe=_IVF_NPROBE, nlist=_IVF_NLIST,
        centroids=cents, probe_impl="expr",
    )


# --- Deep-graph cluster twin: 50-deep chains, O(log n) star rounds -----

_CHAIN_N = 2000
_CHAIN_LEN = 50
# 8 alternations resolve a 49-edge path (~log2 rounds); min-label
# propagation would need ~50 — the gate row itself is the O(log n) proof
_CHAIN_MAX_ITER = 8


def _chain_cluster_oracle_sql() -> str:
    return f"""WITH RECURSIVE pairs AS (
  SELECT 'doc_' || lpad(CAST(i AS VARCHAR), 5, '0') AS id_a,
         'doc_' || lpad(CAST(i + 1 AS VARCHAR), 5, '0') AS id_b
  FROM unnest(range({_CHAIN_N - 1})) AS t(i)
  WHERE (i + 1) % {_CHAIN_LEN} <> 0
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
)
SELECT node AS doc_id, min(r) AS rep_id FROM reach GROUP BY node"""


@register("dedup_clusters_chain", _chain_cluster_oracle_sql())
def dedup_clusters_chain(spark, sf_dir):
    """Large-star/small-star connected components on the adversarial
    graph shape that defeats min-label propagation: 40 planted chains of
    depth 50. resolve_duplicate_clusters_star is capped at 8 rounds —
    far under the 50 propagation would need — so a green row certifies
    BOTH the labels (DuckDB recursive-CTE closure over the identical
    pair set) and the O(log n) convergence claim."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import resolve_duplicate_clusters_star

    def fmt(c):
        return F.concat(F.lit("doc_"), F.lpad(c.cast("string"), 5, "0"))

    ids = spark.range(_CHAIN_N - 1).filter((F.col("id") + 1) % _CHAIN_LEN != 0)
    pairs = ids.select(fmt(F.col("id")).alias("id_a"), fmt(F.col("id") + 1).alias("id_b"))
    return resolve_duplicate_clusters_star(pairs, max_iter=_CHAIN_MAX_ITER)


# --- Incremental LSH admission: delta probes a materialized band index ---

_INC_MINHASH_SQL = f"""WITH
corpus0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  WHERE doc_id % 4 <> 0
),
delta0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  WHERE doc_id % 4 = 0
  UNION ALL
  SELECT 'nd_' || CAST(doc_id AS VARCHAR), text || ' extra extra'
  FROM documents WHERE doc_id % 20 = 1
),
input AS (
  SELECT doc_id, text FROM corpus0
  UNION ALL
  SELECT doc_id, text FROM delta0
),
sides AS (
  SELECT doc_id, 'corpus' AS side FROM corpus0
  UNION ALL
  SELECT doc_id, 'delta' FROM delta0
){_NORM_SH_TAIL},
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sig AS (
  SELECT doc_id,
         {_min_cols}
  FROM ex GROUP BY doc_id
),
banded0 AS (
{_band_rows}
),
banded AS (SELECT b.*, s.side FROM banded0 b JOIN sides s USING (doc_id))
SELECT d.doc_id AS delta_id, c.doc_id AS other_id,
       count(*) AS n_shared_bands, 'corpus' AS other_side
FROM banded d JOIN banded c
  ON d.band = c.band AND d.bucket = c.bucket
 AND d.side = 'delta' AND c.side = 'corpus'
GROUP BY 1, 2
UNION ALL
SELECT l.doc_id, r.doc_id, count(*), 'delta'
FROM banded l JOIN banded r
  ON l.band = r.band AND l.bucket = r.bucket
 AND l.side = 'delta' AND r.side = 'delta' AND l.doc_id < r.doc_id
GROUP BY 1, 2"""


@register("dedup_incremental_minhash", _INC_MINHASH_SQL)
def dedup_incremental_minhash(spark, sf_dir):
    """Incremental near-dup admission: the corpus is banded ONCE into a
    materialized index and each delta batch (fresh docs + planted
    ' extra extra' near-dup variants of corpus docs) probes it by
    (band, bucket) with the delta side broadcast — the corpus is never
    re-banded and never self-joined, the batch-vs-batch
    dedup_minhash_documents shape a daily ingest must not pay. md5 hash
    family so DuckDB rebuilds signature -> bands -> probe stage-for-
    stage; within-delta candidates ride the same banding."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import incremental_minhash_candidates, minhash_banded

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    did = F.col("doc_id").cast("long")
    corpus = d.filter(did % 4 != 0)
    delta = d.filter(did % 4 == 0).unionByName(
        d.filter(did % 20 == 1).select(
            F.concat(F.lit("nd_"), "doc_id").alias("doc_id"),
            F.concat("text", F.lit(" extra extra")).alias("text"),
        )
    )
    kw = dict(n_hashes=_N_HASHES, n_bands=_N_BANDS, seed=_SEED, hash_fn="md5")
    index = minhash_banded(corpus, **kw)
    return incremental_minhash_candidates(index, delta, **kw)


# --- Candidate-generation quality gate: LSH recall/precision vs exact truth
#
# Fixture adds a MUTATED near-dup class alongside the exact 'dup_'
# plants: every 7th doc gets 5 + doc_id % 23 novel filler tokens
# appended, spreading exact Jaccard across the 0.8 threshold — so the
# candidate set contains genuine sub-threshold collisions (precision
# < 1 has something to measure) and the truth set contains
# barely-over-threshold pairs (recall is earned, not vacuous).

_MUT_SHINGLE_CTE = (
    """
base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
input AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT 'dup_' || doc_id, text FROM base WHERE CAST(doc_id AS BIGINT) % 10 = 0
  UNION ALL
  SELECT 'mut_' || doc_id,
         text || ' ' || array_to_string(
           list_transform(range(5 + CAST(doc_id AS BIGINT) % 23),
                          i -> 'zfill' || CAST(i AS VARCHAR)), ' ')
  FROM base WHERE CAST(doc_id AS BIGINT) % 7 = 0
)"""
    + _NORM_SH_TAIL
)


def _docs_with_mutants(spark, sf_dir):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    dup = d.filter(F.col("doc_id").cast("long") % 10 == 0).select(
        F.concat(F.lit("dup_"), F.col("doc_id")).alias("doc_id"), "text"
    )
    n_fill = F.lit(5) + F.col("doc_id").cast("long") % 23
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (n_fill - 1).cast("int")),
            lambda i: F.concat(F.lit("zfill"), i.cast("string")),
        ),
        " ",
    )
    mut = d.filter(F.col("doc_id").cast("long") % 7 == 0).select(
        F.concat(F.lit("mut_"), F.col("doc_id")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), filler).alias("text"),
    )
    return d.unionByName(dup).unionByName(mut)


_CAND_QUALITY_SQL = f"""WITH{_MUT_SHINGLE_CTE},
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sig AS (
  SELECT doc_id,
         {_min_cols}
  FROM ex GROUP BY doc_id
),
banded AS (
{_band_rows}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
        / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= {_JACCARD_T}
),
m AS (
  SELECT (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM cand) AS n_cand,
         (SELECT count(*) FROM cand JOIN truth USING (id_a, id_b)) AS n_hit
)
SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_cand AS BIGINT) AS n_cand,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(n_hit * 1.0 / nullif(n_truth, 0), 6) AS recall,
       round(n_hit * 1.0 / nullif(n_cand, 0), 6) AS precision
FROM m"""


@register("dedup_lsh_candidate_quality", _CAND_QUALITY_SQL)
def dedup_lsh_candidate_quality(spark, sf_dir):
    """Candidate-GENERATION quality of MinHash-LSH banding, measured
    against exact ground truth the engine itself produces: recall = the
    share of true >=0.8-Jaccard pairs (prefix-filter exact join, X83 —
    provably complete) that land in at least one shared band bucket
    BEFORE verification; precision = the share of raw banded candidates
    that are true pairs. X26 monitors the ANN embedding path; this is
    the same discipline for the text-dedup path — the number that tells
    you whether n_bands/n_hashes are spending verification budget well
    at the corpus's actual similarity profile. Uncapped md5 pipeline so
    the DuckDB twin reproduces every stage; one full-outer join of two
    pair sets, aggregated to a single metrics row."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_lsh_candidates
    from zparse_spark.operators.setsim import prefix_filter_jaccard_join

    docs = _docs_with_mutants(spark, sf_dir)
    cands = minhash_lsh_candidates(
        docs, hash_fn="md5", max_bucket=0, seed=_SEED
    ).select("id_a", "id_b", F.lit(1).alias("_c"))
    truth = prefix_filter_jaccard_join(docs, threshold=_JACCARD_T, k_shingle=3).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    full = cands.join(truth, ["id_a", "id_b"], "full_outer")
    return (
        full.agg(
            F.count("_t").alias("n_truth"),
            F.count("_c").alias("n_cand"),
            F.count(F.when(F.col("_c").isNotNull() & F.col("_t").isNotNull(), 1)).alias(
                "n_hit"
            ),
        )
        .select(
            "n_truth",
            "n_cand",
            "n_hit",
            F.round(F.col("n_hit") / F.nullif(F.col("n_truth"), F.lit(0)), 6).alias("recall"),
            F.round(F.col("n_hit") / F.nullif(F.col("n_cand"), F.lit(0)), 6).alias("precision"),
        )
    )


# --- Dedup yield report: cluster-size histogram + corpus removal share


def _yield_oracle_sql() -> str:
    base = _cluster_oracle_sql()
    head, _, final = base.rpartition("\nSELECT node AS doc_id")
    return f"""{head},
reps AS (SELECT node AS doc_id, min(r) AS rep_id FROM reach GROUP BY node),
cs AS (SELECT rep_id, count(*) AS size FROM reps GROUP BY rep_id),
tot AS (SELECT count(*) AS n FROM input)
SELECT size AS cluster_size, count(*) AS n_clusters,
       CAST((size - 1) * count(*) AS BIGINT) AS docs_removed,
       round((size - 1) * count(*) * 1.0 / any_value(tot.n), 6) AS removed_share
FROM cs, tot GROUP BY size"""


@register("dedup_yield_report", _yield_oracle_sql())
def dedup_yield_report(spark, sf_dir):
    """What dedup will actually DO to the corpus, before committing to
    it: cluster-size histogram over the verified near-dup components
    plus the per-size-class share of the corpus that keep-one-per-
    cluster would remove — the number a mix owner signs off on (a 1%
    yield doesn't justify the pipeline; a 30% yield from one size-2
    band suggests boilerplate, not true dups). Rides the oracled
    md5 pipeline end to end: pairs → components → sizes; every stage
    after the pair table is grid-sized."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup, resolve_duplicate_clusters

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED)
    reps = resolve_duplicate_clusters(pairs)
    cs = reps.groupBy("rep_id").agg(F.count(F.lit(1)).alias("size"))
    total = d.count()
    return cs.groupBy(F.col("size").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters")
    ).select(
        "cluster_size",
        "n_clusters",
        ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias("docs_removed"),
        F.round(
            (F.col("cluster_size") - 1) * F.col("n_clusters") / F.lit(int(total)), 6
        ).alias("removed_share"),
    )


# --- Cluster label-consistency audit (X186) ----------------------------


def _label_audit_oracle_sql() -> str:
    """Same recursive-CTE closure as the cluster twin, then each
    component's label variety is counted after the planted 'dup_' copies
    are relabeled (lang='xx', source='planted') — every planted
    component must surface as mixed."""
    head, _, final = _MINHASH_SQL.rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    return f"""{head.replace("WITH", "WITH RECURSIVE", 1)},
pairs AS (
  {pairs_select}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
labeled AS (
  SELECT c.node, c.component,
         CASE WHEN c.node LIKE 'dup_%' THEN 'xx' ELSE d.lang END AS lang,
         CASE WHEN c.node LIKE 'dup_%' THEN 'planted' ELSE d.source END AS source
  FROM comp c
  JOIN documents d
    ON CAST(d.doc_id AS VARCHAR) = replace(c.node, 'dup_', '')
)
SELECT component, count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       min(lang) AS lang_min, max(lang) AS lang_max
FROM labeled
GROUP BY component
HAVING count(DISTINCT lang) > 1 OR count(DISTINCT source) > 1"""


@register("dedup_cluster_label_audit", _label_audit_oracle_sql())
def dedup_cluster_label_audit(spark, sf_dir):
    """Metadata-consistency audit over near-dup clusters (X186):
    components whose members DISAGREE on lang or source — mislabeled
    metadata, crawler mirrors filed under different sources, or (as
    planted here: the 'dup_' copies carry lang='xx'/source='planted')
    corrupted label propagation. The keep-rule needs this list: picking
    a representative from a label-mixed cluster silently picks its
    metadata too. Pure composition of two oracled stages — md5-MinHash
    pairs → min-label components (X12 family) — plus ONE groupBy on the
    cluster-membership table (O(paired docs), never the corpus) with a
    broadcast-friendly join back to labels."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup, resolve_duplicate_clusters

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(
        d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED
    )
    comp = resolve_duplicate_clusters(pairs)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("base_id"), "lang", "source"
    )
    is_planted = F.col("doc_id").startswith("dup_")
    labeled = (
        comp.withColumn("base_id", F.regexp_replace("doc_id", "^dup_", ""))
        .join(base, "base_id")
        .select(
            F.col("rep_id").alias("component"),
            F.when(is_planted, F.lit("xx")).otherwise(F.col("lang")).alias("lang"),
            F.when(is_planted, F.lit("planted"))
            .otherwise(F.col("source"))
            .alias("source"),
        )
    )
    out = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("lang").alias("lang_min"),
        F.max("lang").alias("lang_max"),
    )
    return out.filter((F.col("n_langs") > 1) | (F.col("n_sources") > 1))


# --- Dedup token yield: the before/after-dedup TOKEN count (X189) -------


def _token_yield_oracle_sql() -> str:
    """Recursive-CTE closure over the md5-MinHash pairs (the X12 twin),
    then token mass before vs after keeping one representative per
    component (min id) plus every unpaired doc."""
    head, _, final = _MINHASH_SQL.rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    return f"""{head.replace("WITH", "WITH RECURSIVE", 1)},
pairs AS (
  {pairs_select}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, min(r) AS rep FROM reach GROUP BY node),
tok AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                         x -> x <> '')) AS n_tok
  FROM input
),
kept AS (
  SELECT t.doc_id, t.n_tok
  FROM tok t LEFT JOIN comp c ON c.node = t.doc_id
  WHERE c.node IS NULL OR c.node = c.rep
)
SELECT (SELECT count(*) FROM tok) AS n_docs_total,
       (SELECT count(*) FROM kept) AS n_docs_kept,
       (SELECT sum(n_tok) FROM tok) AS tokens_total,
       (SELECT sum(n_tok) FROM kept) AS tokens_kept,
       round(CAST((SELECT sum(n_tok) FROM kept) AS DOUBLE)
             / (SELECT sum(n_tok) FROM tok), 6) AS token_yield"""


@register("dedup_token_yield", _token_yield_oracle_sql())
def dedup_token_yield(spark, sf_dir):
    """Effective dataset size after dedup, in TOKENS (X189): total
    whitespace-token mass vs the mass surviving one-representative-
    per-component — the number a training-data team actually quotes
    (docs removed is vanity; tokens removed is epochs). Composition of
    oracled stages: md5-MinHash pairs → min-label components (X12) →
    anti-join keep set; token counts are the build_vocabulary
    tokenization in a map-only projection, and the final figure is one
    global agg of two bounded legs. At 100 TB the corpus is scanned
    once for tokens and once for shingles — the component table is
    O(paired docs)."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup, resolve_duplicate_clusters

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(
        d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED
    )
    comp = resolve_duplicate_clusters(pairs)
    tok = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("n_tok"),
    )
    kept = (
        tok.join(comp, "doc_id", "left")
        .filter(F.col("rep_id").isNull() | (F.col("doc_id") == F.col("rep_id")))
        .select("n_tok")
    )
    total = tok.agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.sum("n_tok").alias("tokens_total"),
    )
    keep = kept.agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tok").alias("tokens_kept"),
    )
    from zparse_spark.functions.numeric import round_duck

    return total.crossJoin(keep).select(
        "n_docs_total",
        "n_docs_kept",
        "tokens_total",
        "tokens_kept",
        # round_duck, not F.round: the r5 driver gate hashed this red on
        # a last-ulp divergence between Spark's and DuckDB's round(x,6)
        round_duck(
            F.col("tokens_kept").cast("double") / F.col("tokens_total"), 6
        ).alias("token_yield"),
    )


# --- Cluster churn across thresholds (X205) ----------------------------


def _cluster_churn_oracle_sql() -> str:
    """Dual-threshold closure over ONE verified-pair table: the lo
    clusters that are unions of >1 hi clusters — possible because the
    verified pair sets are nested (same candidates, j >= 0.3 vs 0.8)."""
    head, _, _ = _MINHASH_SQL.rpartition("\nSELECT id_a")
    half = (
        "array_to_string(list_slice("
        "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '), 1, "
        "greatest(CAST(floor(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) / 2.0) AS INT), 3)), ' ')"
    )
    head = head.replace(
        "SELECT 'dup_' || doc_id, text FROM base WHERE CAST(doc_id AS BIGINT) % 10 = 0",
        "SELECT 'dup_' || doc_id, text FROM base WHERE CAST(doc_id AS BIGINT) % 10 = 0\n"
        f"  UNION ALL\n  SELECT 'part_' || doc_id, {half} FROM base "
        "WHERE CAST(doc_id AS BIGINT) % 10 = 0",
        1,
    )
    return f"""{head.replace("WITH", "WITH RECURSIVE", 1)},
p_lo AS (SELECT id_a, id_b FROM ver WHERE round(j, 6) >= 0.3),
p_hi AS (SELECT id_a, id_b FROM ver WHERE round(j, 6) >= 0.8),
e_lo AS (SELECT id_a AS src, id_b AS dst FROM p_lo
         UNION SELECT id_b, id_a FROM p_lo),
n_lo AS (SELECT DISTINCT src AS node FROM e_lo),
r_lo(node, r) AS (
  SELECT node, node FROM n_lo
  UNION
  SELECT e.src, r_lo.r FROM e_lo e JOIN r_lo ON r_lo.node = e.dst
),
c_lo AS (SELECT node, min(r) AS comp FROM r_lo GROUP BY node),
e_hi AS (SELECT id_a AS src, id_b AS dst FROM p_hi
         UNION SELECT id_b, id_a FROM p_hi),
n_hi AS (SELECT DISTINCT src AS node FROM e_hi),
r_hi(node, r) AS (
  SELECT node, node FROM n_hi
  UNION
  SELECT e.src, r_hi.r FROM e_hi e JOIN r_hi ON r_hi.node = e.dst
),
c_hi AS (SELECT node, min(r) AS comp FROM r_hi GROUP BY node),
joined AS (
  SELECT l.node, l.comp AS comp_lo, coalesce(h.comp, l.node) AS comp_hi
  FROM c_lo l LEFT JOIN c_hi h ON h.node = l.node
)
SELECT comp_lo AS cluster_lo, count(*) AS n_docs,
       count(DISTINCT comp_hi) AS n_subclusters_hi,
       min(node) AS sample_doc
FROM joined GROUP BY comp_lo
HAVING count(DISTINCT comp_hi) > 1"""


@register("dedup_cluster_churn", _cluster_churn_oracle_sql())
def dedup_cluster_churn(spark, sf_dir):
    """Cluster churn across thresholds (X205): which t=0.3 clusters
    are UNIONS of multiple t=0.8 clusters — the sensitivity report a
    dedup owner reads next to the X187 pair sweep before loosening the
    threshold ("0.3 would merge the excerpt with its source family").
    Planted 'part_<id>' half-documents sit at mid-range Jaccard to
    their originals: paired at 0.3, separate at 0.8 — every planted
    family must surface as one merge. ONE pipeline run: the verified
    pair table carries jaccard, both thresholds are filters on it
    (nested by construction), and both closures run on the O(paired
    docs) edge sets. Both engines verify the SAME banded candidate set,
    so low-jaccard banding recall — honestly partial — cancels in the
    comparison."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup, resolve_duplicate_clusters

    d = _docs_with_planted(spark, sf_dir, F)
    norm = F.split(
        F.lower(F.trim(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"\s+", " "))),
        " ",
    )
    half_n = F.greatest(F.floor(F.size(norm) / 2.0).cast("int"), F.lit(3))
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    part = base.filter(F.col("doc_id").cast("long") % 10 == 0).select(
        F.concat(F.lit("part_"), F.col("doc_id")).alias("doc_id"),
        F.array_join(F.slice(norm, 1, half_n), " ").alias("text"),
    )
    d2 = d.unionByName(part)
    pairs_lo = minhash_dedup(
        d2, threshold=0.3, hash_fn="md5", max_bucket=0, seed=_SEED
    )
    pairs_hi = pairs_lo.filter(F.col("jaccard") >= 0.8)
    c_lo = resolve_duplicate_clusters(pairs_lo).select(
        F.col("doc_id").alias("node"), F.col("rep_id").alias("comp_lo")
    )
    c_hi = resolve_duplicate_clusters(pairs_hi).select(
        F.col("doc_id").alias("node"), F.col("rep_id").alias("comp_hi")
    )
    joined = c_lo.join(c_hi, "node", "left").select(
        "node", "comp_lo", F.coalesce("comp_hi", F.col("node")).alias("comp_hi")
    )
    return (
        joined.groupBy(F.col("comp_lo").alias("cluster_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("comp_hi").alias("n_subclusters_hi"),
            F.min("node").alias("sample_doc"),
        )
        .filter(F.col("n_subclusters_hi") > 1)
    )


# --- Near-dup transitivity audit (X207) --------------------------------


def _transitivity_oracle_sql() -> str:
    """Open/closed wedge counts over the verified pair graph — the SQL
    twin joins the edge list to itself on the shared endpoint and
    probes the closing edge."""
    head, _, final = _MINHASH_SQL.rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    return f"""{head.replace("WITH", "WITH RECURSIVE", 1)},
pairs AS (
  {pairs_select}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
wedges AS (
  SELECT e1.a AS x, e1.b AS mid, e2.b AS y
  FROM edges e1 JOIN edges e2 ON e2.a = e1.b AND e1.a < e2.b
),
probed AS (
  SELECT w.x, w.mid, w.y,
         EXISTS (SELECT 1 FROM edges e WHERE e.a = w.x AND e.b = w.y) AS closed
  FROM wedges w
)
SELECT count(*) AS n_wedges,
       count(CASE WHEN closed THEN 1 END) AS n_closed,
       round(CAST(count(CASE WHEN closed THEN 1 END) AS DOUBLE)
             / greatest(count(*), 1), 6) AS transitivity
FROM probed"""


@register("dedup_transitivity_audit", _transitivity_oracle_sql())
def dedup_transitivity_audit(spark, sf_dir):
    """Near-dup transitivity audit (X207): the share of wedges
    (a~b~c) whose closing edge a~c is ALSO a verified pair — the
    number that justifies (or indicts) connected-component cluster
    resolution: CC treats similarity as transitive, and at
    transitivity ~1 that is faithful; low transitivity means CC is
    chaining unrelated docs through hubs and the keep-rule is deleting
    non-duplicates. Wedge generation is one self-join of the bounded
    verified EDGE list on the shared endpoint (O(Σ deg²) — at 100 TB
    run it on the X3-capped pair graph where per-node degree is
    bounded); the closing probe is one more equi-join. Exact integer
    counts, one trailing division."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(
        d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED
    ).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).unionByName(
        pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    ).distinct()
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("mid"))
    e2 = edges.select(F.col("a").alias("mid"), F.col("b").alias("y"))
    wedges = e1.join(e2, "mid").filter(F.col("x") < F.col("y"))
    closing = edges.select(
        F.col("a").alias("x"), F.col("b").alias("y"), F.lit(True).alias("_closed")
    )
    probed = wedges.join(closing, ["x", "y"], "left")
    return probed.agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.count(F.when(F.col("_closed"), 1)).alias("n_closed"),
        F.round(
            F.count(F.when(F.col("_closed"), 1)).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)),
            6,
        ).alias("transitivity"),
    )


# --- k-core hub detection over the near-dup graph (X214) ---------------


def _kcore_oracle_sql(k: int = 3, rounds: int = 6) -> str:
    """Uncapped boiler-planted pair graph (the 40-clique), then a
    bounded-round k-core peel unrolled as CTE stages — each round drops
    nodes whose remaining degree < k and the edges touching them."""
    head, _, final = (
        _MINHASH_SQL.replace(_SHINGLE_CTE, _BOILER_SHINGLE_CTE, 1)
    ).rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    # every stage is MATERIALIZED: DuckDB would otherwise inline e{p}
    # into each of its three references per round, re-expanding the whole
    # MinHash pipeline 3^rounds times (the SQL face of the same lineage
    # trap the Spark side checkpoints away)
    stages = [
        f"""e0 AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        stages.append(
            f"""k{r} AS MATERIALIZED (
  SELECT a FROM e{p} GROUP BY a HAVING count(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{p} e
  JOIN k{r} ka ON ka.a = e.a
  JOIN k{r} kb ON kb.a = e.b
)"""
        )
    chain = ",\n".join(stages)
    return f"""{head},
pairs AS MATERIALIZED (
  {pairs_select}
),
{chain}
SELECT a AS doc_id, count(*) AS core_degree
FROM e{rounds} GROUP BY a"""


@register("dedup_kcore_hubs", _kcore_oracle_sql())
def dedup_kcore_hubs(spark, sf_dir):
    """k-core hub detection (X214): nodes surviving the degree->=3 peel
    of the verified near-dup graph — the DENSE-substructure detector
    that degree alone misses (a doc with 3 independent neighbors peels
    away once they do; a boilerplate CLIQUE survives every round). The
    planted 40-copy boilerplate family is the positive: it must emerge
    as the complete 3-core while planted dup PAIRS (degree 1) and
    organic near-dups peel out. Bounded-round contract: 6 unrolled
    peel rounds, identical in both engines; on this graph the peel
    converges in round 1 (clique vs forest) and the pytest asserts the
    fixpoint. Each round is one degree groupBy + one semi-join on the
    EDGE list — O(edges) per round, never touching the corpus."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    boiler = spark.range(_N_BOILER).select(
        F.concat(F.lit("boiler_"), F.lpad(F.col("id").cast("string"), 2, "0")).alias(
            "doc_id"
        ),
        F.lit(_BOILER_TEXT).alias("text"),
    )
    d = base.unionByName(boiler)
    pairs = minhash_dedup(
        d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED
    ).select("id_a", "id_b")
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        # materialize BEFORE the peel: each round references edges three
        # times (degree + two semi-joins), so an unmaterialized lineage
        # re-evaluates the whole MinHash pipeline 3^rounds times — the
        # same lineage trap as X12's checkpointed propagation. The edge
        # list is O(pairs), trivially checkpointable every round.
        .localCheckpoint(eager=True)
    )
    k = 3
    for _ in range(6):
        keep = (
            edges.groupBy("a")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select("a")
        )
        edges = (
            edges.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return edges.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


# --- Dedup drop explanations (X216) ------------------------------------


def _drop_explain_oracle_sql() -> str:
    head, _, final = _MINHASH_SQL.rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    return f"""{head.replace("WITH", "WITH RECURSIVE", 1)},
pairs AS (
  {pairs_select}
),
edges AS (
  SELECT id_a AS src, id_b AS dst, jaccard FROM pairs
  UNION
  SELECT id_b, id_a, jaccard FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, min(r) AS rep FROM reach GROUP BY node),
dropped AS (SELECT node, rep FROM comp WHERE node <> rep),
best AS (
  SELECT d.node, d.rep, e.dst AS via_doc, e.jaccard,
         row_number() OVER (PARTITION BY d.node
           ORDER BY e.jaccard DESC, e.dst ASC) AS rk
  FROM dropped d JOIN edges e ON e.src = d.node
)
SELECT node AS doc_id, rep AS kept_id, via_doc, jaccard AS via_jaccard
FROM best WHERE rk = 1"""


@register("dedup_drop_explanations", _drop_explain_oracle_sql())
def dedup_drop_explanations(spark, sf_dir):
    """Dedup drop explanations (X216): one provenance row per DROPPED
    document — which representative replaced it, through WHICH verified
    pair (the doc's strongest edge) at what Jaccard. This is the
    artifact an appeal/takedown/debugging flow actually needs: "doc X
    was removed" is unactionable; "doc X was removed as a 0.93
    near-dup of doc Y, kept as Z" is reviewable, and at 10^12 scale
    it is the ONLY way to audit a keep-rule without re-running the
    pipeline. Composition of oracled stages (pairs -> components) plus
    one argmax window on the O(paired docs) edge table."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from zparse_spark.operators.dedup import minhash_dedup, resolve_duplicate_clusters

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(
        d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED
    )
    comp = resolve_duplicate_clusters(pairs)
    dropped = comp.filter(F.col("doc_id") != F.col("rep_id"))
    edges = pairs.select(
        F.col("id_a").alias("doc_id"), F.col("id_b").alias("via_doc"), "jaccard"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("doc_id"), F.col("id_a").alias("via_doc"), "jaccard"
        )
    )
    j = dropped.join(edges, "doc_id")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("via_doc").asc()
    )
    best = j.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    return best.select(
        "doc_id",
        F.col("rep_id").alias("kept_id"),
        "via_doc",
        F.col("jaccard").alias("via_jaccard"),
    )


# --- Near-dup pair diff profile (X228) ---------------------------------


def _pair_diff_oracle_sql() -> str:
    head, _, final = _MINHASH_SQL.rpartition("\nSELECT id_a")
    pairs_select = "SELECT id_a" + final
    return f"""{head},
pairs AS (
  {pairs_select}
),
texts AS (
  SELECT doc_id, coalesce(text, '') AS t FROM input
),
j AS (
  SELECT p.id_a, p.id_b, p.jaccard, ta.t AS t_a, tb.t AS t_b
  FROM pairs p
  JOIN texts ta ON ta.doc_id = p.id_a
  JOIN texts tb ON tb.doc_id = p.id_b
),
m AS (
  SELECT id_a, id_b, jaccard,
         length(t_a) AS len_a, length(t_b) AS len_b,
         len(list_filter(range(1, least(length(t_a), length(t_b)) + 1),
             i -> substring(t_a, 1, CAST(i AS INT)) = substring(t_b, 1, CAST(i AS INT))))
           AS prefix_len,
         len(list_filter(range(1, least(length(t_a), length(t_b)) + 1),
             i -> substring(t_a, length(t_a) - CAST(i AS INT) + 1, CAST(i AS INT))
                  = substring(t_b, length(t_b) - CAST(i AS INT) + 1, CAST(i AS INT))))
           AS suffix_len
  FROM j
)
SELECT id_a, id_b, jaccard, len_a, len_b, prefix_len, suffix_len,
       CASE WHEN prefix_len = least(len_a, len_b) THEN 'appended_tail'
            WHEN suffix_len = least(len_a, len_b) THEN 'prepended_head'
            WHEN prefix_len + suffix_len >= least(len_a, len_b) THEN 'middle_edit'
            ELSE 'scattered' END AS diff_class
FROM m"""


@register("dedup_pair_diff_profile", _pair_diff_oracle_sql())
def dedup_pair_diff_profile(spark, sf_dir):
    """Near-dup pair diff profile (X228): WHERE verified near-dups
    differ — common-prefix and common-suffix lengths classify each pair
    as appended_tail (SEO spam glued after a copy), prepended_head
    (attribution banners), middle_edit, or scattered (true paraphrase)
    — the interpretability layer that turns "0.9 Jaccard" into an
    actionable fix at the SOURCE (strip the tail template, keep the
    doc). Prefix/suffix lengths are monotone-predicate counts over a
    bounded position range computed with HOFs in both engines —
    exact integers, no Python; runs only on the O(pairs) verified
    table, never the corpus."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.dedup import minhash_dedup

    d = _docs_with_planted(spark, sf_dir, F)
    pairs = minhash_dedup(
        d, threshold=_JACCARD_T, hash_fn="md5", max_bucket=0, seed=_SEED
    )
    texts = d.select("doc_id", F.coalesce("text", F.lit("")).alias("t"))
    j = (
        pairs.join(
            texts.select(F.col("doc_id").alias("id_a"), F.col("t").alias("t_a")),
            "id_a",
        )
        .join(
            texts.select(F.col("doc_id").alias("id_b"), F.col("t").alias("t_b")),
            "id_b",
        )
    )
    # prefix/suffix predicate counts as expr-level HOF lambdas (the
    # python-side F.substring requires literal lengths)
    m = j.select(
        "id_a",
        "id_b",
        "jaccard",
        F.length("t_a").alias("len_a"),
        F.length("t_b").alias("len_b"),
        F.expr(
            "size(filter(sequence(1, least(length(t_a), length(t_b))), "
            "i -> substring(t_a, 1, i) = substring(t_b, 1, i)))"
        ).alias("prefix_len"),
        F.expr(
            "size(filter(sequence(1, least(length(t_a), length(t_b))), "
            "i -> substring(t_a, length(t_a) - i + 1, i) "
            "= substring(t_b, length(t_b) - i + 1, i)))"
        ).alias("suffix_len"),
    )
    cls = (
        F.when(F.col("prefix_len") == F.least("len_a", "len_b"), "appended_tail")
        .when(F.col("suffix_len") == F.least("len_a", "len_b"), "prepended_head")
        .when(
            F.col("prefix_len") + F.col("suffix_len") >= F.least("len_a", "len_b"),
            "middle_edit",
        )
        .otherwise("scattered")
    )
    return m.select(
        "id_a", "id_b", "jaccard", "len_a", "len_b", "prefix_len", "suffix_len",
        cls.alias("diff_class"),
    )
