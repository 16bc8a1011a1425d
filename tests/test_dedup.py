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


# ---------------------------------------------------------------------------
# hot-bucket cap — the boilerplate-cluster scale guard
# ---------------------------------------------------------------------------


def test_hot_bucket_cap_bounds_boilerplate_pairs(spark):
    """One boilerplate bucket of 5k identical docs must NOT go quadratic:
    candidate pairs stay bounded by the cap, and honest near-dups outside
    the hot bucket are still found."""
    n, cap = 5000, 32
    boiler = spark.range(n).select(
        F.concat(F.lit("b"), F.col("id")).alias("doc_id"), F.lit(BASE).alias("text")
    )
    outsiders = spark.createDataFrame(
        [("x1", DIFF), ("x2", DIFF + " indeed")], ["doc_id", "text"]
    )
    df = boiler.unionByName(outsiders)
    n_bands = 4
    cands = minhash_lsh_candidates(df, n_hashes=16, n_bands=n_bands, max_bucket=cap)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    # hash-sampling keeps ~cap members per hot bucket per band; allow 4x
    # slack for sampling variance — versus ~12.5M uncapped pairs
    bound = n_bands * (4 * cap) ** 2 // 2
    assert 0 < len(pairs) < bound
    assert ("x1", "x2") in pairs  # non-hot bucket untouched


def test_hot_bucket_stats_surfaces_truncation(spark):
    from zparse_spark.operators.dedup import cap_hot_buckets, hot_bucket_stats

    banded = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("_id"),
        F.lit(0).alias("band"),
        # one hot bucket (900 members) + spread tail
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("bucket"),
    )
    stats = hot_bucket_stats(banded, ["band", "bucket"], max_bucket=64).collect()
    assert len(stats) == 1 and stats[0]["n_members"] == 900
    capped = cap_hot_buckets(banded, ["band", "bucket"], max_bucket=64)
    per_bucket = {r["bucket"]: r["n"] for r in
                  capped.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    # hot bucket reduced to ~64 (hash-sample: allow 3x), tail untouched
    assert per_bucket[1] < 3 * 64
    assert sum(v for k, v in per_bucket.items() if k != 1) == 100


def test_simhash_and_embedding_caps_apply(spark):
    import numpy as np

    n = 2000
    boiler = spark.range(n).select(
        F.concat(F.lit("s"), F.col("id")).alias("doc_id"), F.lit(BASE).alias("text")
    )
    got = simhash_near_duplicates(boiler, max_bucket=16)
    assert 0 < got.count() < 8 * (4 * 16) ** 2 // 2

    rng = np.random.default_rng(1)
    v = [float(x) for x in rng.standard_normal(16)]
    vdf = spark.range(500).select(
        F.concat(F.lit("v"), F.col("id")).alias("vec_id"),
        F.array(*[F.lit(x) for x in v]).alias("embedding"),
    )
    gote = embedding_near_duplicates(vdf, dim=16, n_planes=8, max_bucket=16)
    assert 0 < gote.count() < (4 * 16) ** 2 // 2


def test_minhash_md5_mode_matches_xxhash_pairs(spark):
    """The DuckDB-portable md5 hash family drives the same pipeline and
    (after exact-Jaccard verification) finds the same duplicate pairs."""
    base = {tuple(sorted((r["id_a"], r["id_b"])))
            for r in minhash_dedup(corpus(spark), threshold=0.6).collect()}
    md5 = {tuple(sorted((r["id_a"], r["id_b"])))
           for r in minhash_dedup(corpus(spark), threshold=0.6, hash_fn="md5").collect()}
    assert ("d1", "d2") in md5 and ("d1", "d3") in md5
    assert md5 == base


def test_resolve_duplicate_clusters_chain_and_disjoint(spark):
    from zparse_spark.operators.dedup import resolve_duplicate_clusters

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], ["id_a", "id_b"]
    )
    got = {r["doc_id"]: r["rep_id"] for r in resolve_duplicate_clusters(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_keep_representatives_drops_non_reps_only(spark):
    from zparse_spark.operators.dedup import keep_representatives

    docs = spark.createDataFrame(
        [(d, f"text {d}") for d in "abcxyz"], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], ["id_a", "id_b"]
    )
    kept = sorted(r["doc_id"] for r in keep_representatives(docs, pairs).collect())
    # component reps a and x survive; unpaired z survives untouched
    assert kept == ["a", "x", "z"]


def test_resolve_converges_on_star_in_one_round(spark):
    """Boilerplate star: 30 docs all paired to one hub — min-label
    propagation resolves in a single iteration (shallow diameter)."""
    from zparse_spark.operators.dedup import resolve_duplicate_clusters

    pairs = spark.createDataFrame(
        [("hub", f"m{i:02d}") for i in range(30)], ["id_a", "id_b"]
    )
    got = resolve_duplicate_clusters(pairs, max_iter=3).collect()
    assert {r["rep_id"] for r in got} == {"hub"}
    assert len(got) == 31


def test_md5_sample_hash_cap_matches_python_model(spark):
    """cap_hot_buckets(sample_hash='md5') must keep exactly the ids whose
    md5-derived keep-hash ≡ 0 (mod ceil(n/max_bucket)) — the invariant
    the DuckDB capped-pipeline oracle relies on."""
    import hashlib

    from zparse_spark.operators.dedup import minhash_dedup

    n, mb = 40, 8
    text = "identical boilerplate text repeated for every single document here"
    docs = spark.createDataFrame(
        [(f"b{i:02d}", text) for i in range(n)], ["doc_id", "text"]
    )
    pairs = minhash_dedup(docs, threshold=0.9, hash_fn="md5", max_bucket=mb).collect()
    import math

    mod = math.ceil(n / mb)
    kept = sorted(
        f"b{i:02d}"
        for i in range(n)
        if int(hashlib.md5(f"b{i:02d}".encode()).hexdigest()[:8], 16) % mod == 0
    )
    ids = sorted({r["id_a"] for r in pairs} | {r["id_b"] for r in pairs})
    assert ids == kept
    assert len(pairs) == len(kept) * (len(kept) - 1) // 2
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_resolve_warns_on_non_convergence(spark):
    """A chain deeper than max_iter must not return silently-wrong labels."""
    import warnings

    from zparse_spark.operators.dedup import resolve_duplicate_clusters

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(8)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        resolve_duplicate_clusters(chain, max_iter=2).collect()
    assert any("did not converge" in str(x.message) for x in w)

    # and with enough iterations: no warning, correct single component
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = resolve_duplicate_clusters(chain, max_iter=10).collect()
    assert not any("did not converge" in str(x.message) for x in w)
    assert {r["rep_id"] for r in out} == {"n0"}


def test_star_cc_matches_propagation_and_beats_diameter(spark):
    """resolve_duplicate_clusters_star: identical labels to min-label
    propagation on mixed graph shapes, and a 40-edge chain resolves in
    ≤8 alternations — far under the diameter the propagation variant
    needs (O(log n) claim)."""
    from zparse_spark.operators.dedup import (
        resolve_duplicate_clusters,
        resolve_duplicate_clusters_star,
    )

    # mixed: a star, a triangle with a duplicate edge, a pair, a chain
    pairs = spark.createDataFrame(
        [("h", "s1"), ("h", "s2"), ("h", "s3"),
         ("t1", "t2"), ("t2", "t3"), ("t1", "t3"), ("t3", "t1"),
         ("p1", "p2"),
         ("c1", "c2"), ("c2", "c3"), ("c3", "c4")],
        ["id_a", "id_b"],
    )
    star = {r["doc_id"]: r["rep_id"] for r in resolve_duplicate_clusters_star(pairs).collect()}
    prop = {r["doc_id"]: r["rep_id"] for r in resolve_duplicate_clusters(pairs).collect()}
    assert star == prop
    assert star["s3"] == "h" and star["t3"] == "t1" and star["c4"] == "c1"

    # 41-node chain (diameter 40): star converges within 8 rounds where
    # propagation's default max_iter=10 would not even cover it
    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(40)], ["id_a", "id_b"]
    )
    got = resolve_duplicate_clusters_star(chain, max_iter=8).collect()
    assert len(got) == 41
    assert all(r["rep_id"] == "n00" for r in got)


def test_select_representatives_quality_prior(spark):
    from zparse_spark.operators.dedup import keep_representatives, select_representatives

    # two components: {1,2,3} chain and {10,11}; quality argmax wins,
    # ties break to min id
    pairs = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("10", "11")], "id_a string, id_b string"
    )
    docs = spark.createDataFrame(
        [("1", 5.0), ("2", 9.0), ("3", 9.0), ("10", 1.0), ("11", 2.0), ("99", 0.0)],
        "doc_id string, q double",
    )
    reps = {
        r["doc_id"]: r["rep_id"]
        for r in select_representatives(docs, pairs, prefer_col="q").collect()
    }
    # component {1,2,3}: q ties at 9.0 between 2 and 3 -> min id '2'
    assert reps == {"1": "2", "2": "2", "3": "2", "10": "11", "11": "11"}
    kept = sorted(
        r["doc_id"]
        for r in keep_representatives(docs, pairs, prefer_col="q").collect()
    )
    # unpaired '99' passes through; reps '2' and '11' survive
    assert kept == ["11", "2", "99"]


def test_chunk_dedup_first_occurrence_and_reassembly(spark):
    import hashlib

    from zparse_spark.operators.dedup import chunk_dedup

    # chunk size 3: doc 0 = two full chunks + a short tail; doc 1
    # repeats doc 0's first chunk at an aligned offset (dropped) then
    # adds a unique chunk; doc 2 is entirely doc 0's chunks (drops to
    # the md5('') empty-reassembly path); doc 3 is whitespace-only and
    # must not appear at all
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g"),
            (1, "a b c x y z"),
            (2, "a b c d e f"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in chunk_dedup(docs, chunk_words=3).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert (rows[0]["n_chunks_total"], rows[0]["n_chunks_kept"]) == (3, 3)
    assert rows[0]["dedup_hash"] == hashlib.md5(b"a b c d e f g").hexdigest()
    assert (rows[1]["n_chunks_total"], rows[1]["n_chunks_kept"]) == (2, 1)
    assert rows[1]["dedup_hash"] == hashlib.md5(b"x y z").hexdigest()
    # doc 2's "a b c" and "d e f" both first occurred in doc 0
    assert (rows[2]["n_chunks_total"], rows[2]["n_chunks_kept"]) == (2, 0)
    assert rows[2]["dedup_hash"] == hashlib.md5(b"").hexdigest()


def test_chunk_dedup_position_order_within_doc(spark):
    # first occurrence is ordered by (doc_id, pos): a chunk repeated
    # WITHIN one doc keeps only its earliest position
    from zparse_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [(7, "p q r p q r s")], "doc_id long, text string"
    )
    r = chunk_dedup(docs, chunk_words=3).collect()[0]
    assert (r["n_chunks_total"], r["n_chunks_kept"]) == (3, 2)


def test_incremental_exact_dedup_hand_case(spark):
    from zparse_spark.operators.dedup import incremental_exact_dedup

    corpus = spark.createDataFrame(
        [("c1", "alpha beta"), ("c2", "gamma delta"), ("c0", "ALPHA   beta")],
        "doc_id string, text string",
    )
    delta = spark.createDataFrame(
        [
            ("n1", "alpha beta"),      # in corpus (c0 < c1 after normalize)
            ("n2", "Alpha Beta"),      # same normalized hash → also corpus dup
            ("n3", "epsilon"),         # new, repeated in delta
            ("n4", "epsilon"),
            ("n5", "zeta"),            # new, unique
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in incremental_exact_dedup(corpus, delta).collect()
    }
    assert got == {
        "n1": ("dup_of_corpus", "c0"),
        "n2": ("dup_of_corpus", "c0"),
        "n3": ("admitted", None),
        "n4": ("dup_in_delta", "n3"),
        "n5": ("admitted", None),
    }


def test_incremental_exact_matches_batch(spark):
    """Admitting a delta incrementally must leave the corpus in exactly
    the state a batch dedup of corpus ∪ delta (min-id keep) produces —
    the invariant that lets a pipeline switch to incremental admission
    without changing its corpus."""
    from zparse_spark.operators.dedup import exact_duplicates, incremental_exact_dedup
    from zparse_spark.sources.datagen import _base_flat

    flat = _base_flat(spark, 300, seed=9).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        # fold texts into a small hash space so cross-batch dups exist
        F.substring("text", 1, 30).alias("text"),
    )
    corpus_all = flat.filter(F.col("doc_id").cast("long") % 3 != 0)
    delta = flat.filter(F.col("doc_id").cast("long") % 3 == 0)
    # corpus must itself be deduped first (the function's precondition)
    dup_groups = exact_duplicates(corpus_all)
    keep = dup_groups.select(F.col("keep_id").alias("doc_id"))
    losers = (
        corpus_all.select("doc_id", F.md5(
            __import__("zparse_spark.functions.text", fromlist=["normalize_text"]).normalize_text(F.col("text"))
        ).alias("h"))
        .join(dup_groups.withColumnRenamed("content_hash", "h"), "h")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    corpus = corpus_all.join(losers, "doc_id", "left_anti")

    inc = incremental_exact_dedup(corpus, delta)
    admitted = {r["doc_id"] for r in inc.filter("status = 'admitted'").collect()}
    new_corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()} | admitted

    batch = exact_duplicates(corpus.unionByName(delta))
    batch_losers = set()
    from zparse_spark.functions.text import normalize_text
    hashed = corpus.unionByName(delta).select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("content_hash")
    )
    for r in hashed.join(batch, "content_hash").filter("doc_id != keep_id").collect():
        batch_losers.add(r["doc_id"])
    batch_ids = {r["doc_id"] for r in corpus.unionByName(delta).select("doc_id").collect()} - batch_losers
    assert new_corpus_ids == batch_ids
    assert inc.count() == delta.count()


def test_incremental_minhash_matches_batch_candidates(spark):
    """Probing a materialized corpus band index with a delta batch must
    surface exactly the batch pipeline's candidate pairs that involve a
    delta doc (cap disabled on both sides so recall is exhaustive)."""
    from zparse_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_banded,
        minhash_lsh_candidates,
    )
    from zparse_spark.sources.datagen import _base_flat

    flat = _base_flat(spark, 160, seed=4).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    # plant near-dups across the corpus/delta split: every 10th delta doc
    # is a corpus doc with one word appended
    corpus = flat.filter(F.col("doc_id").cast("long") % 4 != 0)
    near = corpus.limit(12).select(
        F.concat(F.lit("nd_"), "doc_id").alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    delta = flat.filter(F.col("doc_id").cast("long") % 4 == 0).unionByName(near)

    kw = dict(n_hashes=32, n_bands=8, k_shingle=3, seed=7)
    index = minhash_banded(corpus, **kw)
    inc = incremental_minhash_candidates(index, delta, **kw)
    inc_pairs = {
        frozenset((r["delta_id"], r["other_id"])): r["n_shared_bands"]
        for r in inc.collect()
    }

    batch = minhash_lsh_candidates(corpus.unionByName(delta), max_bucket=0, **kw)
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    batch_pairs = {
        frozenset((r["id_a"], r["id_b"])): r["n_shared_bands"]
        for r in batch.collect()
        if r["id_a"] in delta_ids or r["id_b"] in delta_ids
    }
    assert inc_pairs == batch_pairs and len(inc_pairs) >= 12


def test_incremental_exact_plan_discipline(spark):
    """The corpus side must STREAM: its only joins are broadcast (the
    delta-hash probe and the collision map) — no sort-merge join, no
    corpus-wide Exchange beyond the collision-bounded aggregate."""
    from zparse_spark.operators.dedup import incremental_exact_dedup

    corpus = spark.range(1000).selectExpr(
        "CAST(id AS STRING) AS doc_id", "concat('text ', id % 200) AS text"
    )
    delta = spark.range(50).selectExpr(
        "concat('n', id) AS doc_id", "concat('text ', id) AS text"
    )
    plan = (
        incremental_exact_dedup(corpus, delta)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # semi probe + hits map


def test_winnowing_local_guarantee_and_density(spark):
    """The MOSS guarantee: two docs sharing a substring of length
    >= w + k - 1 share at least one fingerprint, even when the rest of
    the text is completely different; and the fingerprint set is much
    smaller than the raw k-gram index (density ~2/(w+1))."""
    from zparse_spark.operators.dedup import winnow_fingerprint_sets

    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        ("a", "alpha " * 20 + shared + " omega " * 20),
        ("b", "zulu " * 25 + shared + " yankee " * 15),
        ("c", "completely unrelated content with no overlap at all " * 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    k, w = 8, 4
    fp = {r["doc_id"]: set(r["fp_set"]) for r in winnow_fingerprint_sets(df, k=k, w=w).collect()}
    assert fp["a"] & fp["b"], "docs sharing a long substring must share a fingerprint"
    # density: distinct fingerprints well under the positional k-gram count
    n_positions = len(" ".join(rows[0][1].split())) - k + 1
    assert len(fp["a"]) < 0.6 * n_positions


def test_winnowing_pairs_hand_case_and_stop_fp(spark):
    """Pair scoring: a planted near-copy scores >= threshold while an
    unrelated doc never pairs; max_df drops boilerplate-hot fingerprints
    without inventing pairs."""
    from zparse_spark.operators.dedup import winnowing_pairs

    base = "spark group query row data slow small filter customer line the batch value merge"
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, "entirely different words live here with zero shared runs of text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in winnowing_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.5
    assert all(3 not in pair for pair in got)
    # stop-fingerprint cap: with max_df=1 every fingerprint shared by the
    # near-copies is dropped, so no pair survives — caps only remove
    capped = winnowing_pairs(df, threshold=0.01, max_df=1).collect()
    assert capped == []


def test_winnowing_xxhash_production_path(spark):
    """The xxhash64 production hash (8-byte shuffle keys vs 32-char md5
    hex) selects different fingerprints but the same planted near-dup
    pair survives; unrelated docs still never pair."""
    from zparse_spark.operators.dedup import winnowing_pairs

    base = "spark group query row data slow small filter customer line the batch value merge"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "entirely different words live here with zero shared runs")],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]) for r in winnowing_pairs(df, threshold=0.5, hash_fn="xxhash64").collect()}
    assert (1, 2) in got and all(3 not in p for p in got)


def test_winnowing_containment_finds_embedded_quote(spark):
    """A short doc verbatim-embedded in a long doc must surface with
    containment ~1.0 from the short side while its Jaccard stays far
    below any pair threshold — the relation winnowing_pairs at 0.5
    cannot emit. Unrelated docs must not pair at 0.8."""
    from zparse_spark.operators.dedup import winnowing_containment, winnowing_pairs

    quote = "the quick brown fox jumps over the lazy dog near the river bank today"
    page = (
        "breaking news from the city council meeting yesterday evening "
        + quote
        + " officials said the budget vote would follow next week after review "
        "with further commentary from residents and local business owners alike"
    )
    df = spark.createDataFrame(
        [("quote", quote), ("page", page), ("other", "completely unrelated text about quantum chemistry simulations")],
        "doc_id string, text string",
    )
    out = winnowing_containment(df, threshold=0.8).collect()
    assert len(out) == 1
    r = out[0]
    assert {r["id_a"], r["id_b"]} == {"page", "quote"}
    # quote is lexicographically > page, so quote is id_b
    assert r["containment_b_in_a"] >= 0.9  # quote inside page
    assert r["jaccard"] < 0.5  # invisible to the symmetric pair op
    assert winnowing_pairs(df, threshold=0.5).count() == 0


def test_pair_threshold_sweep_hand_case(spark):
    """Hand-checkable curve: pairs at scores .95/.80/.55/.30 over docs
    a-e. n_pairs(t) counts pairs >= t; n_docs(t) counts docs whose MAX
    pair >= t (doc c's .55 pair must not re-count it at .8 where its
    .80 pair already does... i.e. docs count once via their max)."""
    from zparse_spark.operators.dedup import pair_threshold_sweep

    pairs = spark.createDataFrame(
        [
            ("a", "b", 0.95),
            ("b", "c", 0.80),
            ("c", "d", 0.55),
            ("d", "e", 0.30),
            ("a", "e", None),  # unscored pair: dropped
        ],
        "id_a string, id_b string, jaccard double",
    )
    out = {r["threshold"]: r for r in pair_threshold_sweep(pairs).collect()}
    assert set(out) == {round(k / 20, 6) for k in range(10, 21)}
    assert out[0.95]["n_pairs"] == 1 and out[0.95]["n_docs"] == 2  # a,b
    assert out[0.8]["n_pairs"] == 2 and out[0.8]["n_docs"] == 3  # a,b,c
    assert out[0.55]["n_pairs"] == 3 and out[0.55]["n_docs"] == 4  # +d
    assert out[0.5]["n_pairs"] == 3 and out[0.5]["n_docs"] == 4  # .30 below grid
    assert out[1.0]["n_pairs"] == 0 and out[1.0]["n_docs"] == 0


def test_weighted_jaccard_charges_repetition(spark):
    """The discriminating case: "the the the the cat" vs "the cat" has
    set-Jaccard 1.0 (same token SET) but weighted Jaccard 0.4 —
    Σmin = min(4,1)+min(1,1) = 2, Σmax = 4+1 = 5. Disjoint docs get 0
    and the threshold prunes them."""
    from zparse_spark.operators.dedup import weighted_jaccard_pairs

    d = spark.createDataFrame(
        [("a", "the the the the cat"), ("b", "the cat"), ("c", "dog fox")],
        "doc_id string, text string",
    )
    ids = d.selectExpr("doc_id AS id_a")
    cands = ids.crossJoin(d.selectExpr("doc_id AS id_b")).filter("id_a < id_b")
    out = {(r["id_a"], r["id_b"]): r for r in
           weighted_jaccard_pairs(d, cands, threshold=0.0).collect()}
    ab = out[("a", "b")]
    assert ab["w_inter"] == 2 and ab["w_union"] == 5 and ab["w_jaccard"] == 0.4
    assert out[("a", "c")]["w_jaccard"] == 0.0
    assert weighted_jaccard_pairs(d, cands, threshold=0.3).count() == 1


def test_kcore_peel_keeps_clique_drops_star(spark):
    """A 5-clique survives the k=3 peel intact (degree 4 each); a
    star with 5 leaves — hub degree 5, well above k — peels COMPLETELY
    because its leaves (degree 1) go first: exactly the dense-vs-hub
    distinction raw degree cannot make. Fixpoint reached within the
    6-round contract (5th and 6th rounds identical)."""
    from pyspark.sql import functions as F

    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    star = [("hub", f"leaf{i}") for i in range(5)]
    pairs = spark.createDataFrame(clique + star, "id_a string, id_b string")
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    counts = []
    for _ in range(6):
        keep = (
            edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= 3).select("a")
        )
        edges = (
            edges.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        counts.append(edges.count())
    survivors = {r["a"] for r in edges.select("a").distinct().collect()}
    assert survivors == {f"c{i}" for i in range(5)}
    assert counts[-1] == counts[-2]  # fixpoint within the round budget
