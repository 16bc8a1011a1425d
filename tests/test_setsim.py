from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from zparse_spark.operators.dedup import shingles
from zparse_spark.operators.setsim import prefix_filter_jaccard_join


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _brute_force(spark, df, threshold, k=3):
    rows = df.select(
        "doc_id", shingles(F.col("text"), k=k, mode="word").alias("sh")
    ).collect()
    sets = {r.doc_id: set(r.sh) for r in rows}
    out = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if uni and inter / uni >= threshold:
            out.add((a, b, inter, uni))
    return out


def test_complete_vs_brute_force(spark):
    # mixed corpus: exact dups, one-word edits, disjoint docs
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("a", base),
        ("b", base),  # exact dup of a
        ("c", base.replace("epsilon", "EDIT")),  # near dup
        ("d", "one two three four five six seven eight nine ten"),
        ("e", "totally different words that share no shingle at all here"),
        ("f", base + " lambda mu"),  # superset
    ]
    df = _docs(spark, rows)
    for t in (0.5, 0.8):
        got = {
            (r.id_a, r.id_b, r.inter, r.uni)
            for r in prefix_filter_jaccard_join(df, threshold=t).collect()
        }
        assert got == _brute_force(spark, df, t), f"threshold {t}"


def test_exact_dup_pair_is_jaccard_one(spark):
    df = _docs(spark, [("x", "p q r s t u v w"), ("y", "p q r s t u v w")])
    out = prefix_filter_jaccard_join(df, threshold=0.9).collect()
    assert len(out) == 1
    assert (out[0].id_a, out[0].id_b, float(out[0].jaccard)) == ("x", "y", 1.0)


def test_threshold_boundary_inclusive(spark):
    # J exactly 0.8: inter=4 shingles shared of uni=5 (k=1 word sets via
    # short docs is awkward with k=3 shingles; construct via overlap)
    # doc1: tokens t1..t6 -> shingles s1..s4 ; doc2 shares s1..s4 and
    # adds one more -> J = 4/5
    d1 = "t1 t2 t3 t4 t5 t6"
    d2 = "t1 t2 t3 t4 t5 t6 t7"
    df = _docs(spark, [("p", d1), ("q", d2)])
    out = prefix_filter_jaccard_join(df, threshold=0.8).collect()
    assert len(out) == 1 and out[0].inter == 4 and out[0].uni == 5


def test_below_threshold_excluded(spark):
    df = _docs(spark, [("p", "a b c d e f"), ("q", "a b c x y z")])
    # shingles of p: {a b c, b c d, c d e, d e f}; q: {a b c, b c x, ...}
    # J = 1/7 < 0.5
    assert prefix_filter_jaccard_join(df, threshold=0.5).count() == 0


def test_short_doc_falls_back_to_norm_text(spark):
    # n < k: the set is the normalized text itself — two short docs
    # match iff byte-equal after normalization
    df = _docs(spark, [("s1", "  Hello   WORLD "), ("s2", "hello world"), ("s3", "bye")])
    got = {(r.id_a, r.id_b) for r in prefix_filter_jaccard_join(df, threshold=0.9).collect()}
    assert got == {("s1", "s2")}


def test_invalid_threshold_raises(spark):
    df = _docs(spark, [("a", "x y z w")])
    import pytest

    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(df, threshold=0.0)


def test_no_cartesian_in_plan(spark):
    df = _docs(spark, [(str(i), f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(20)])
    plan = (
        prefix_filter_jaccard_join(df, threshold=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
