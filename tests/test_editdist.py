from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from zparse_spark.operators.editdist import (
    bounded_edit_distance_join,
    deletion_variants,
)


def _lev(a: str, b: str) -> int:
    # textbook DP, the independent truth for the property check
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def _pairs(df):
    return {
        (r.id_a, r.id_b, r.dist)
        for r in df.collect()
    }


def test_deletion_variants_k1(spark):
    df = spark.createDataFrame([("abc",)], ["s"]).select(
        deletion_variants(F.col("s"), k=1).alias("v")
    )
    got = set(df.collect()[0].v)
    assert got == {"abc", "bc", "ac", "ab"}


def test_deletion_variants_empty_and_single(spark):
    df = spark.createDataFrame([("",), ("x",)], ["s"]).select(
        "s", deletion_variants(F.col("s"), k=1).alias("v")
    )
    rows = {r.s: set(r.v) for r in df.collect()}
    assert rows[""] == {""}
    assert rows["x"] == {"x", ""}


def test_deletion_variants_k2(spark):
    df = spark.createDataFrame([("abcd",)], ["s"]).select(
        deletion_variants(F.col("s"), k=2).alias("v")
    )
    got = set(df.collect()[0].v)
    want = {"abcd"}
    for i in range(4):
        want.add("abcd"[:i] + "abcd"[i + 1:])
    for v in list(want):
        for i in range(len(v)):
            want.add(v[:i] + v[i + 1:])
    assert got == want


def test_planted_edit_kinds(spark):
    # substitution, insertion, deletion, transposition (= 2), unrelated
    rows = [
        ("1", "kitten"),
        ("2", "sitten"),   # sub, ed=1 to kitten
        ("3", "kittens"),  # insert, ed=1 to kitten
        ("4", "kittn"),    # delete, ed=1 to kitten... wait: kitten -> kittn deletes 'e'
        ("5", "iktten"),   # transposition of kitten, ed=2
        ("6", "puppy"),
    ]
    df = spark.createDataFrame(rows, ["id", "k"])
    got1 = _pairs(bounded_edit_distance_join(df, "id", "k", k=1))
    assert ("1", "2", 1) in got1
    assert ("1", "3", 1) in got1
    assert ("1", "4", 1) in got1
    assert all(p[0] != "5" and p[1] != "5" for p in got1)
    assert all("6" not in (p[0], p[1]) for p in got1)

    got2 = _pairs(bounded_edit_distance_join(df, "id", "k", k=2))
    assert ("1", "5", 2) in got2
    assert got1 <= got2


def test_matches_brute_force_k1_and_k2(spark):
    # adversarial small universe: shared prefixes/suffixes, repeats,
    # empty string, unicode
    keys = [
        "", "a", "b", "ab", "ba", "aa", "aab", "abb", "abc", "acb",
        "abcd", "xabc", "abcx", "aXcd", "répé", "repé", "aaaa", "aaab",
    ]
    rows = [(str(i), k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["id", "k"])
    for k in (1, 2):
        want = set()
        for (ia, ka), (ib, kb) in itertools.combinations(rows, 2):
            d = _lev(ka, kb)
            if d <= k:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                want.add((lo, hi, d))
        got = _pairs(bounded_edit_distance_join(df, "id", "k", k=k))
        assert got == want, f"k={k}: {got ^ want}"


def test_max_bucket_degrades_not_explodes(spark):
    # 30 identical keys: every pair is ed=0; with max_bucket=5 the
    # operator must still run and return a subset of true pairs only
    rows = [(f"{i:02d}", "same") for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "k"])
    capped = bounded_edit_distance_join(df, "id", "k", k=1, max_bucket=5)
    got = _pairs(capped)
    assert got  # the first 5 ids still pair
    assert all(d == 0 and a < b for a, b, d in got)
    full = _pairs(bounded_edit_distance_join(df, "id", "k", k=1))
    assert len(full) == 30 * 29 // 2
    assert got <= full


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([("1", "abc"), ("2", "abd")], ["id", "k"])
    plan = bounded_edit_distance_join(df, "id", "k", k=1)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_jaro_winkler_matches_duckdb_reference(spark):
    """Two independent implementations of the JW spec must agree: the
    Arrow-batched pandas UDF vs DuckDB's built-in, over textbook cases,
    edge cases, and 300 seeded random pairs."""
    import random

    import duckdb

    rng = random.Random(42)
    pairs = [
        ("martha", "marhta"),
        ("dwayne", "duane"),
        ("dixon", "dicksonx"),
        ("", ""),
        ("", "abc"),
        ("a", "a"),
        ("abcdefgh", "abcdxxxx"),
    ] + [
        (
            "".join(rng.choice("abcde") for _ in range(rng.randint(0, 10))),
            "".join(rng.choice("abcde") for _ in range(rng.randint(0, 10))),
        )
        for _ in range(300)
    ]
    from zparse_spark.operators.editdist import jaro_winkler

    df = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["jw"]
        for r in df.select("a", "b", jaro_winkler(F.col("a"), F.col("b")).alias("jw")).collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(got[(a, b)] - want) < 1e-9, (a, b, got[(a, b)], want)


def test_jaro_winkler_join_blocks_then_scores(spark):
    """The join output is the lev<=1 candidate set with a jw column;
    thresholding keeps only high-similarity survivors and NULL keys
    never crash the UDF."""
    from zparse_spark.operators.editdist import jaro_winkler_join

    rows = [
        (1, "Customer#000000001"),
        (2, "Customer#000000002"),
        (3, "Xustomer#000000001"),
        (4, None),
        (5, "zz"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = jaro_winkler_join(df, id_col="id", key_col="name", k_block=1).collect()
    pairs = {(r["id_a"], r["id_b"]): (r["dist"], r["jw"]) for r in out}
    assert ("1", "2") in pairs and ("1", "3") in pairs
    # prefix-weighted: the last-char edit (1,2) outranks the first-char edit (1,3)
    assert pairs[("1", "2")][1] > pairs[("1", "3")][1]
    # JW(1,2) = 0.977778 (last-char edit, full prefix boost); JW(1,3)
    # has no common prefix so the boost never applies
    hi = jaro_winkler_join(df, id_col="id", key_col="name", k_block=1, threshold=0.97).collect()
    assert {(r["id_a"], r["id_b"]) for r in hi} == {("1", "2")}
