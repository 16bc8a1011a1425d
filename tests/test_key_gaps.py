from __future__ import annotations

import itertools

from zparse_spark.operators.stats import key_gaps


def _got(df, grouped=False):
    if grouped:
        return {(r.g, r.prev_key, r.next_key, r.n_missing) for r in df.collect()}
    return {(r.prev_key, r.next_key, r.n_missing) for r in df.collect()}


def _brute(keys):
    ks = sorted(set(keys))
    return {
        (a, b, b - a - 1)
        for a, b in zip(ks, ks[1:])
        if b - a > 1
    }


def test_planted_gaps_cross_bin_and_empty_bin_runs(spark):
    # bin_size=4: gaps inside a bin, across adjacent bins, and across
    # a RUN of entirely empty bins (8..39 missing spans 8 empty bins)
    keys = [0, 1, 2, 5, 6, 7, 40, 41, 43, 100]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = _got(key_gaps(df, "k", bin_size=4))
    assert got == _brute(keys)


def test_bin_size_invariance_and_duplicates(spark):
    keys = [3, 3, 3, 7, 8, 20, 21, 22, 22, 59, 60, 1000]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    want = _brute(keys)
    for bs in (1, 2, 5, 7, 4096):
        assert _got(key_gaps(df, "k", bin_size=bs)) == want, bs


def test_groups_do_not_bleed(spark):
    rows = [("a", k) for k in (1, 2, 10)] + [("b", k) for k in (2, 3, 4)]
    df = spark.createDataFrame(rows, ["g", "k"])
    got = _got(key_gaps(df, "k", group_cols=["g"], bin_size=4), grouped=True)
    assert got == {("a", 2, 10, 7)}


def test_dense_and_singleton_and_nulls(spark):
    rows = [(1,), (2,), (3,), (None,)]
    df = spark.createDataFrame(rows, "k bigint")
    assert _got(key_gaps(df, "k", bin_size=2)) == set()
    assert _got(key_gaps(spark.createDataFrame([(5,)], "k bigint"), "k")) == set()


def test_negative_keys(spark):
    # floor-division binning must behave for negative keys too
    keys = [-7, -6, -1, 0, 3]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    assert _got(key_gaps(df, "k", bin_size=4)) == _brute(keys)
