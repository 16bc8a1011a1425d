from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.skew import broadcast_threshold_join, salted_join


def test_salted_join_matches_plain_join(spark):
    # hot key: 'k0' appears 5000 times on the big side
    big = spark.createDataFrame(
        [(f"k{i % 10}" if i % 2 else "k0", i) for i in range(10000)], ["key", "v"]
    )
    small = spark.createDataFrame([(f"k{i}", f"dim{i}") for i in range(10)], ["key", "d"])
    plain = big.join(small, "key").groupBy("key").count()
    salted = salted_join(big, small, "key").groupBy("key").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_spreads_hot_key(spark):
    """The salted big side must hash the hot key into multiple shuffle
    sub-keys (that's the whole point)."""
    big = spark.createDataFrame([("hot", i) for i in range(2000)], ["key", "v"])
    salted = big.withColumn("_salt", F.pmod(F.xxhash64(F.rand(seed=11)), F.lit(16)))
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets >= 12  # 2000 draws over 16 salts: all-ish buckets hit


def test_broadcast_threshold_picks_broadcast(spark):
    big = spark.createDataFrame([(f"k{i % 5}", i) for i in range(100)], ["key", "v"])
    small = spark.createDataFrame([(f"k{i}", i) for i in range(5)], ["key", "d"])
    out = broadcast_threshold_join(big, small, "key")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 100


def test_broadcast_threshold_falls_back_to_salted(spark):
    big = spark.createDataFrame([(f"k{i % 5}", i) for i in range(100)], ["key", "v"])
    small = spark.createDataFrame([(f"k{i}", i) for i in range(5)], ["key", "d"])
    out = broadcast_threshold_join(big, small, "key", broadcast_max_rows=2)
    assert out.count() == 100  # salted path, same result


def test_broadcast_threshold_probe_bounded(spark):
    """Same bounded-probe contract for the generic join utility: an
    over-threshold 'small' side of ~2^40 rows must be detected in
    bounded time and routed to the salted join."""
    import time

    from pyspark.sql import functions as F

    from zparse_spark.operators.skew import broadcast_threshold_join

    big = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    huge = spark.range(1 << 40).select(
        F.col("id").alias("k"), F.lit(2).alias("w")
    ).filter("k >= 0")
    t0 = time.perf_counter()
    out = broadcast_threshold_join(big, huge, "k", broadcast_max_rows=50)
    assert time.perf_counter() - t0 < 30
    assert "_salt" not in out.columns  # salted path taken, salt dropped


def test_key_skew_profile_hand_case(spark):
    """10×a + 5×b + 5×NULL: max_key 'a' (count 10), top_share 0.5,
    entropy = ln(20) − (10·ln10 + 2·5·ln5)/20, salt 4 at target 3."""
    import math

    from zparse_spark.operators.skew import key_skew_profile

    rows = [("a",)] * 10 + [("b",)] * 5 + [(None,)] * 5
    df = spark.createDataFrame(rows, "k string").repartition(4)
    r = key_skew_profile(df, "k", target_rows_per_task=3).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_key"], r["max_count"]) == (20, 3, "a", 10)
    assert r["top_share"] == 0.5
    expect_h = math.log(20) - (10 * math.log(10) + 2 * (5 * math.log(5))) / 20
    assert r["entropy_nats"] == round(expect_h, 6)
    assert r["salt_factor"] == 4


def test_key_skew_profile_tie_breaks_min_key(spark):
    from zparse_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame([("z",), ("z",), ("a",), ("a",)], "k string")
    r = key_skew_profile(df, "k").collect()[0]
    assert r["max_key"] == "a" and r["salt_factor"] == 1
    assert r["top_share"] == 0.5


def test_key_skew_profile_uniform_entropy(spark):
    """All-distinct keys: entropy = ln(n_keys) exactly (n·ln(n) = 0 per
    key), salt 1 — 'no salting needed' is the common-case answer."""
    import math

    from zparse_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame([(str(i),) for i in range(64)], "k string")
    r = key_skew_profile(df, "k").collect()[0]
    assert r["entropy_nats"] == round(math.log(64), 6)
    assert r["max_count"] == 1 and r["salt_factor"] == 1
