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
