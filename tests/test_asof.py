from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.asof import asof_join, range_join_binned


def test_asof_join_basic(spark):
    left = spark.createDataFrame([(1, 5), (1, 15), (1, 2), (2, 7)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 3, "a"), (1, 10, "b"), (2, 7, "x")], ["k", "t", "v"]
    )
    out = {(r["k"], r["t"]): r["asof_v"] for r in asof_join(left, right, on="t", by="k").collect()}
    assert out == {
        (1, 2): None,  # nothing at or before t=2
        (1, 5): "a",
        (1, 15): "b",
        (2, 7): "x",  # tie: right at exactly t matches
    }


def test_asof_join_single_shuffle_no_cross_product(spark):
    left = spark.createDataFrame([(1, i) for i in range(100)], ["k", "t"])
    right = spark.createDataFrame([(1, i * 10, i) for i in range(10)], ["k", "t", "v"])
    out = asof_join(left, right, on="t", by="k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 2  # union sides feed ONE window shuffle
    assert out.count() == 100


def test_range_join_binned_matches_naive(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(50)], ["pid", "x"])
    intervals = spark.createDataFrame(
        [(j, j * 7.0, j * 7.0 + 10.0) for j in range(8)], ["iid", "lo", "hi"]
    )
    fast = range_join_binned(points, intervals, "x", "lo", "hi", bin_width=10.0)
    naive = points.crossJoin(intervals).filter(
        (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
    )
    f = {(r["pid"], r["iid"]) for r in fast.collect()}
    n = {(r["pid"], r["iid"]) for r in naive.collect()}
    assert f == n and len(f) > 0


def test_range_join_no_cartesian(spark):
    """The binned formulation must compile to an equi-join on the bin,
    never a CartesianProduct/BroadcastNestedLoopJoin."""
    from pyspark.sql import functions as F

    from zparse_spark.operators.asof import range_join_binned

    pts = spark.range(100).select(F.col("id").alias("p"), (F.col("id") * 1.0).alias("x"))
    iv = spark.range(10).select(
        (F.col("id") * 10.0).alias("s"), (F.col("id") * 10.0 + 15.0).alias("e")
    )
    plan = (
        range_join_binned(pts, iv, "x", "s", "e", bin_width=10.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
