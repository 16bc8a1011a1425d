"""PageRank: hand-checked fixpoint, dangling mass, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.operators.graph import pagerank


def test_pagerank_two_node_symmetric(spark):
    """A <-> B with equal weights: ranks stay exactly 0.5 each at every
    iteration (the symmetric fixpoint), and sum to 1."""
    e = spark.createDataFrame([("a", "b", 1.0), ("b", "a", 1.0)], ["src", "dst", "weight"])
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    assert abs(out["a"] - 0.5) < 1e-12 and abs(out["b"] - 0.5) < 1e-12


def test_pagerank_dangling_and_star(spark):
    """Hub-and-spoke with a dangling sink: mass is redistributed (ranks
    still sum to 1) and the hub outranks the spokes."""
    edges = [("s1", "hub", 1.0), ("s2", "hub", 1.0), ("s3", "hub", 1.0)]
    e = spark.createDataFrame(edges, ["src", "dst", "weight"])
    rows = pagerank(e, iterations=10).collect()
    out = {r["node"]: r["rank"] for r in rows}
    assert abs(sum(out.values()) - 1.0) < 1e-9  # dangling hub mass conserved
    assert out["hub"] > out["s1"] == out["s2"] == out["s3"]


def test_pagerank_weighted_split_hand_step(spark):
    """One power step by hand: a splits 3:1 to b,c; b,c return to a.
    After 1 iteration with d=0.85, N=3:
    rank(b) = 0.05 + 0.85*(1/3)*0.75, rank(c) = 0.05 + 0.85*(1/3)*0.25."""
    e = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "weight"],
    )
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=1).collect()}
    third = 1.0 / 3.0
    assert abs(out["b"] - (0.05 + 0.85 * third * 0.75)) < 1e-12
    assert abs(out["c"] - (0.05 + 0.85 * third * 0.25)) < 1e-12
    assert abs(out["a"] - (0.05 + 0.85 * (third + third))) < 1e-12
