"""Iterative graph analytics on edge DataFrames — PageRank.

Connected components (the other graph fixpoint the engine needs) live
in ``operators.dedup`` (large-star/small-star, X12); this module holds
the NUMERIC fixpoint: power-iteration PageRank over a weighted directed
edge table, the importance prior a training-data pipeline uses to
weight/sample sources (link-quality weighting a la CommonCrawl-derived
corpora).

Scale discipline for iterative Spark jobs, encoded here:

- The transition matrix (edge weight / source out-weight) is computed
  ONCE and cached — every iteration reuses the same partitioning of the
  same immutable table, so Catalyst reuses its shuffle output instead
  of recomputing the normalization per step.
- Each iteration is exactly one join (ranks to transitions, keyed by
  src) + one groupBy(dst) with map-side combine — the minimal shuffle
  pair for a sparse mat-vec.
- Ranks are re-persisted and the PREVIOUS iteration unpersisted each
  step, and every ``checkpoint_every`` steps the lineage is truncated
  with ``localCheckpoint`` — unbounded lineage is what kills long
  power iterations at cluster scale (stack-depth + replay cost), not
  the math.

Reference parity: the reference has no graph operator; this is part of
the beyond-reference training-pipeline surface (SURVEY.md §2 X-series),
built on the same exact/deterministic contract — fixed iteration count,
no convergence-dependent control flow, so two engines and two cluster
sizes produce the identical plan and (to round-6) identical ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank by ``iterations`` power steps (fixed count, no
    convergence test — deterministic plan shape).

    rank'(v) = (1-d)/N + d * sum over in-edges (u,v) of
               rank(u) * w(u,v) / out_weight(u).

    Dangling nodes (no out-edges) are supported: their mass is
    redistributed uniformly each step (the standard correction), via a
    1-row broadcast aggregate — never a driver collect of ranks.

    Returns (node, rank) for every node appearing as src or dst; ranks
    sum to 1 up to float addition. Round on output if hash-comparing
    across engines.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
        w_col.alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # also materializes the persist
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .persist()
    )
    trans.count()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")).persist()
    base = (1.0 - damping) / n_nodes
    src_nodes = outw.select(F.col("src").alias("node")).persist()
    for it in range(iterations):
        contrib = (
            ranks.withColumnRenamed("node", "src")
            .join(trans, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("c"))
        )
        # dangling mass: rank not forwarded by any out-edge this step
        dangling = ranks.join(src_nodes, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist()
            new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    return ranks
