"""As-of join — an operator Spark's DataFrame API lacks.

``asof_join(left, right, on, by)``: for every left row, attach the most
recent right row with ``right.on <= left.on`` within the same ``by`` key
(the classic trades↔quotes shape; here: event ↔ latest catalog state).

Implementation is the scalable union+window formulation, NOT a range
cross join:

1. tag both inputs and union them on (by, on) — one dataset,
2. one window per ``by`` key ordered by (on, side): ``last(right_value,
   ignorenulls=True)`` over rows-unbounded-preceding carries the latest
   right payload forward,
3. keep left rows.

Cost: ONE shuffle on the by-key (the window), no row explosion — vs the
naive ``left.on >= right.on`` range join which Spark executes as a
partial cross product. Ties: a right row at exactly left.on matches
(sort puts side=0/right before side=1/left at equal timestamps).
DuckDB's native ASOF JOIN provides the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join. ``value_cols``: right columns to carry (default:
    all right columns except on/by). Output: left columns + carried
    columns (NULL when no right row precedes)."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    lcols = left.columns

    tagged_r = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy("_by")
        .orderBy("_on", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
) -> DataFrame:
    """Point-in-interval join without a cross product: both sides are
    exploded onto a shared grid of bins (interval → every bin it
    overlaps; point → its bin), equi-joined on the bin, then the exact
    predicate filters. Shuffle is O(rows × bins-per-interval), not
    |points| × |intervals|. ``bin_width`` should be ~the median interval
    length."""
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bin_width).cast("long"))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("long"),
                F.floor(F.col(end_col) / bin_width).cast("long"),
            )
        ),
    )
    return p.join(i, "_bin").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    ).drop("_bin")
