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


def interval_overlap_join(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
    bin_width: int = 32,
) -> DataFrame:
    """Self-join of intervals on OVERLAP (closed ends), per group:
    every pair (id_a < id_b) with ``[s_a,e_a] ∩ [s_b,e_b] != ∅``,
    with the intersection bounds. Start/end must be integral (epoch
    days/seconds — cast dates first).

    Scale shape: the naive formulation is a theta join (cartesian per
    group). Here each interval explodes to the grid bins it touches
    (``floor(s/W)..floor(e/W)``, ~len/W + 1 rows) and pairs meet by an
    EQUI-join on (group, bin) — shuffle keyed, AQE-splittable, never
    cartesian.

    The usual cost of grid joins is pair dedup (a pair meeting in k
    shared bins appears k times → a ``distinct`` shuffle as big as the
    match set). This operator is dedup-FREE: an overlapping pair is
    KEPT ONLY in the bin of its overlap start, ``floor(max(s_a,s_b)/W)``
    — a bin both intervals provably touch (max-start <= min-end) and
    that identifies each pair exactly once, so the filter replaces the
    distinct. One explode, one equi-join, zero dedup shuffles.

    Validation framing: overlap is the span-offset S2 rule
    (operators/rules.py) lifted from within-document span arrays to a
    table-wide interval set — "no two shipment windows for one part
    may collide" style contracts.
    """
    group_cols = list(group_cols or [])
    W = int(bin_width)
    if W <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    base = df.select(
        *group_cols,
        F.col(id_col).cast("string").alias("_id"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    ).filter(
        F.col("_s").isNotNull() & F.col("_e").isNotNull() & (F.col("_s") <= F.col("_e"))
    )
    binned = base.select(
        *group_cols,
        "_id",
        "_s",
        "_e",
        F.explode(
            F.sequence(F.floor(F.col("_s") / W), F.floor(F.col("_e") / W))
        ).alias("_bin"),
    )
    l, r = binned.alias("l"), binned.alias("r")
    on = (F.col("l._bin") == F.col("r._bin")) & (F.col("l._id") < F.col("r._id"))
    for g in group_cols:
        on = on & F.col(f"l.{g}").eqNullSafe(F.col(f"r.{g}"))
    ov_start = F.greatest(F.col("l._s"), F.col("r._s"))
    ov_end = F.least(F.col("l._e"), F.col("r._e"))
    return (
        l.join(r, on)
        .filter(ov_start <= ov_end)  # true overlap
        .filter(F.col("l._bin") == F.floor(ov_start / W))  # count-once bin
        .select(
            *[F.col(f"l.{g}").alias(g) for g in group_cols],
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            ov_start.alias("overlap_start"),
            ov_end.alias("overlap_end"),
        )
    )
