"""Data-layout operators — clustering for scan pruning at lakehouse scale.

At 10^12 rows the cheapest predicate is the one that never opens a
file: parquet/Iceberg min-max stats prune splits only when the layout
co-locates similar values. Sorting handles ONE column; multi-dimensional
pruning (the R1 probe by media_ref AND partition, the events scan by
user AND day) needs a space-filling curve. This module implements
Z-order (Morton) clustering as plain column arithmetic — bit
interleaving is a codegen expression, so the whole layout pass is
map + one range shuffle, no UDFs.

Reference parity note: the reference is a single-document parser with no
storage layout (SURVEY.md §2.4 disposition); this is engine-side
infrastructure the 10^12-doc target demands, same category as the
manifest/resume machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of k non-negative int columns into one
    long: bit b of column i lands at position b*k + i. Inputs must
    already be normalized to [0, 2^bits) — pair with ``rank_bucketize``
    for arbitrary distributions. k*bits must fit a signed long (≤ 63).

    Pure shift/mask arithmetic (whole-stage codegen, identical semantics
    in any SQL engine), so layout decisions stay oracle-checkable.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * k + i
            )
    return out


def rank_bucketize(df: DataFrame, col: str, bits: int = 16, probes: int | None = None) -> Column:
    """Map an arbitrary numeric column onto [0, 2^bits) by its quantile
    rank, using ``approx_percentile`` boundaries collected ONCE (≤ 2^bits
    values — bound ``bits`` accordingly; 8-10 is plenty for pruning).
    The returned column is the count of boundaries strictly below the
    value — a broadcastable literal-array expression, no window, no
    global sort. NULLs map to bucket 0 (they prune together).
    """
    n = probes or (1 << bits)
    if n > 4096:
        raise ValueError("rank_bucketize collects one boundary per bucket; cap bits at 12")
    qs = [i / n for i in range(1, n)]
    row = df.select(
        F.expr(
            f"approx_percentile({col}, array({', '.join(str(q) for q in qs)}), 10000)"
        ).alias("b")
    ).first()
    bounds = [float(x) for x in (row["b"] or [])]
    v = F.col(col)
    out = F.lit(0).cast("long")
    for b in bounds:
        out = out + F.when(v > F.lit(b), 1).otherwise(0).cast("long")
    return F.when(v.isNull(), F.lit(0).cast("long")).otherwise(out)


def cluster_by_zorder(
    df: DataFrame, zcol: Column, n_ranges: int = 200
) -> DataFrame:
    """Physically cluster rows along a precomputed z-value: ONE range
    shuffle (sampled boundaries, no global sort) + an intra-partition
    sort that folds into the shuffle's sort-based write. Writing the
    result gives every output file a tight z-interval, which is exactly
    what min-max pruning on the *constituent* columns needs — a query
    box touches O(perimeter) files instead of all of them.
    """
    return (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_ranges, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def file_sizing_plan(
    docs: DataFrame,
    target_mb: float = 128,
    partition_col: str = "partition",
    spans_col: str = "spans",
    overhead_bytes: int = 64,
) -> DataFrame:
    """Compaction / file-sizing plan per table partition — the planning
    half of Iceberg table maintenance (OPTIMIZE / rewrite_data_files
    needs a target file count per partition BEFORE it shuffles
    anything; guessing it wrong either leaves the small-files problem
    in place or builds multi-GB files no executor wants to read).

    Estimated bytes = Σ span text chars + per-span overhead (struct
    framing, offsets, dictionary slots) — a deliberate, stated proxy:
    real parquet sizes depend on encoding, but the RELATIVE partition
    weights the plan needs survive the approximation, and the estimate
    is reproducible in any engine (no file-system introspection).
    ``recommended_files = max(1, ceil(est_bytes / target))``, plus
    rows_per_file so the executor of the plan can repartitionByRange
    without re-scanning.

    One map-side-combining groupBy(partition); the plan table is
    partition-count sized. The per-doc byte estimate is a map-only
    array fold (no explode, no Python).
    """
    doc_bytes = (
        F.coalesce(
            F.aggregate(
                F.col(spans_col),
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.length(F.coalesce(s["text"], F.lit("")))
                + F.lit(overhead_bytes),
            ),
            F.lit(0).cast("long"),
        )
    )
    target = int(float(target_mb) * 1024 * 1024)
    agg = docs.groupBy(F.col(partition_col).alias("partition")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(doc_bytes).alias("est_bytes"),
    )
    rec = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("est_bytes") / F.lit(target)).cast("long"),
    )
    return agg.select(
        "partition",
        "n_docs",
        "est_bytes",
        rec.alias("recommended_files"),
        F.ceil(F.col("n_docs") / rec).cast("long").alias("rows_per_file"),
    )
