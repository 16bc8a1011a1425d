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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# zone-map / data-skipping effectiveness audit
# ---------------------------------------------------------------------------


def zone_maps(df: DataFrame, col: str, file_col: str) -> DataFrame:
    """Per-file zone maps (min/max/count of ``col`` under a file
    assignment) — the statistics Iceberg/Parquet footers keep and the
    planner prunes with. ONE groupBy on the file id (map-side combined;
    output is |files| rows). Input ``file_col`` is any deterministic
    row->file assignment: a real partition/file column, or a candidate
    layout being evaluated before a rewrite."""
    return df.groupBy(F.col(file_col).alias("file_id")).agg(
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.count(col).alias("n_rows"),
    )


def skipping_audit(
    zmaps: DataFrame,
    probes: DataFrame,
    probe_col: str = "p",
    layout_col: str | None = "layout",
) -> DataFrame:
    """Data-skipping effectiveness of a layout's zone maps: for each
    probe value, how many files a point predicate ``col = p`` must scan
    (files whose [min, max] contains p) — the question "would this
    clustering survive at scale" answered with numbers instead of
    vibes. A perfectly clustered layout touches ~1 file per probe; a
    hash/random layout touches ~all of them, and that ratio is the
    read amplification a 100 TB table pays on every selective query.

    Plan shape: the zone-map table is |files| rows — it BROADCASTS to
    the probe side and the containment test is a codegen range
    predicate, so the audit costs |probes| x |files| comparisons on
    bounded inputs, never a scan of the data. Output per layout:
    n_files, n_probes, avg/max files hit, and avg_hit_frac (files hit /
    files in layout).
    """
    keys = [layout_col] if layout_col else []
    if layout_col:
        # every probe is evaluated against EVERY layout (zero-hit probes
        # must count as 0 for their layout, not vanish into a NULL group);
        # the probe side's layout gets its own name so the join predicate
        # is unambiguous rather than relying on plan-id disambiguation
        probes = probes.crossJoin(
            F.broadcast(
                zmaps.select(F.col(layout_col).alias("_probe_layout")).distinct()
            )
        )
    cond = (F.col(probe_col) >= F.col("mn")) & (F.col(probe_col) <= F.col("mx"))
    if layout_col:
        cond = cond & (F.col("_probe_layout") == F.col(layout_col))
    hits = (
        probes.join(F.broadcast(zmaps), cond, "left")
        .groupBy(
            *([F.col("_probe_layout").alias(layout_col)] if layout_col else []),
            F.col(probe_col),
        )
        .agg(F.count("file_id").alias("files_hit"))
    )
    nf = zmaps.groupBy(*[F.col(k) for k in keys]) if keys else zmaps.groupBy()
    files_per_layout = nf.agg(F.count(F.lit(1)).alias("n_files"))
    agg = hits.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.round(F.avg("files_hit"), 6).alias("avg_files_hit"),
        F.max("files_hit").alias("max_files_hit"),
    )
    out = (
        agg.join(F.broadcast(files_per_layout), keys)
        if keys
        else agg.crossJoin(F.broadcast(files_per_layout))
    )
    return out.select(
        *keys,
        "n_files",
        "n_probes",
        "avg_files_hit",
        "max_files_hit",
        F.round(F.col("avg_files_hit") / F.col("n_files"), 6).alias("avg_hit_frac"),
    )


def compaction_bins(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    file_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction plan: group each partition's files into
    merge bins of ~``target_bytes`` (the Iceberg ``binPack`` rewrite
    shape). Files are taken in deterministic (size desc, file_id) order
    and a bin collects files while its exclusive prefix sum is under the
    target — sequential scan packing, expressible as ONE window cumsum
    instead of an iterative first-fit loop, with the classic bound that
    a bin overflows by at most one file. Determinism (the sort key is a
    total order) means a re-run or another engine emits the identical
    plan — a resumable compaction job can commit bins independently.

    Input is the FILE MANIFEST (|files| rows), never the data: the plan
    costs one window over the manifest partitioned by the table
    partition. Output: (partition, bin, n_files, bin_bytes,
    over_target) — over_target flags bins a single jumbo file pushed
    past the target (they are 'already compact'; rewriting them is
    wasted IO).
    """
    w = Window.partitionBy(partition_col).orderBy(
        F.col(bytes_col).desc(), F.col(file_col)
    )
    staged = files.withColumn(
        "_pre", F.coalesce(F.sum(bytes_col).over(w), F.lit(0)) - F.col(bytes_col)
    ).withColumn("bin", F.floor(F.col("_pre") / F.lit(float(target_bytes))))
    return (
        staged.groupBy(partition_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(bytes_col).alias("bin_bytes"),
        )
        .select(
            partition_col,
            F.col("bin").cast("long").alias("bin"),
            "n_files",
            "bin_bytes",
            (F.col("bin_bytes") > target_bytes).alias("over_target"),
        )
    )


def expire_snapshots_plan(
    refs: DataFrame,
    cutoff_snapshot: int,
    snapshot_col: str = "snapshot_id",
    file_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Snapshot-expiry GC plan (Iceberg ``expireSnapshots`` shape):
    given the snapshot→file reference table (one row per (snapshot,
    file) the manifests record), expiring every snapshot older than
    ``cutoff_snapshot`` makes a file RECLAIMABLE iff no retained
    snapshot references it — i.e. its newest reference is below the
    cutoff. Emits one row per file with its newest/oldest reference,
    byte size and the verdict, so the caller can both delete and audit
    (the sibling of compaction_bins: that plans merges of LIVE files,
    this plans deletion of DEAD ones; both run on the manifest table,
    never the data).

    Scale shape: ONE map-combined groupBy(file) over the reference
    table (manifest-sized: millions of rows at 10^12 docs, not
    trillions) — no join, no window, no driver collect. Pure integer
    comparisons, exact in any engine.
    """
    g = refs.groupBy(file_col).agg(
        F.max(snapshot_col).alias("last_ref"),
        F.min(snapshot_col).alias("first_ref"),
        F.count(F.lit(1)).alias("n_refs"),
        F.max(bytes_col).alias("bytes"),
    )
    return g.select(
        file_col,
        "first_ref",
        "last_ref",
        "n_refs",
        "bytes",
        (F.col("last_ref") < cutoff_snapshot).alias("reclaimable"),
    )


def zone_overlap_depth(
    zmaps: DataFrame,
    layout_col: str | None = "layout",
) -> DataFrame:
    """Clustering-depth audit over a zone-map table: for each file,
    how many OTHER files' [min, max] ranges intersect its own — the
    Iceberg/Delta "overlap depth" metric that decides when a re-sort
    (cluster_by_zorder + compaction_bins) pays for itself. A perfectly
    range-clustered layout has depth 0 everywhere (disjoint ranges →
    every point predicate prunes to one file); a hash layout has depth
    ≈ |files|−1 (every range spans the domain). skipping_audit
    measures the symptom per PROBE; this measures the cause per FILE,
    with no probe set needed.

    Scale shape: the quadratic interval join runs on the ZONE-MAP
    table (|files| rows — thousands of manifests at 10^12 docs, never
    data); intersection is the standard half-open test
    a.mn <= b.mx AND b.mn <= a.mx, self-pairs excluded.
    """
    key = [layout_col] if layout_col else []
    a, b = zmaps.alias("a"), zmaps.alias("b")
    cond = (
        (F.col("a.mn") <= F.col("b.mx"))
        & (F.col("b.mn") <= F.col("a.mx"))
        & (F.col("a.file_id") != F.col("b.file_id"))
    )
    for k in key:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    overlaps = a.join(b, cond, "left").groupBy(
        *[F.col(f"a.{k}").alias(k) for k in key],
        F.col("a.file_id").alias("file_id"),
        F.col("a.n_rows").alias("n_rows"),
    ).agg(F.count(F.col("b.file_id")).alias("overlap_depth"))
    return overlaps
