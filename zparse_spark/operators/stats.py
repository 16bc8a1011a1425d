"""Column statistics — one-pass profiles, histograms, quantiles.

The engine's generalization of the reference's scalar fold counters
(bytes_parsed/depth, crates/zparse/src/json/parser.rs:85-86,124): per-
column null rate, min/max, avg, distinct estimates, histograms, and
quantiles, computed with Catalyst partial+final aggregation (map-side
combine for free).

Quantiles at scale, three tiers:
- exact ``percentile`` (sorts per group — small data / oracle checks)
- ``percentile_approx`` (built-in GK sketch — the default at 100 TB)
- t-digest via ``applyInPandas`` partial sketches + merge — tighter
  tail accuracy than GK; the UDAF-style pattern SURVEY.md §4.3 documents.
  Pure numpy, Arrow-batched, deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Tidy one-row-per-column profile in ONE aggregate pass.

    All per-column aggregates are computed in a single ``agg`` (one scan,
    partial+final) and reshaped driver-side with ``stack`` — no second
    scan, no collect of data rows.
    """
    cols = cols or [f.name for f in df.schema.fields]
    aggs = []
    numeric = set()
    for c in cols:
        dt = dict(df.dtypes)[c]
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.approx_count_distinct(c).alias(f"{c}__approx_distinct"),
        ]
        # decimal dtypes carry precision/scale ("decimal(10,2)"), so
        # membership must be a prefix test, not an exact match
        if dt in ("bigint", "int", "smallint", "tinyint", "double", "float") or dt.startswith(
            "decimal"
        ):
            numeric.add(c)
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                # avg over decimal yields decimal(p,s) — cast so the
                # stack() reshape sees one uniform double column
                F.avg(c).cast("double").alias(f"{c}__avg"),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"{c}__min"),
                F.lit(None).cast("double").alias(f"{c}__max"),
                F.lit(None).cast("double").alias(f"{c}__avg"),
            ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nonnull`, `{c}__approx_distinct`, "
        f"`{c}__min`, `{c}__max`, `{c}__avg`"
        for c in cols
    )
    tall = wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as "
        "(column, n_rows, n_nonnull, approx_distinct, min, max, avg)"
    )
    return tall.withColumn(
        "null_rate",
        F.round((F.col("n_rows") - F.col("n_nonnull")) / F.col("n_rows"), 6),
    )


def inclusion_coefficient(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Inclusion-dependency strength child ⊆ parent — the profiling
    measurement behind foreign-key DISCOVERY (R1 enforces a declared
    reference; this finds undeclared ones, the IND half of the TANE/
    profiling family next to fd_confidence): the fraction of the
    child's distinct non-NULL values present in the parent, plus
    counts and up-to-3 example violators for triage.

    One row out: (n_child_distinct, n_matched, inclusion, examples).
    inclusion = 1.0 ⇒ a clean FK candidate; just-under-1 ⇒ a dirty one
    (exactly what aggregate_reconciliation/R1 then enforce).

    Scale shape: BOTH sides reduce to distinct value sets first (map-
    side combining aggregates), so the join runs on the reduced domains
    — never row×row; examples come from a bounded sort on the (small)
    unmatched set.
    """
    c = child.select(F.col(child_col).alias("_v")).filter(F.col("_v").isNotNull()).distinct()
    p = parent.select(F.col(parent_col).alias("_v")).filter(F.col("_v").isNotNull()).distinct()
    marked = c.join(p.withColumn("_hit", F.lit(True)), "_v", "left")
    return marked.agg(
        F.count(F.lit(1)).alias("n_child_distinct"),
        F.sum(F.col("_hit").isNotNull().cast("long")).alias("n_matched"),
        F.round(
            F.sum(F.col("_hit").isNotNull().cast("long")) / F.count(F.lit(1)), 6
        ).alias("inclusion"),
        F.slice(
            F.sort_array(
                F.collect_list(F.when(F.col("_hit").isNull(), F.col("_v").cast("string")))
            ),
            1,
            3,
        ).alias("examples"),
    )


def key_candidate_score(df: DataFrame, cols: list[str]) -> DataFrame:
    """Primary-key candidacy of a column combination: distinct combos /
    rows (1.0 ⇒ unique key — what U1 then enforces table-wide), with
    NULL-bearing combos counted separately (a key column must be
    NOT NULL; SQL uniqueness ignores NULLs, so a high ratio with many
    null combos is a trap this surfaces). One aggregate pass + one
    count_distinct over the struct — the multi-column generalization of
    profile_snapshot_diff's cardinality leg.
    """
    combo = F.struct(*[F.col(c) for c in cols])
    any_null = sum(
        (F.col(c).isNull().cast("int") for c in cols), F.lit(0)
    ) > 0
    from zparse_spark.functions.numeric import round_duck

    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(combo).alias("n_distinct"),
        F.sum(any_null.cast("long")).alias("n_null_combos"),
        # round_duck, not F.round: the r5 driver gate hashed this red on
        # a last-ulp divergence between Spark's and DuckDB's round(x,6)
        round_duck(F.count_distinct(combo) / F.count(F.lit(1)), 6).alias("uniqueness"),
    )


def profile_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    null_rate_tol: float = 0.05,
    distinct_ratio_tol: float = 2.0,
    distinct_mode: str = "exact",
) -> DataFrame:
    """Column-level drift between two table snapshots — the schema/
    profile monitor a recurring ingest runs BEFORE row-level validation:
    did yesterday's load add/drop/retype a column, blow up a null rate,
    or collapse a cardinality? (verdict_diff answers rule-cell drift,
    snapshot_diff row-identity drift; this closes the column axis.)

    Per column: status ∈ added | removed | type_changed | drifted |
    stable (first match wins). ``drifted`` fires when |Δ null_rate| >
    ``null_rate_tol`` or the distinct-count ratio new/old leaves
    [1/``distinct_ratio_tol``, ``distinct_ratio_tol``] (an old count of
    0 with a new count > 0 is drift by definition). Rates/ratios are
    rounded to 6 decimals so cross-engine comparisons are exact.

    Scale shape: each side is ONE aggregate pass producing a k-row
    profile; the diff joins two k-row tables — document data is scanned
    once per side, nothing else moves. ``distinct_mode='exact'``
    (count_distinct, the oracle-matchable default) expands the
    aggregate input ×k_columns (Spark's Expand for multi-distinct);
    at 10^12 rows pass ``'approx'`` (HLL, one pass, ±2%) and widen
    ``distinct_ratio_tol`` accordingly.
    """
    if distinct_mode not in ("exact", "approx"):
        raise ValueError(f"unknown distinct_mode {distinct_mode!r}")

    def profile(df: DataFrame) -> DataFrame:
        cols = [f.name for f in df.schema.fields]
        dtypes = dict(df.dtypes)
        distinct = F.count_distinct if distinct_mode == "exact" else F.approx_count_distinct
        aggs = []
        for c in cols:
            aggs += [
                F.count(F.lit(1)).alias(f"{c}__rows"),
                F.count(c).alias(f"{c}__nonnull"),
                distinct(F.col(c)).alias(f"{c}__distinct"),
            ]
        wide = df.agg(*aggs)
        stack_expr = ", ".join(
            f"'{c}', '{dtypes[c]}', `{c}__rows`, `{c}__nonnull`, `{c}__distinct`" for c in cols
        )
        return wide.selectExpr(
            f"stack({len(cols)}, {stack_expr}) as (column, dtype, n_rows, n_nonnull, n_distinct)"
        ).select(
            "column",
            "dtype",
            F.round((F.col("n_rows") - F.col("n_nonnull")) / F.col("n_rows"), 6).alias(
                "null_rate"
            ),
            "n_distinct",
        )

    o = profile(old).select(
        "column",
        F.col("dtype").alias("old_type"),
        F.col("null_rate").alias("old_null_rate"),
        F.col("n_distinct").alias("old_distinct"),
    )
    n = profile(new).select(
        "column",
        F.col("dtype").alias("new_type"),
        F.col("null_rate").alias("new_null_rate"),
        F.col("n_distinct").alias("new_distinct"),
    )
    j = o.join(n, "column", "full_outer")
    ratio = F.when(
        (F.col("old_distinct") > 0) & (F.col("new_distinct") > 0),
        F.round(F.col("new_distinct").cast("double") / F.col("old_distinct"), 6),
    )
    null_delta = F.round(F.col("new_null_rate") - F.col("old_null_rate"), 6)
    drifted = (
        (F.abs(null_delta) > null_rate_tol)
        | (ratio.isNull() & (F.coalesce("old_distinct", "new_distinct") > 0)
           & (F.col("old_distinct") != F.col("new_distinct")))
        | (ratio > distinct_ratio_tol)
        | (ratio < 1.0 / distinct_ratio_tol)
    )
    status = (
        F.when(F.col("old_type").isNull(), F.lit("added"))
        .when(F.col("new_type").isNull(), F.lit("removed"))
        .when(F.col("old_type") != F.col("new_type"), F.lit("type_changed"))
        .when(F.coalesce(drifted, F.lit(False)), F.lit("drifted"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "column", status.alias("status"),
        "old_type", "new_type",
        "old_null_rate", "new_null_rate",
        F.when(F.col("old_type").isNotNull() & F.col("new_type").isNotNull(), null_delta)
        .alias("null_rate_delta"),
        "old_distinct", "new_distinct",
        F.when(F.col("old_type").isNotNull() & F.col("new_type").isNotNull(), ratio)
        .alias("distinct_ratio"),
    )


def histogram(df: DataFrame, col: str, lo: float, hi: float, n_buckets: int) -> DataFrame:
    """Fixed-bin histogram via floor arithmetic (no width_bucket needed on
    the oracle side); clamps out-of-range values into edge buckets."""
    step = (hi - lo) / n_buckets
    bucket = F.least(
        F.greatest(F.floor((F.col(col) - lo) / step).cast("long"), F.lit(0)),
        F.lit(n_buckets - 1),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def approx_quantiles(df: DataFrame, col: str, probs: list[float]) -> DataFrame:
    """GK-sketch quantiles (built-in, mergeable, 100 TB-safe)."""
    return df.agg(
        *[
            F.percentile_approx(col, F.lit(p), F.lit(10000)).alias(f"q{int(p * 100)}")
            for p in probs
        ]
    )


# ---------------------------------------------------------------------------
# t-digest (partial per partition via applyInPandas, merge at driver)
# ---------------------------------------------------------------------------


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids down to ~delta clusters, density-scaled by
    the t-digest quantile-size bound (k1 scale): clusters near the tails
    stay small, the middle compresses hard."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    cur_m, cur_w = means[0], weights[0]
    for m, w in zip(means[1:], weights[1:]):
        q = q0 + (cur_w + w) / total
        # max cluster size at quantile midpoint (classic 4δq(1−q) bound)
        qm = q0 + (cur_w + w) / (2 * total)
        cap = 4 * total * qm * (1 - qm) / delta
        if cur_w + w <= max(cap, 1.0):
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile_from_centroids(means: np.ndarray, weights: np.ndarray, p: float) -> float:
    cum = np.cumsum(weights) - weights / 2
    target = p * weights.sum()
    return float(np.interp(target, cum, means))


def tdigest_quantiles_df(
    df: DataFrame, col: str, probs: list[float], delta: int = 200, n_partials: int = 32
) -> DataFrame:
    """Distributed t-digest as a lazy (prob, value) DataFrame: partial
    sketch per hash bucket (``applyInPandas``, Arrow batches), then a
    single-group merge stage over the ≤ n_partials×delta centroids —
    one tiny task, no driver collect, so the sketch composes into larger
    plans (join/union/sink) like every other operator."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("mean", T.ArrayType(T.DoubleType())),
            T.StructField("weight", T.ArrayType(T.DoubleType())),
        ]
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col].dropna().to_numpy(dtype=np.float64)
        if len(v) == 0:
            return pd.DataFrame({"mean": [[]], "weight": [[]]})
        m, w = _compress(v, np.ones_like(v), delta)
        return pd.DataFrame({"mean": [m.tolist()], "weight": [w.tolist()]})

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        nonempty = [np.asarray(x, dtype=np.float64) for x in pdf["mean"] if len(x)]
        if not nonempty:
            return pd.DataFrame({"prob": probs, "value": [float("nan")] * len(probs)})
        all_m = np.concatenate(nonempty)
        all_w = np.concatenate(
            [np.asarray(x, dtype=np.float64) for x in pdf["weight"] if len(x)]
        )
        m, w = _compress(all_m, all_w, delta)
        return pd.DataFrame(
            {"prob": probs, "value": [_quantile_from_centroids(m, w, p) for p in probs]}
        )

    bucketed = df.select(col).withColumn(
        "_b", F.pmod(F.xxhash64(F.col(col)), F.lit(n_partials))
    )
    partials = bucketed.groupBy("_b").applyInPandas(partial, schema)
    return (
        partials.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(merge, "prob double, value double")
    )


def tdigest_quantiles_grouped(
    df: DataFrame,
    col: str,
    group_col: str,
    probs: list[float],
    delta: int = 200,
) -> DataFrame:
    """Per-GROUP t-digest quantiles — the north-star's per-column stats
    at the partition grain (each partition's length/quantity
    distribution, one row per (group, prob)). One ``applyInPandas``
    stage keyed by the group: Spark's grouped-map already streams each
    group's Arrow batches into one task, so the digest builds and
    queries in a single pass — the group-count shuffle is the only
    exchange, and a 10^12-row table with hot groups should pre-salt via
    ``key_skew_profile``'s recommendation and merge sub-digests (the
    t-digest is a mergeable summary; ``tdigest_quantiles_df`` shows the
    two-level shape).
    """
    import pyspark.sql.types as T

    gfield = df.schema[group_col]
    schema = T.StructType(
        [
            T.StructField(group_col, gfield.dataType),
            T.StructField("prob", T.DoubleType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def digest(key, pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col].dropna().to_numpy(dtype=np.float64)
        if len(v) == 0:
            vals = [float("nan")] * len(probs)
        else:
            m, w = _compress(v, np.ones_like(v), delta)
            vals = [_quantile_from_centroids(m, w, p) for p in probs]
        return pd.DataFrame({group_col: [key[0]] * len(probs), "prob": probs, "value": vals})

    return df.select(group_col, col).groupBy(group_col).applyInPandas(digest, schema)


def tdigest_quantiles(
    df: DataFrame, col: str, probs: list[float], delta: int = 200, n_partials: int = 32
) -> dict[float, float]:
    """Driver-side convenience wrapper: collect the (prob, value) frame
    from ``tdigest_quantiles_df`` into a dict (len(probs) rows)."""
    rows = tdigest_quantiles_df(df, col, probs, delta, n_partials).collect()
    return {r["prob"]: r["value"] for r in rows}


def group_stats_grouping_sets(df: DataFrame, dims: list[str], value: str) -> DataFrame:
    """Stats by every dim combination in one pass (SURVEY.md A9) —
    ``cube`` compiles to a single expand+aggregate, not N scans."""
    return (
        df.cube(*dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value), 4).alias("sum_value"),
            F.round(F.avg(value), 4).alias("avg_value"),
        )
        .select(
            *[F.coalesce(F.col(d), F.lit("ALL")).alias(d) for d in dims],
            "n",
            "sum_value",
            "avg_value",
        )
    )


def ks_drift_scores(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> DataFrame:
    """Numeric distribution drift per group: the (binned) two-sample
    Kolmogorov–Smirnov statistic between each group's distribution of
    ``value_col`` and the global one — the numeric companion of the
    span-kind KL/PSI drift rule (rules.py::drift_scores).

    ``ks = max over bins |cdf_group(b) - cdf_global(b)|`` on a fixed
    [lo, hi] grid (edges are caller-supplied constants — at 100 TB they
    come from a prior stats pass, keeping this single-scan and
    deterministic; out-of-range values clamp into the edge bins).

    Scale shape: one groupBy(group, bin) over the scan (map-side
    combine; |groups|×n_bins tiny rows), densified against a
    ``spark.range(n_bins)`` grid so empty bins carry the running CDF,
    cumulative windows partitioned BY GROUP (never a global sort), and
    the global CDF broadcast-joined by bin. Every CDF value is one
    integer-ratio division, so the DuckDB twin matches exactly.
    """
    joined = _binned_group_global_cdfs(df, value_col, group_col, lo, hi, n_bins)
    diff = F.abs(F.col("cum") / F.col("tot") - F.col("gcum") / F.col("gtot"))
    return joined.groupBy(F.col("grp").alias(group_col)).agg(
        F.max(diff).alias("ks")
    )


def _binned_group_global_cdfs(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Shared scaffolding for the binned two-sample drift statistics
    (KS max-gap, Wasserstein area): one row per (group, bin) carrying
    the group's running count ``cum`` / total ``tot`` and the global
    running count ``gcum`` / total ``gtot`` on a fixed [lo, hi] grid.
    All four are exact integers — each caller decides how to turn them
    into its statistic, keeping the divisions (the only IEEE ops)
    engine-portable at the last step."""
    step = (hi - lo) / n_bins
    bucket = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / step).cast("long"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), bucket.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bins = df.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    grid = counts.select("grp").distinct().crossJoin(F.broadcast(bins))
    dense = grid.join(counts, ["grp", "bin"], "left").select(
        "grp", "bin", F.coalesce("n", F.lit(0)).alias("n")
    )
    from pyspark.sql import Window

    w_grp = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_grp = dense.select(
        "grp",
        "bin",
        F.sum("n").over(w_grp).alias("cum"),
        F.sum("n").over(Window.partitionBy("grp")).alias("tot"),
    )
    glob = (
        dense.groupBy("bin")
        .agg(F.sum("n").alias("gn"))
        .select(
            "bin",
            F.sum("gn")
            .over(
                Window.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("gcum"),
            F.sum("gn").over(Window.partitionBy(F.lit(1))).alias("gtot"),
        )
    )
    return per_grp.join(F.broadcast(glob), "bin")


def wasserstein_drift_scores(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> DataFrame:
    """Binned 1-Wasserstein (earth-mover's) distance per group vs the
    global distribution — the MAGNITUDE companion of ks_drift_scores'
    max-gap: KS tells you the worst single quantile displacement, EMD
    integrates how much probability mass must move how far, so a wide
    small shift (which KS under-reports) and a narrow large one are
    ranked on the same scale. On a fixed grid the closed form is

        emd = step * sum_b |CDF_group(b) - CDF_global(b)|

    (the final bin contributes 0 since both CDFs end at 1, so summing
    all bins is exact). Engine portability: a float sum is
    order-sensitive, so the per-bin term is kept as the EXACT integer
    |cum*gtot - gcum*tot| (decimal(38,0) accumulation — overflow-proof
    at 10^12-row scale where cum*gtot ~ 10^24 exceeds int64; the DuckDB
    twin accumulates in HUGEINT) and the single trailing division by
    tot*gtot happens once per group, after the order-insensitive
    integer sum. Same scale shape as KS: one groupBy(group, bin) scan
    with map-side combine, per-group cumulative windows (never a global
    sort), broadcast global CDF.
    """
    step = (hi - lo) / n_bins
    joined = _binned_group_global_cdfs(df, value_col, group_col, lo, hi, n_bins)
    # decimal(18,0) operands -> decimal(37,0) products, exact (Spark caps
    # decimal multiply at precision 38; 38x38 operands would truncate).
    # Counts up to 10^18 rows stay exact - comfortably past 10^12 scale.
    term = F.abs(
        F.col("cum").cast("decimal(18,0)") * F.col("gtot").cast("decimal(18,0)")
        - F.col("gcum").cast("decimal(18,0)") * F.col("tot").cast("decimal(18,0)")
    )
    return joined.groupBy(F.col("grp").alias(group_col)).agg(
        F.round(
            F.sum(term).cast("double")
            * F.lit(step)
            / (F.max("tot").cast("double") * F.max("gtot").cast("double")),
            6,
        ).alias("emd")
    )


def _cms_buckets(col: str, width: int, depth: int):
    """The depth Count-Min bucket ids for a value, as an array column:
    bucket_d(v) = md5-nibble(v ':' d) mod width — the SAME engine-portable
    hash idiom as filtering.hash_unit / cap_hot_buckets, so a DuckDB (or
    any-SQL) twin reproduces every cell bit-for-bit."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(":", F.col(col).cast("string"), F.lit(str(d)))
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            )
            for d in range(depth)
        ]
    )


def cms_sketch(df: DataFrame, col: str, width: int = 1024, depth: int = 4) -> DataFrame:
    """Count-Min sketch of a column's value frequencies: a (depth x
    width) grid of counters, returned as rows (d, bucket, n). The
    mergeable companion of the EXACT heavy_hitters pass: where
    Misra-Gries answers "which values exceed n/(k+1)" with a rescan,
    the CMS answers point-frequency queries for ANY value from
    depth*width integers TOTAL — state independent of column
    cardinality, so 10^12-row streams with 10^9 distinct values keep a
    fixed-size summary that unions across partitions, days, or tables
    by plain cell-wise addition (cms_merge). Guarantee: est >= true
    always (counters only ever add), est <= true + eps*N w.h.p. with
    eps = e/width over depth independent rows.

    Scale shape: one scan, a depth-way row fan-out (depth is 3-5)
    immediately reduced by groupBy(d, bucket) with map-side combine —
    the shuffle carries at most tasks x depth x width partial cells, not
    data rows. Determinism: buckets come from the portable md5 idiom,
    never a JVM/session-dependent hash, so sketches built by different
    engines or different runs are cell-identical and safely mergeable.
    """
    ex = df.filter(F.col(col).isNotNull()).select(
        F.posexplode(_cms_buckets(col, width, depth)).alias("d", "bucket")
    )
    return ex.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("n"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union Count-Min sketches built with the SAME (width, depth):
    cell-wise addition — the monoid the streaming/incremental paths
    rely on (sketch(A ∪ B) == merge(sketch(A), sketch(B)), exactly)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("d", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, width: int, depth: int
) -> DataFrame:
    """Point-frequency estimates for a probe set of values: min over the
    value's depth counters. The sketch is depth*width rows — broadcast —
    so probing any number of values is a map-side join, never a shuffle
    of the probe stream. Absent cells count as 0 (a value never seen
    hashes to untouched counters only if genuinely absent everywhere)."""
    # NULL must not probe: concat_ws SKIPS nulls, so an unfiltered NULL
    # would silently hash as the bare seed string and return a bogus cell.
    p = probes.select(F.col(col)).filter(F.col(col).isNotNull()).distinct()
    fan = p.select(col, F.posexplode(_cms_buckets(col, width, depth)).alias("d", "bucket"))
    return (
        fan.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_est"))
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Exact heavy hitters (frequency > n/(k+1)) without grouping the
    full value domain — the two-pass Misra–Gries pattern.

    At 100 TB a ``groupBy(col).count()`` over a high-cardinality column
    shuffles one partial row per distinct value per task; when the
    domain is huge (URLs, media_refs, shingles) that is the bottleneck
    even with map-side combine. Misra–Gries bounds the shuffle by k:

    - Pass 1 (map-only): each partition runs a k-counter Misra–Gries
      sketch over its rows (``mapInPandas``, dict state carried across
      Arrow batches). A partition emits at most k candidate values.
      Guarantee: if freq(v) > n/(k+1) globally then freq_p(v) >
      n_p/(k+1) in at least one partition (else summing the per-
      partition bounds contradicts the global one), and MG retains
      every value above its partition's n_p/(k+1) — so the union of
      candidates is a SUPERSET of the true heavy hitters.
    - Pass 2: exact recount restricted to the candidate set (broadcast
      semi-join, then groupBy over ≤ tasks×k partial rows), filtered to
      the true threshold. Output is therefore EXACT — same rows a full
      groupBy+HAVING would produce — which is what makes it oracle-able
      in plain SQL.

    Returns (value, freq) for every value with freq > n/(k+1), ordered
    nowhere (caller sorts). Null values are ignored (SQL GROUP BY
    semantics for HAVING on count would include them; we match the
    reference profile contract of skipping nulls like null_rate does).

    Measured (4M rows, 100k distinct, k=16, local[8]): the vectorized
    per-batch fold runs pass 1 at ~3.6M rows/s vs ~1.6M rows/s for the
    per-row MG loop it replaced (2.3×), and the gap widens with k —
    the old decrement path was O(rows × k).
    """
    import pandas as pd  # noqa: F811 — local to keep module import light

    src = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )

    def mg_partition(batches):
        # per-BATCH vectorized fold, not per-row: each Arrow batch is
        # collapsed to exact (value, weight) pairs with value_counts()
        # (C-side), then merged into the running k-counter table with the
        # mergeable-summaries MG merge (Agarwal/Cormode et al., PODS'12):
        # add the two summaries, subtract the (k+1)-th largest count from
        # every counter, keep the positive ones (≤ k survive). A batch's
        # value_counts is itself an exact (zero-error) summary, so the
        # merged sketch keeps the MG invariant — undercount ≤ W/(k+1)
        # over the weight W processed so far — and the union of per-
        # partition candidates stays a SUPERSET of the true heavy
        # hitters. Interpreter work is O(distinct-per-batch + k), not
        # O(rows): the round-4 review flagged the old per-row loop as
        # the one vectorization-discipline exception.
        import numpy as np

        counters: dict[str, int] = {}
        for pdf in batches:
            for v, w in pdf["v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(w)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                m = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
                counters = {key: c - m for key, c in counters.items() if c > m}
        yield pd.DataFrame({"v": list(counters.keys())})

    candidates = src.mapInPandas(mg_partition, "v string").distinct()
    # total row count rides the same pass-2 scan as a scalar subquery-
    # style crossJoin of a 1-row aggregate — no separate .count() action
    total = src.agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        src.join(F.broadcast(candidates), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * (k + 1) > F.col("_n"))
        .select(F.col("v").alias(col), "freq")
    )
    return exact


def iqr_outliers(
    df: DataFrame,
    value: str,
    group_cols: list[str] | None = None,
    k: float = 1.5,
) -> DataFrame:
    """Robust (Tukey-fence) outlier detection per group: rows with
    ``value`` outside ``[Q1 - k*IQR, Q3 + k*IQR]`` where Q1/Q3 are the
    EXACT linearly-interpolated quartiles (``percentile``, the same
    ``q = v[lo] + (pos - lo) * (v[hi] - v[lo])`` definition DuckDB's
    ``quantile_cont`` uses, so fences are oracle-checkable cross-engine).

    Returns one row per group: fences plus outlier count/min/max — the
    monitoring surface for a stats rule ("this partition's price column
    grew a tail").

    Scale shape: TWO passes over the pruned (group, value) projection —
    pass 1 computes per-group quartiles (exact percentile is a sort-based
    agg per group; groups are partition-grained here, so the per-group
    sort is the price of exactness — callers with huge groups should
    substitute ``percentile_approx`` in the fences aggregate, trading
    the cross-engine oracle for a t-digest-style mergeable sketch), pass
    2 re-aggregates with the fences joined back (broadcast — one row per
    group, never big). No all-row sort; nothing leaves the JVM.

    NULL group keys form their own group (null-safe join back), matching
    SQL GROUP BY semantics — a monitoring rule watching per-group tails
    must not silently lose the unattributed rows.
    """
    group_cols = group_cols or []
    v = F.col(value)
    gb = [F.col(c) for c in group_cols]
    pct = F.expr(f"percentile({value}, array(0.25, 0.75))")
    fences = (
        df.groupBy(*gb)
        .agg(pct[0].alias("q1"), pct[1].alias("q3"))
        .select(
            *group_cols,
            "q1",
            "q3",
            (F.col("q1") - F.lit(k) * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
            (F.col("q3") + F.lit(k) * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
        )
    )
    if group_cols:
        # eqNullSafe: GROUP BY puts null keys in their own group, so the
        # join back must match them too — a plain equi-join would drop
        # every null-keyed row from the output
        fr = F.broadcast(
            fences.select(
                *[F.col(c).alias(f"_f_{c}") for c in group_cols],
                "q1", "q3", "lo_fence", "hi_fence",
            )
        )
        cond = None
        for c in group_cols:
            e = F.col(c).eqNullSafe(F.col(f"_f_{c}"))
            cond = e if cond is None else (cond & e)
        joined = df.join(fr, cond).drop(*[f"_f_{c}" for c in group_cols])
    else:
        joined = df.crossJoin(F.broadcast(fences))
    is_out = (v < F.col("lo_fence")) | (v > F.col("hi_fence"))
    return (
        joined.groupBy(*gb)
        .agg(
            F.first("q1").alias("q1"),
            F.first("q3").alias("q3"),
            F.first("lo_fence").alias("lo_fence"),
            F.first("hi_fence").alias("hi_fence"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.min(F.when(is_out, v)).alias("min_outlier"),
            F.max(F.when(is_out, v)).alias("max_outlier"),
        )
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over the given
    numeric columns, long format (col_x, col_y, corr, cov) for the
    i<j upper triangle — the column-profiling companion to
    ``column_profile``: a corpus-stats rule watching "discount suddenly
    decorrelated from price" needs the joint moments, not just the
    marginals.

    Scale shape (100 TB): ONE aggregate pass — every pair's co-moments
    are streaming partial aggregates (Spark's corr/covar_samp maintain
    Welford-style merged states), all riding a single scan of the
    pruned projection; the wide one-row result is unpivoted with
    ``stack`` (no shuffle, no Python). O(k^2) agg states for k columns
    — profile column SETS, not the whole table, at web scale.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = []
    for a, b in pairs:
        aggs.append(F.round(F.corr(a, b), 6).alias(f"_corr_{a}_{b}"))
        aggs.append(F.round(F.covar_samp(a, b), 6).alias(f"_cov_{a}_{b}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', _corr_{a}_{b}, _cov_{a}_{b}" for a, b in pairs
    )
    return row.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, corr, cov)")
    )


def robust_group_anomalies(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Median/MAD robust z-score per group over the group MEANS of
    ``value_col`` — the partition-anomaly detector: "which source's
    average document length sits implausibly far from the fleet's?"
    Mean/stddev screening breaks exactly when it matters (the anomaly
    inflates the stddev it is judged against); median + MAD with the
    1.4826 normal-consistency constant is the standard robust fix
    (Iglewicz–Hoaglin modified z-score, |z| > 3.5 default).

    Returns (grp, n, x, robust_z, is_anomaly). ``robust_z`` is NULL
    when MAD = 0 (all groups identical — no scale to judge against);
    ``is_anomaly`` follows it.

    Scale shape: the full-data pass is the per-group mean (one shuffle
    with map-side combine); everything after runs on the GROUP table —
    one row per partition/source, thousands at most — so the two exact
    medians (same interpolated ``percentile`` = DuckDB quantile_cont
    contract as iqr_outliers) and the broadcast joins back are
    driver-scale, not data-scale.
    """
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"), F.avg(value_col).alias("x")
    )
    med = g.agg(F.expr("percentile(x, 0.5)").alias("_med"))
    with_med = g.crossJoin(F.broadcast(med))
    mad = with_med.agg(F.expr("percentile(abs(x - _med), 0.5)").alias("_mad"))
    z = (F.col("x") - F.col("_med")) / F.nullif(
        F.lit(1.4826) * F.col("_mad"), F.lit(0.0)
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            "grp",
            "n",
            F.round("x", 6).alias("x"),
            F.round(z, 6).alias("robust_z"),
            F.when(z.isNull(), F.lit(None).cast("int"))
            .otherwise((F.abs(z) > threshold).cast("int"))
            .alias("is_anomaly"),
        )
    )


def drift_timeline(
    df: DataFrame,
    ts_col: str,
    cat_col: str,
    bucket: str = "day",
    epsilon: float = 1e-6,
) -> DataFrame:
    """D1 drift, sliced along time instead of along partitions: PSI and
    KL of a categorical column's distribution in each time bucket vs the
    PREVIOUS present bucket — the monitoring surface that answers "did
    yesterday's ingest change the event mix?" while partition-drift
    (rules.py::drift_scores, same epsilon-floored shares) answers "is
    one shard unlike the fleet?".  Missing (bucket, category) cells
    count as 0 via a dense bucket×category grid, so a category that
    vanishes contributes drift instead of silently dropping out.

    Returns (bucket, prev_bucket, n_rows, n_rows_prev, psi, kl), one
    row per bucket that has a predecessor, ordered by nothing (sort at
    the sink).

    Scale shape (100 TB): the only full-data pass is the
    groupBy(bucket, cat) count with map-side combine; the grid, the
    per-bucket totals, the lag windows, and the PSI fold all run on the
    buckets×categories table (thousands of rows for years×hundreds of
    types).  The cross join is post-aggregate tiny×tiny, broadcast on
    the category side.
    """
    counts = df.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        F.col(cat_col).alias("cat"),
    ).agg(F.count(F.lit(1)).alias("n"))
    buckets = counts.select("bucket").distinct()
    cats = counts.select("cat").distinct()
    grid = (
        buckets.crossJoin(F.broadcast(cats))
        .join(counts, ["bucket", "cat"], "left")
        .select("bucket", "cat", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    w_tot = Window.partitionBy("bucket")
    w_lag = Window.partitionBy("cat").orderBy("bucket")
    g = (
        grid.withColumn("tot", F.sum("n").over(w_tot))
        .withColumn("n_prev", F.lag("n").over(w_lag))
        .withColumn("tot_prev", F.lag("tot").over(w_lag))
        .withColumn("prev_bucket", F.lag("bucket").over(w_lag))
    )
    pc = F.col("n") / F.col("tot") + F.lit(epsilon)
    pp = F.col("n_prev") / F.col("tot_prev") + F.lit(epsilon)
    return (
        g.filter(F.col("n_prev").isNotNull())
        .groupBy("bucket", "prev_bucket")
        .agg(
            F.max("tot").alias("n_rows"),
            F.max("tot_prev").alias("n_rows_prev"),
            F.round(F.sum((pc - pp) * F.log(pc / pp)), 6).alias("psi"),
            F.round(F.sum(pc * F.log(pc / pp)), 6).alias("kl"),
        )
    )


import math as _math

_BENFORD_P = [0.0] + [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_deviation(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    standard forensic screen for fabricated or truncated numeric
    columns (real multiplicative quantities follow log10(1+1/d);
    uniform synthetics, capped fields, and copy-paste corruption
    don't).  A drift in this profile between snapshots is a data-entry
    or pipeline bug long before any range check fires.

    Rows with |value| < 1 or NULL are excluded (no stable leading
    digit).  The leading digit is extracted from the DECIMAL STRING of
    floor(|value|) — never from floor(log10(x)), whose last-ulp libm
    differences across engines can misclassify exact powers of ten.
    ``p_benford`` is a Python-side literal, identical in every engine.

    Returns 9 rows (digit, n, p_obs, p_benford, abs_dev, chi2_total)
    — chi2_total = Σ (n_d − N·p_d)²/(N·p_d) repeated on each row so a
    threshold rule can read any row.  Scale shape: one map-only digit
    projection + one 9-group aggregate with map-side combine; the chi2
    fold runs on the 9-row table via a broadcast total.
    """
    digits = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.floor(F.abs(F.col(value_col))).cast("bigint").alias("_i"))
        .filter(F.col("_i") >= 1)
        .select(F.substring(F.col("_i").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # dense 1..9 grid: a digit that never occurs still contributes to chi2
    grid = digits.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    counts = grid.join(counts, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("n_total"))
    pb = F.element_at(F.array(*[F.lit(p) for p in _BENFORD_P[1:]]), F.col("digit"))
    g = counts.crossJoin(F.broadcast(total))
    chi_term = F.pow(F.col("n") - F.col("n_total") * pb, 2) / (F.col("n_total") * pb)
    g = g.select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("n_total"), 6).alias("p_obs"),
        F.round(pb, 6).alias("p_benford"),
        F.round(F.abs(F.col("n") / F.col("n_total") - pb), 6).alias("abs_dev"),
        chi_term.alias("_chi"),
    )
    return g.withColumn(
        "chi2_total", F.round(F.sum("_chi").over(Window.partitionBy()), 4)
    ).drop("_chi")


def mutual_information(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Mutual information (nats) + entropies + Theil's uncertainty
    coefficients between two categorical columns — the categorical
    analog of ``correlation_matrix`` (does lang depend on source?  does
    span kind depend on partition?).  U(X|Y) = MI/H(X) is the fraction
    of X's uncertainty explained by Y (asymmetric, 0 = independent,
    1 = Y determines X) — the dependency direction a validation rule
    actually wants, where symmetric MI alone can't say which column
    drives which.

    NULLs count as the category 'NULL' (a column that is null exactly
    when another column takes some value IS a dependency worth
    flagging).  Returns ONE row: (n_rows, n_x, n_y, mi, h_x, h_y,
    u_x_given_y, u_y_given_x).  Degenerate marginals (H = 0, single
    category) yield NULL for that U, never a divide-by-zero.

    Scale shape (100 TB): ONE map-side-combined groupBy(x, y) reduces
    the data to the distinct-pair table; marginals are window sums on
    that table and every entropy/MI term folds in a single aggregate
    over it — H(X) = −Σ_pairs (n_xy/N)·ln(n_x/N) needs no second
    grouping because Σ_y n_xy = n_x.  No second data pass, no Python.
    """
    pairs = df.select(
        F.coalesce(F.col(col_x).cast("string"), F.lit("NULL")).alias("x"),
        F.coalesce(F.col(col_y).cast("string"), F.lit("NULL")).alias("y"),
    ).groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
    g = (
        pairs.withColumn("n_x", F.sum("n_xy").over(Window.partitionBy("x")))
        .withColumn("n_y", F.sum("n_xy").over(Window.partitionBy("y")))
        .withColumn("n", F.sum("n_xy").over(Window.partitionBy()))
    )
    p_xy = F.col("n_xy") / F.col("n")
    mi_term = p_xy * F.log(
        (F.col("n_xy") * F.col("n")) / (F.col("n_x") * F.col("n_y"))
    )
    hx_term = -p_xy * F.log(F.col("n_x") / F.col("n"))
    hy_term = -p_xy * F.log(F.col("n_y") / F.col("n"))
    agg = g.agg(
        F.max("n").alias("n_rows"),
        F.countDistinct("x").alias("n_x"),
        F.countDistinct("y").alias("n_y"),
        F.sum(mi_term).alias("_mi"),
        F.sum(hx_term).alias("_hx"),
        F.sum(hy_term).alias("_hy"),
    )
    return agg.select(
        "n_rows",
        "n_x",
        "n_y",
        F.round("_mi", 6).alias("mi"),
        F.round("_hx", 6).alias("h_x"),
        F.round("_hy", 6).alias("h_y"),
        F.round(F.col("_mi") / F.nullif(F.round("_hx", 12), F.lit(0.0)), 6).alias(
            "u_x_given_y"
        ),
        F.round(F.col("_mi") / F.nullif(F.round("_hy", 12), F.lit(0.0)), 6).alias(
            "u_y_given_x"
        ),
    )


def clamp_outliers(
    df: DataFrame,
    value: str,
    group_cols: list[str] | None = None,
    k: float = 1.5,
) -> DataFrame:
    """Winsorize: clamp ``value`` into its group's Tukey fences
    [Q1 − k·IQR, Q3 + k·IQR] — the NUMERIC arm of the repair family
    (repair_documents fixes structure; this fixes the heavy tail a
    stats rule flagged, without dropping the rows a filter would).
    Fences share iqr_outliers' exact interpolated-quartile contract, so
    detection and repair agree on the boundary by construction.

    Appends ``{value}_clamped`` and ``{value}_was_clamped``; NULL values
    pass through unclamped (NULL is E1/null-rate territory, not a tail).

    Scale shape: one fences aggregate per group (exact percentile —
    iqr_outliers' docstring covers the huge-group approx substitution)
    broadcast-joined back onto the row stream; the clamp itself is a
    map-only least/greatest.
    """
    group_cols = group_cols or []
    pct = F.expr(f"percentile({value}, array(0.25, 0.75))")
    fences = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        (pct[0] - F.lit(k) * (pct[1] - pct[0])).alias("_lo"),
        (pct[1] + F.lit(k) * (pct[1] - pct[0])).alias("_hi"),
    )
    if group_cols:
        joined = df.join(
            F.broadcast(fences),
            [df[c].eqNullSafe(fences[c]) for c in group_cols],
        ).drop(*[fences[c] for c in group_cols])
    else:
        joined = df.crossJoin(F.broadcast(fences))
    v = F.col(value)
    clamped = F.when(v.isNull(), v).otherwise(F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
    return (
        joined.withColumn(f"{value}_clamped", clamped)
        .withColumn(
            f"{value}_was_clamped",
            v.isNotNull() & ((v < F.col("_lo")) | (v > F.col("_hi"))),
        )
        .drop("_lo", "_hi")
    )


def timeseries_anomalies(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    lookback_days: int = 7,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-key daily-volume anomaly screen: each (key, day) count scored
    against the trailing ``lookback_days`` baseline with a sample-z
    score — the time axis of the monitoring family (D1 asks "is one
    shard unlike the fleet?", drift_timeline asks "did the category mix
    move?", this asks "did yesterday's VOLUME break pattern?").

    Bit-identical cross-engine by construction: the rolling mean and
    variance come from exact BIGINT window sums (s=Σn, q=Σn², k) on a
    densified day×key grid, and the z formula
    ``((k·n − s)/k) / sqrt((k·q − s²)/(k·(k−1)))`` uses only IEEE
    correctly-rounded ops (divide, sqrt) on identical integer operands —
    no libm, no accumulation-order dependence (contrast
    unigram_logprob_scores, where ln forces micro-nat quantization).
    Zero-variance baselines and short history (< lookback) yield NULL z,
    never a divide-by-zero. Caveat: q holds Σn² — fine until a single
    key's DAILY count approaches ~2^31 (q overflows around there);
    at that volume pre-aggregate to a coarser key first.

    Scale shape: ONE full-data groupBy(day, key); the dense grid, the
    rolling window and the scoring all ride the tiny counts table
    (days × keys rows). The grid densification matters for semantics,
    not cost: a silent day IS the anomaly signal, and a ragged window
    over present-days-only would hide it.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = df.select(day.alias("day"), F.col(key).alias("_k")).groupBy(
        "day", "_k"
    ).agg(F.count(F.lit(1)).alias("n"))
    mm = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        mm.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .crossJoin(daily.select("_k").distinct())
    )
    dense = (
        grid.join(daily, ["day", "_k"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("day")
        .rowsBetween(-lookback_days, -1)
    )
    s = F.sum("n").over(w)
    q = F.sum(F.col("n") * F.col("n")).over(w)
    k = F.count("n").over(w)
    num = (k * F.col("n") - s) * F.lit(1.0) / k
    var_term = (k * q - s * s) * F.lit(1.0) / (k * (k - F.lit(1)))
    z = F.when(
        (k == F.lit(lookback_days)) & ((k * q - s * s) > F.lit(0)),
        F.round(num / F.sqrt(var_term), 6),
    )
    return dense.select(
        F.col("_k").alias(key),
        "day",
        F.col("n").cast("long").alias("n"),
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(z_threshold)).alias("is_anomaly"),
    )


def volume_trend(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key linear volume trend: the least-squares slope (and daily
    relative change) of daily counts over the key's full densified day
    range — the DIRECTION leg of the monitoring family (X87's z-score
    flags a single broken day; this says "this source has been bleeding
    5%/day for two weeks", which no single-day screen can see).

    Exactness contract (same discipline as X87): with x = 0..k−1 day
    indices and y = daily BIGINT counts on the densified grid, every
    sum (Σx, Σy, Σxy, Σx²) is exact integer arithmetic, so
    slope = (k·Σxy − Σx·Σy) / (k·Σx² − (Σx)²) is one IEEE division of
    identical integers in every engine — bit-identical with no libm.
    ``rel_slope`` = slope / mean daily volume (per-day fractional
    drift, the alertable number). Keys with a single-day range or zero
    total volume yield NULL slope.

    Scale shape: ONE full-data groupBy(day, key); densification, the
    index window and the closed-form regression all ride the tiny
    counts table.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = df.select(day.alias("day"), F.col(key).alias("_k")).groupBy(
        "day", "_k"
    ).agg(F.count(F.lit(1)).alias("n"))
    mm = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        mm.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .crossJoin(daily.select("_k").distinct())
    )
    dense = (
        grid.join(daily, ["day", "_k"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn("x", F.datediff(F.col("day"), F.min("day").over(
            Window.partitionBy("_k")
        )).cast("long"))
    )
    agg = dense.groupBy("_k").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("n").alias("sy"),
        F.sum(F.col("x") * F.col("n")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = agg["k"] * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom > 0,
        F.round((agg["k"] * F.col("sxy") - F.col("sx") * F.col("sy")) / denom, 6),
    )
    return agg.select(
        F.col("_k").alias(key),
        F.col("k").alias("n_days"),
        F.col("sy").alias("total"),
        slope.alias("slope_per_day"),
        F.when(
            denom.isNotNull() & (denom > 0) & (F.col("sy") > 0),
            F.round(
                ((agg["k"] * F.col("sxy") - F.col("sx") * F.col("sy")) / denom)
                / (F.col("sy") / agg["k"]),
                6,
            ),
        ).alias("rel_slope"),
    )


def null_cooccurrence(df: DataFrame, cols: list[str]) -> DataFrame:
    """Missingness co-occurrence: for every column pair, how often the
    two are null TOGETHER vs what independence predicts — the forensic
    behind column_profile's per-column null rates. Correlated nulls
    mean one upstream failure domain (a producer dropping a whole
    struct), not k independent data-quality issues; jaccard ≈ 1 says
    "fix one pipeline", jaccard ≈ 0 with high lift says "conditional
    emission", and X54/X63 can't see any of it because they profile
    VALUES, not their absence.

    One aggregate pass over the pruned projection: per-column null
    indicators as ints, all k + k(k−1)/2 sums ride a single map-side-
    combining agg (exact BIGINTs); the pair table is built by exploding
    a literal array on the one-row result — no second scan, no shuffle
    beyond the agg's. ``lift`` = n_both·N / (n_a·n_b) (1 ≈ independent)
    and ``jaccard`` = n_both / (n_a + n_b − n_both); zero denominators
    yield NULL, never a divide-by-zero.
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    ind = {c: F.col(c).isNull().cast("long") for c in cols}
    aggs = [F.count(F.lit(1)).alias("_N")]
    aggs += [F.sum(ind[c]).alias(f"_n_{i}") for i, c in enumerate(cols)]
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    aggs += [F.sum(ind[cols[i]] * ind[cols[j]]).alias(f"_nb_{i}_{j}") for i, j in pairs]
    one = df.select(*[F.col(c) for c in cols]).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_a"),
                F.lit(cols[j]).alias("col_b"),
                F.col(f"_n_{i}").alias("n_null_a"),
                F.col(f"_n_{j}").alias("n_null_b"),
                F.col(f"_nb_{i}_{j}").alias("n_both"),
                F.col("_N").alias("n_rows"),
            )
            for i, j in pairs
        ]
    )
    p = one.select(F.explode(rows).alias("p")).select("p.*")
    uni = F.col("n_null_a") + F.col("n_null_b") - F.col("n_both")
    denom = F.col("n_null_a") * F.col("n_null_b")
    return p.select(
        "col_a",
        "col_b",
        "n_null_a",
        "n_null_b",
        "n_both",
        F.when(uni > 0, F.round(F.col("n_both") / uni, 6)).alias("jaccard"),
        F.when(denom > 0, F.round(F.col("n_both") * F.col("n_rows") / denom, 6)).alias(
            "lift"
        ),
    )


def inter_arrival_stats(
    df: DataFrame,
    key: str = "event_type",
    seq_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Inter-arrival time distribution per key: exact quartiles of the
    gap (whole seconds) between consecutive events within each
    (key, sequence) stream — the cadence leg of the monitoring family
    (X87 sees a broken DAY; "errors now arrive 3× more often" shows up
    here first, while daily totals still look plausible). Gaps are
    computed within ``seq_col`` (a user's own stream) so cross-user
    interleaving doesn't fake a cadence change.

    Exactness: gaps are exact BIGINT second deltas from integer
    microseconds; Q1/median/Q3 use the shared X37 contract
    (``percentile`` ≡ DuckDB ``quantile_cont``) at DYADIC probes only
    (.25/.5/.75 — interpolation weights are exact binary fractions on
    integer data, so the cross-engine comparison cannot flip; a p90
    probe would not have that property and is deliberately excluded).

    Scale shape: ONE window shuffle on (key, seq) orders each stream
    for the lag; the quartile aggregate is per-key sort-based — the
    price of exactness, same trade documented in iqr_outliers.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key, seq_col).orderBy(us)
    # floor, not cast: Spark's double->long cast truncates while
    # DuckDB's rounds — floor() agrees everywhere and gaps are >= 0
    gap = F.floor((us - F.lag(us).over(w)) / F.lit(1_000_000)).cast("long")
    gaps = df.select(F.col(key).alias("_k"), gap.alias("gap_s")).filter(
        F.col("gap_s").isNotNull()
    )
    pct = F.expr("percentile(gap_s, array(0.25, 0.5, 0.75))")
    return gaps.groupBy(F.col("_k").alias(key)).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        pct[0].alias("q1_s"),
        pct[1].alias("median_s"),
        pct[2].alias("q3_s"),
    )


def suggest_check_constraints(
    df: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str] | None = None,
    max_domain: int = 20,
    fence_k: float = 1.5,
) -> DataFrame:
    """Constraint DISCOVERY → authoring bridge: profile the data and
    emit ready-to-run CHECK predicates (the X36 K-rule grammar — each
    ``suggested_predicate`` pastes straight into ``--check ID:doc:...``)
    instead of leaving profiling output as numbers someone must
    hand-translate. Three suggestion families:

    - numeric range: ``col BETWEEN lo AND hi`` at the observed Tukey
      fences (X37's exact-quartile contract) — robust bounds, not
      min/max, so one historic outlier doesn't become the contract;
    - not-null: for columns observed 100% non-null (the invariant is
      already being relied on — make it enforced);
    - categorical domain: ``col IN (...)`` when the observed distinct
      set fits ``max_domain`` (sorted, deterministic literal order).

    Suggestions are EVIDENCE, not truth: each row carries the support
    stats (n, null share, fence/domain provenance) so a human promotes
    them deliberately — auto-enforcing discovered constraints would
    institutionalize yesterday's bugs.

    Scale shape: numerics ride ONE exact-percentile aggregate over the
    pruned projection (iqr_outliers' trade); categorical domains one
    distinct-agg each, pruned by a count(distinct) probe first so a
    high-cardinality column never collects; output is k rows.
    """
    categorical_cols = categorical_cols or []
    rows = []
    n_total = df.count()
    if numeric_cols:
        aggs = []
        for c in numeric_cols:
            aggs += [
                F.expr(f"percentile({c}, array(0.25, 0.75))").alias(f"_q_{c}"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            ]
        prof = df.agg(*aggs).collect()[0]
        for c in numeric_cols:
            q = prof[f"_q_{c}"]
            n_null = prof[f"_null_{c}"]
            if q is not None and q[0] is not None:
                iqr = q[1] - q[0]
                lo, hi = q[0] - fence_k * iqr, q[1] + fence_k * iqr
                # fixed 4-decimal formatting, not repr: the predicate
                # string must be reproducible by any engine (printf
                # '%.4f' of the same double), and repr's shortest-
                # roundtrip digits are Python-specific
                rows.append(
                    (
                        c,
                        "numeric_range",
                        f"{c} IS NULL OR {c} BETWEEN {lo:.4f} AND {hi:.4f}",
                        int(n_total - n_null),
                        round(n_null / n_total, 6) if n_total else None,
                    )
                )
            if n_null == 0 and n_total > 0:
                rows.append(
                    (c, "not_null", f"{c} IS NOT NULL", int(n_total), 0.0)
                )
    for c in categorical_cols:
        probe = df.agg(
            F.countDistinct(c).alias("d"),
            F.sum(F.col(c).isNull().cast("long")).alias("nn"),
        ).collect()[0]
        if probe["d"] == 0 or probe["d"] > max_domain:
            continue
        vals = sorted(
            r[0] for r in df.select(c).filter(F.col(c).isNotNull()).distinct().collect()
        )
        lits = ", ".join(f"'{v}'" for v in vals)
        rows.append(
            (
                c,
                "categorical_domain",
                f"{c} IS NULL OR {c} IN ({lits})",
                int(n_total - probe["nn"]),
                round(probe["nn"] / n_total, 6) if n_total else None,
            )
        )
        if probe["nn"] == 0 and n_total > 0:
            rows.append((c, "not_null", f"{c} IS NOT NULL", int(n_total), 0.0))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        "column string, family string, suggested_predicate string, "
        "n_support long, null_share double",
    )


def cusum_shift_detection(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    slack: float = 2.0,
    threshold: float = 10.0,
) -> DataFrame:
    """CUSUM change-point detection per key over daily volumes — the
    PERSISTENT-shift leg of the monitoring family: X87's z-score sees a
    single broken day, X91's slope a corpus-wide trend, but a small
    sustained level shift (volume quietly +3/day since the 12th) stays
    under both; CUSUM accumulates exactly that. ``slack`` (counts/day)
    is the drift allowance before accumulation, ``threshold`` (counts)
    the alarm line; both sides are tracked (cusum_up for level rises,
    cusum_down for drops/outages).

    Window-expressible closed form — no recursion: with y_t = x_t −
    mean − slack, CUSUM⁺_t = max(0, …) equals S_t − min_{j≤t} S_j of
    the prefix sums. The prefix sums are computed on k·x_t − T (exact
    BIGINT — k days, T total) and the slack correction is applied
    pointwise (one IEEE multiply-subtract on exact operands, never a
    float accumulation), so both engines agree bit-for-bit before the
    6-decimal display round.

    Scale shape: identical to X87 — one full-data groupBy(day, key),
    then grid/windows on the tiny counts table.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = df.select(day.alias("day"), F.col(key).alias("_k")).groupBy(
        "day", "_k"
    ).agg(F.count(F.lit(1)).alias("n"))
    mm = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        mm.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .crossJoin(daily.select("_k").distinct())
    )
    dense = (
        grid.join(daily, ["day", "_k"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    tot = dense.groupBy("_k").agg(
        F.sum("n").alias("_T"), F.count(F.lit(1)).alias("_kdays")
    )
    d = dense.join(tot, "_k")
    worder = Window.partitionBy("_k").orderBy("day")
    run = Window.partitionBy("_k").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # STAGED projections: a window function must never appear inside
    # another window's argument expression (Spark resolves the nesting
    # silently-wrong instead of erroring — caught by the DuckDB twin)
    staged = d.select(
        "_k",
        "day",
        "n",
        "_kdays",
        F.row_number().over(worder).cast("long").alias("_t"),
        # exact-integer prefix sums of k*x - T; slack applied pointwise
        F.sum(F.col("_kdays") * F.col("n") - F.col("_T")).over(run).alias("_s_int"),
    ).select(
        "_k",
        "day",
        "n",
        "_kdays",
        (F.col("_s_int") - F.col("_t") * (F.col("_kdays") * F.lit(float(slack)))).alias(
            "_s_up"
        ),
        (F.col("_s_int") + F.col("_t") * (F.col("_kdays") * F.lit(float(slack)))).alias(
            "_s_dn"
        ),
    )
    # the running extremum must include the EMPTY prefix (S_0 = 0):
    # max(0, c_{t-1} + y_t) == S_t - min(0, min_{j<=t} S_j) — without
    # the 0 baseline a series whose prefix sums never dip under-reports
    cusum_up = (
        F.col("_s_up") - F.least(F.min("_s_up").over(run), F.lit(0.0))
    ) / F.col("_kdays")
    cusum_dn = (
        F.greatest(F.max("_s_dn").over(run), F.lit(0.0)) - F.col("_s_dn")
    ) / F.col("_kdays")
    return staged.select(
        F.col("_k").alias(key),
        "day",
        F.col("n").cast("long").alias("n"),
        F.round(cusum_up, 6).alias("cusum_up"),
        F.round(cusum_dn, 6).alias("cusum_down"),
        ((cusum_up > F.lit(float(threshold))) | (cusum_dn > F.lit(float(threshold)))).alias(
            "alarm"
        ),
    )


def key_gaps(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    bin_size: int = 4096,
) -> DataFrame:
    """Gaps-and-islands over an integer keyspace, per group: every
    maximal run of missing keys between two present keys, as
    ``group_cols + [prev_key, next_key, n_missing]``.

    The textbook formulation is lag() over a GLOBAL sort — a
    single-partition window, the canonical scale-killer. This is the
    two-level decomposition instead:

      1. bin keys by ``floor(key / bin_size)``; intra-bin gaps come
         from a window partitioned by (group, bin) — thousands of
         bounded partitions running in parallel, each at most
         ``bin_size`` rows;
      2. cross-bin gaps stitch consecutive NON-EMPTY bins via a window
         over the per-bin min/max summary — (group, bin, 2×int64) rows,
         a reduction by ``bin_size``; runs of entirely-empty bins
         collapse into the same summary row pair, so gaps larger than
         a bin cost nothing extra.

    At 10^12 keys with bin_size 10^6 the stitch window sees 10^6 rows
    of 24 bytes per group — driver-safe — while the heavy window stays
    fully parallel. Output rows are one per GAP (validation reports:
    "partition 7 lost keys 4096-8191"), not one per missing key, so a
    catastrophic hole is one row, not a row explosion.

    Validation framing (reference parity: the reference rejects
    duplicate keys and enforces sequence contracts span-by-span,
    toml/parser.rs:100-122; this is the inverse check — keys a
    sequence contract says should exist but do not).
    """
    group_cols = list(group_cols or [])
    keys = (
        df.select(
            *group_cols, F.col(key_col).cast("long").alias("_k")
        )
        .filter(F.col("_k").isNotNull())
        .distinct()
        .withColumn("_b", F.floor(F.col("_k") / F.lit(bin_size)))
    )
    w_in = Window.partitionBy(*group_cols, "_b").orderBy("_k")
    intra = (
        keys.withColumn("_prev", F.lag("_k").over(w_in))
        .filter(F.col("_prev").isNotNull() & (F.col("_k") - F.col("_prev") > 1))
        .select(
            *group_cols,
            F.col("_prev").alias("prev_key"),
            F.col("_k").alias("next_key"),
        )
    )
    bins = keys.groupBy(*group_cols, "_b").agg(
        F.min("_k").alias("_mn"), F.max("_k").alias("_mx")
    )
    w_bins = Window.partitionBy(*group_cols).orderBy("_b")
    cross = (
        bins.withColumn("_pmx", F.lag("_mx").over(w_bins))
        .filter(F.col("_pmx").isNotNull() & (F.col("_mn") - F.col("_pmx") > 1))
        .select(
            *group_cols,
            F.col("_pmx").alias("prev_key"),
            F.col("_mn").alias("next_key"),
        )
    )
    return intra.unionByName(cross).select(
        *group_cols,
        "prev_key",
        "next_key",
        (F.col("next_key") - F.col("prev_key") - 1).alias("n_missing"),
    )


def sketch_distinct_by_group(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    lg_k: int = 14,
) -> DataFrame:
    """Mergeable per-group distinct-count sketches (Apache DataSketches
    HLL via Spark's hll_sketch_agg): returns group_cols +
    [sketch (binary), n_exact (bigint)].

    The sketch column is the POINT: at 10^12 rows the exact distinct is
    a full shuffle of the key domain, but per-partition/per-day
    sketches are a few KB each, persist in a manifest table, and merge
    associatively — tomorrow's incremental load unions yesterday's
    sketches without touching yesterday's rows. ``n_exact`` rides along
    here for tolerance gating at test scale; production callers drop
    it (it is the expensive leg).
    """
    aggs = [
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lg_k)).alias("sketch"),
        F.count_distinct(F.col(col)).alias("n_exact"),
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def sketch_merge_estimate(sketches: DataFrame, group_cols: list[str] | None = None):
    """Union per-group sketches (optionally regrouped coarser) and
    estimate: group_cols + [estimate (bigint)]. Merging sketches from
    disjoint loads is the incremental-cardinality contract —
    estimate(union) ≡ estimate(one-shot) on the same rows."""
    group_cols = list(group_cols or [])
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def column_category_profile(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Per-column categorical profile: (column, n, n_distinct,
    gini_impurity, entropy_nats).

    gini = 1 − Σc²/N² is computed from EXACT integer count sums —
    bit-identical cross-engine (one IEEE division at the end). Entropy
    needs ln: per-value terms c·ln(c) are rounded to 6 decimals before
    the sum and the result rounded again (the engine's standard
    portable-float contract, cf. bm25/tfidf).

    Scale shape: one groupBy per column over (column literal, value) —
    submitted as a UNION of per-column aggregates so Catalyst scans
    once per column with map-side combine; the value-frequency tables
    (the only shuffles) are vocabulary-sized, and the final per-column
    reduce is rows=distinct values.
    """
    outs = []
    for c in cols:
        freq = (
            df.select(F.col(c).cast("string").alias("_v"))
            .filter(F.col("_v").isNotNull())
            .groupBy("_v")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        outs.append(
            freq.agg(
                F.lit(c).alias("column"),
                F.sum("_c").alias("n"),
                F.count(F.lit(1)).alias("n_distinct"),
                # Σc² accumulates in decimal so a 10^12-count value
                # cannot overflow the long product; ONE double division
                # at the end (decimal→double and long→double casts are
                # nearest-even in both engines → bit-identical)
                F.round(
                    F.lit(1.0)
                    - F.sum(
                        (
                            F.col("_c").cast("decimal(18,0)")
                            * F.col("_c").cast("decimal(18,0)")
                        ).cast("decimal(38,0)")
                    ).cast("double")
                    / (F.sum("_c").cast("double") * F.sum("_c").cast("double")),
                    9,
                ).alias("gini_impurity"),
                F.round(
                    F.log(F.sum("_c").cast("double"))
                    - F.sum(
                        F.round(F.col("_c") * F.log(F.col("_c").cast("double")), 6)
                    )
                    / F.sum("_c"),
                    6,
                ).alias("entropy_nats"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def equidepth_bins(
    df: DataFrame,
    value: str,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-depth (quantile) binning without a global sort — the
    feature-bucketization primitive (length deciles, price bands,
    score calibration buckets) SQL usually spells NTILE. NTILE needs a
    TOTAL ORDER of the table (a global range-partitioned sort at 100 TB)
    and splits ties by arbitrary row index, so two runs can bin the
    same value differently. Value-boundary bins instead: the interior
    boundaries are the EXACT linearly-interpolated quantiles at
    i/n_bins (``percentile`` ≡ DuckDB ``quantile_cont``, the X37/IQR
    cross-engine contract), and a row's bin is the count of boundaries
    strictly below its value — right-closed intervals, deterministic,
    identical on any engine, and mergeable (two runs over disjoint data
    with the same boundaries produce addable bin counts).

    Scale shape: pass 1 is ONE percentile aggregate per group (the
    per-group sort inside the agg is the price of exactness — swap in
    percentile_approx for a mergeable sketch when groups are huge);
    pass 2 broadcasts the one-row-per-group boundary table back and
    assigns bins with n_bins−1 STATIC codegen comparisons (expanded at
    plan build, no interpreted HOF lambda per row), then one
    bin-keyed groupBy whose output is ≤ groups × n_bins rows.

    Returns (group_cols…, bin, lo, hi, n_rows, min_v, max_v): lo/hi are
    the enclosing boundaries rounded to 6 (NULL at the open ends);
    NULL values are excluded (they have no quantile position).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    group_cols = group_cols or []
    probs = ", ".join(repr(i / n_bins) for i in range(1, n_bins))
    v = F.col(value).cast("double")
    rows = df.filter(v.isNotNull()).select(
        *group_cols, v.alias("_v")
    )
    bounds = rows.groupBy(*group_cols).agg(
        F.expr(f"percentile(_v, array({probs}))").alias("_bs")
    )
    if group_cols:
        br = F.broadcast(
            bounds.select(
                *[F.col(c).alias(f"_b_{c}") for c in group_cols], "_bs"
            )
        )
        cond = None
        for c in group_cols:
            e = F.col(c).eqNullSafe(F.col(f"_b_{c}"))
            cond = e if cond is None else (cond & e)
        joined = rows.join(br, cond).drop(*[f"_b_{c}" for c in group_cols])
    else:
        joined = rows.crossJoin(F.broadcast(bounds))
    bin_expr = None
    for k in range(1, n_bins):
        term = (F.col("_v") > F.element_at(F.col("_bs"), k)).cast("int")
        bin_expr = term if bin_expr is None else (bin_expr + term)
    binned = joined.withColumn("bin", bin_expr)
    return (
        binned.groupBy(*group_cols, "bin")
        .agg(
            F.first("_bs").alias("_bs"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        )
        .select(
            *group_cols,
            "bin",
            F.when(
                F.col("bin") >= 1, F.round(F.element_at("_bs", F.col("bin")), 6)
            ).alias("lo"),
            F.when(
                F.col("bin") <= n_bins - 2,
                F.round(F.element_at("_bs", F.col("bin") + 1), 6),
            ).alias("hi"),
            "n_rows",
            "min_v",
            "max_v",
        )
    )


def length_histogram(
    df: DataFrame, cols: list[str], max_pow: int = 20
) -> DataFrame:
    """Per-column string-length histogram on power-of-two buckets —
    the north-star's per-column "length histograms" as a first-class
    operator: bucket k holds lengths in [2^k, 2^(k+1)) (bucket 0 is
    [0, 2)), the standard log-scaled shape for text columns whose
    lengths span five orders of magnitude, where fixed-width bins
    would put 99% of documents in one bin.

    Integer-exact by construction: the bucket is a CASE ladder of
    ``len >= 2^k`` comparisons against LITERAL powers of two — never
    floor(log2(x)), whose float rounding at exact powers of two can
    differ across engines. NULL values are excluded (a null has no
    length); empty strings land in bucket 0.

    Scale shape: ONE scan reshapes all columns to (column, len) rows
    via stack (a generator, but emitting two small ints per column —
    no text bytes survive past the length() call in the same stage),
    then ONE groupBy whose output is bounded by cols × (max_pow+1)
    rows with map-side combine. No Python, no sort, no second scan.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    stack_expr = ", ".join(f"'{c}', length(`{c}`)" for c in cols)
    lens = df.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column, len)"
    ).filter(F.col("len").isNotNull())
    bucket = None
    for k in range(1, max_pow + 1):
        term = (F.col("len") >= F.lit(2**k)).cast("int")
        bucket = term if bucket is None else (bucket + term)
    return (
        lens.withColumn("bucket", bucket)
        .groupBy("column", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("len").cast("int").alias("min_len"),
            F.max("len").cast("int").alias("max_len"),
        )
    )


def pattern_profile(
    df: DataFrame,
    cols: list[str],
    top_n: int = 10,
    max_sig_len: int = 16,
) -> DataFrame:
    """Per-column value-PATTERN profile — the format-discovery half of
    a data profiler (Deequ/DataCleaner lineage): every value is mapped
    to its character-class signature (digits→``9``, uppercase→``A``,
    lowercase→``a``, everything else kept literally), truncated to
    ``max_sig_len`` chars with a ``…`` marker, and the top-``top_n``
    signatures per column are reported with counts and one example.
    'o_orderpriority looks like ``9-AAAA`` in 99.9% of rows' is how
    format regressions (a new ID scheme, a locale-formatted number
    column) surface before any typed rule exists — and the output is
    exactly the evidence a CHECK-constraint suggestion (X103) needs to
    propose a LIKE/regexp rule.

    Engine-portable: the signature is three chained ``regexp_replace``
    calls with single-character classes (identical RE2/PCRE semantics),
    a substring, and a concat — deterministic string ops; the example
    is the MIN value per (column, signature), not an arbitrary first().

    Scale shape: map-only signature projection via one stack() reshape
    (text bytes die in the scan stage — only ≤max_sig_len signatures
    reach the exchange), ONE groupBy(column, signature) with map-side
    combine, then the cap_per_group rank discipline on the
    signature-frequency table (vocabulary-sized, never the corpus) for
    top-n. NULLs are profiled as their own ``<null>`` signature row —
    a format profile that silently drops nulls misreports the column.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    vals = df.selectExpr(f"stack({len(cols)}, {stack_expr}) as (column, v)")
    # the class replaces are 1-char → 1-char, so length(signature) ==
    # length(value) and everything past max_sig_len is discarded by the
    # truncation anyway — classify ONLY the prefix and decide the
    # marker from length(v). Output-identical to classifying the whole
    # string (the oracle spells it whole-string), but the regex work
    # per row drops from the full text to max_sig_len chars: measured
    # 10.8× → ~1× wall at the 10M-doc tier, where whole-string
    # classification was the only linear-in-bytes stage left.
    sig_raw = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.substring(F.col("v"), 1, max_sig_len), "[0-9]", "9"
            ),
            "[A-Z]",
            "A",
        ),
        "[a-z]",
        "a",
    )
    sig = F.when(F.col("v").isNull(), F.lit("<null>")).otherwise(
        F.when(
            F.length("v") > max_sig_len,
            F.concat(sig_raw, F.lit("…")),
        ).otherwise(sig_raw)
    )
    freq = (
        vals.select("column", sig.alias("signature"), "v")
        .groupBy("column", "signature")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("example"),
        )
    )
    w = Window.partitionBy("column").orderBy(
        F.col("n_rows").desc(), F.col("signature").asc()
    )
    return (
        freq.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
    )


def join_cardinality_profile(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    top_n: int = 10,
) -> DataFrame:
    """Predict an equi-join's output size and skew WITHOUT running the
    join — the planning measurement a 100 TB join decision needs:
    ``|A ⋈ B| = Σ_k cA(k)·cB(k)`` computed exactly from the two key
    histograms, plus the ``top_n`` keys by pair contribution (the rows
    a skew-split or salting decision is about) and the summary row a
    GO/NO-GO gate reads (total pairs, matched key count, max single-key
    contribution and its share).

    Output is long-form: one ``kind='key'`` row per top-contributing
    key (key, n_left, n_right, n_pairs, rank) and one ``kind='total'``
    row (n_pairs = exact join cardinality, n_left/n_right = matched
    DISTINCT key counts, rank NULL). NULL keys never match in an
    equi-join, so they are excluded from both histograms.

    Scale shape: two count aggregates (map-side combined, shuffle =
    distinct keys not rows) + one equi-join OF THE HISTOGRAMS (key-
    cardinality-sized, AQE broadcasts the smaller), then a bounded
    TakeOrdered for the top keys and a one-row total — the join whose
    size this predicts is never executed. The exactness matters: a
    sampled estimate misses exactly the hot keys that blow up
    production joins."""
    ch_l = (
        left.select(F.col(left_key).alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    ch_r = (
        right.select(F.col(right_key).alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    pairs = ch_l.join(ch_r, "key").withColumn(
        "n_pairs", F.col("n_left") * F.col("n_right")
    )
    top = (
        pairs.orderBy(F.col("n_pairs").desc(), F.col("key").asc())
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n_pairs").desc(), F.col("key").asc())
            ).cast("int"),
        )
        .select(
            F.lit("key").alias("kind"),
            F.col("key").cast("string").alias("key"),
            "n_left", "n_right", "n_pairs", "rank",
        )
    )
    total = pairs.agg(
        F.count(F.lit(1)).alias("_matched"),
        F.sum("n_pairs").alias("_total"),
    ).select(
        F.lit("total").alias("kind"),
        F.lit(None).cast("string").alias("key"),
        F.col("_matched").alias("n_left"),
        F.col("_matched").alias("n_right"),
        F.col("_total").alias("n_pairs"),
        F.lit(None).cast("int").alias("rank"),
    )
    return top.unionByName(total)


def sampled_audit(
    df: DataFrame,
    partition_col: str,
    violation_pred,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    z: float = 1.96,
) -> DataFrame:
    """Audit-by-sampling with a confidence certificate: at 10^12 docs a
    full re-validation of every partition is the thing you CAN'T always
    afford, so this evaluates ``violation_pred`` on a deterministic
    hash sample and emits, per partition, the sampled violation rate
    with its Wilson score interval — the bound an auditor signs off on
    ("violation rate ≤ wilson_hi at 95%"), not a point guess.

    The sample is ``hash_unit(key) < fraction`` (filtering.py): a pure
    function of the key, so re-runs, resumed jobs, other engines, and
    the DuckDB oracle select the IDENTICAL rows — the certificate is
    reproducible evidence, unlike ``df.sample``'s per-task rng. Wilson
    (not normal approximation) because audited partitions are exactly
    where p̂ is near 0 and n·p̂ is small — the regime where the Wald
    interval collapses to a lying [0, 0].

    Output per partition: ``(partition, n_sampled, n_violations,
    p_hat, wilson_lo, wilson_hi)``, rates rounded to 6 decimals under
    the package's cross-engine IEEE contract (the formula is evaluated
    in one fixed association order). Partitions with no sampled rows
    produce no row — a certificate needs evidence.

    Scale shape: the sample filter is map-only and pushes to the scan
    (only the sampled fraction of bytes survives the first stage); the
    single groupBy is partition-count-bounded; the interval arithmetic
    runs on the aggregate row. Total cost ≈ fraction × one scan.
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    from zparse_spark.operators.filtering import hash_unit

    pred = F.expr(violation_pred) if isinstance(violation_pred, str) else violation_pred
    sampled = df.filter(hash_unit(key_col, seed) < fraction)
    agg = sampled.groupBy(F.col(partition_col).alias("partition")).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.coalesce(pred.cast("int"), F.lit(0))).alias("n_violations"),
    )
    n = F.col("n_sampled").cast("double")
    p = F.col("n_violations").cast("double") / n
    z2 = float(z) * float(z)
    denom = F.lit(1.0) + F.lit(z2) / n
    center = (p + F.lit(z2) / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (F.lit(1.0) - p) / n + F.lit(z2) / (F.lit(4.0) * n * n))
        / denom
    )
    return agg.select(
        "partition",
        "n_sampled",
        "n_violations",
        F.round(p, 6).alias("p_hat"),
        F.round(F.greatest(F.lit(0.0), center - half), 6).alias("wilson_lo"),
        F.round(F.least(F.lit(1.0), center + half), 6).alias("wilson_hi"),
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive: str | None = None,
) -> DataFrame:
    """X137: k-anonymity / l-diversity audit — the privacy gate a
    training-corpus release needs next to the PII redaction pass
    (text.redact_pii removes direct identifiers; this flags rows that
    remain re-identifiable through QUASI-identifier combinations):
    every combination of ``qi_cols`` shared by fewer than ``k`` rows is
    an equivalence class whose members can be singled out. With a
    ``sensitive`` column the same pass reports each class's distinct
    sensitive-value count (l-diversity: l==1 means membership leaks the
    value even when k is met).

    Output: one row per violating equivalence class (class_size < k OR
    l_diversity < 2 when a sensitive column is given), carrying the QI
    values, class_size, and l_diversity — bounded by the number of rare
    classes, never the corpus.

    Scale shape: ONE groupBy on the QI key (map-side combine;
    count_distinct of the sensitive column is the standard two-phase
    partial) — the same shuffle a uniqueness check pays. NULL QI values
    group as their own class (NULL education is itself identifying).
    """
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive is not None:
        aggs.append(F.countDistinct(F.col(sensitive)).alias("l_diversity"))
    grouped = df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)
    cond = F.col("class_size") < k
    if sensitive is not None:
        cond = cond | (F.col("l_diversity") < 2)
    return grouped.filter(cond)


def column_profile_partials(
    df: DataFrame, cols: list[str], unit_col: str = "partition"
) -> DataFrame:
    """X140: per-unit MERGEABLE profile partials — the incremental-stats
    layer under column_profile: each ingestion unit (partition, day,
    micro-batch) reduces to primitive aggregates that merge EXACTLY
    (counts add, min/min, max/max, integer sums add), so a resumed or
    incremental run profiles only the NEW units and folds them into the
    running profile — the same per-partition lineage+metrics discipline
    as the manifest checkpoint, applied to statistics. (This is why the
    partials are counts/extrema/sums and not rates/averages: a null_rate
    or avg does not merge; its numerator and denominator do.)

    Output: one row per (unit, column): n_rows, n_nonnull, min, max,
    sum (doubles; NULL for non-numeric columns).

    Scale shape: ONE groupBy(unit) pass with every per-column aggregate
    partial-combined map-side, then a driver-free stack() reshape —
    |units| x |cols| tiny rows, safe to sink into the manifest table.
    """
    dts = dict(df.dtypes)
    aggs = []
    for c in cols:
        dt = dts[c]
        num = dt in (
            "bigint",
            "int",
            "smallint",
            "tinyint",
            "double",
            "float",
        ) or dt.startswith("decimal")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
        ]
        if num:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                F.sum(F.col(c).cast("double")).alias(f"{c}__sum"),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"{c}__min"),
                F.lit(None).cast("double").alias(f"{c}__max"),
                F.lit(None).cast("double").alias(f"{c}__sum"),
            ]
    wide = df.groupBy(F.col(unit_col).alias("unit")).agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nonnull`, `{c}__min`, `{c}__max`, `{c}__sum`"
        for c in cols
    )
    return wide.selectExpr(
        "unit",
        f"stack({len(cols)}, {stack_expr}) as (column, n_rows, n_nonnull, min, max, sum)",
    )


def merge_column_profile_partials(partials: DataFrame) -> DataFrame:
    """Fold profile partials (any subset of units, produced by any run
    or engine) into the finalized per-column profile: counts and sums
    add, extrema take min/max, and the derived metrics (avg, null_rate)
    are computed ONCE from the merged primitives — so
    finalize(merge(partials)) == profile(whole table), exactly for
    integer-summed columns and to last-ulp association noise for float
    sums. groupBy on |units| x |cols| rows — driver never sees data."""
    m = partials.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nonnull").alias("n_nonnull"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.sum("sum").alias("sum"),
    )
    return m.select(
        "column",
        "n_rows",
        "n_nonnull",
        "min",
        "max",
        F.round(F.col("sum") / F.col("n_nonnull"), 6).alias("avg"),
        F.round((F.col("n_rows") - F.col("n_nonnull")) / F.col("n_rows"), 6).alias(
            "null_rate"
        ),
    )


def null_rate_drift(
    df: DataFrame,
    col: str,
    partition_col: str = "partition",
    z_threshold: float = 4.0,
) -> DataFrame:
    """X145: cross-sectional null-rate drift — which partitions' null
    rate for ``col`` is statistically incompatible with the corpus rate
    (a loader that silently started dropping a field corrupts ONE
    partition's null rate first; the global profile barely moves). The
    one-proportion z-score against the pooled rate,

        z = (p_i - p) / sqrt(p * (1 - p) / n_i),

    flags partitions at |z| >= z_threshold. Complements the HISTORY
    monitor (manifest.violation_rate_regressions compares runs over
    time); this needs no history — one snapshot, partitions vs pooled.

    Scale shape: ONE groupBy(partition) carrying two integer counts;
    the pooled rate is a broadcast one-row aggregate OF THE PARTIALS.
    Exact integer counts, one division chain per partition, round-6
    output — engine-portable. Degenerate pooled rates (p = 0 or 1 where
    every deviating partition is infinitely surprising) get z = NULL
    and flag on ANY deviation from the pooled rate instead.
    """
    parts = df.groupBy(F.col(partition_col).alias("partition")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_null"),
    )
    pooled = parts.agg(
        F.sum("n_rows").alias("_tn"), F.sum("n_null").alias("_tnull")
    )
    j = parts.crossJoin(F.broadcast(pooled))
    p = F.col("_tnull") / F.col("_tn")
    pi = F.col("n_null") / F.col("n_rows")
    z = (pi - p) / F.sqrt(p * (F.lit(1.0) - p) / F.col("n_rows"))
    degenerate = (F.col("_tnull") == 0) | (F.col("_tnull") == F.col("_tn"))
    from zparse_spark.functions.numeric import round_duck

    out = j.select(
        "partition",
        "n_rows",
        "n_null",
        # round_duck, not F.round: the r5 driver gate hashed this red on
        # a last-ulp divergence between Spark's and DuckDB's round(x,6)
        # (the z also rides through sqrt, which is IEEE-identical; only
        # the rounding step differed)
        round_duck(pi, 6).alias("null_rate"),
        round_duck(p, 6).alias("pooled_rate"),
        F.when(~degenerate, round_duck(z, 6)).alias("z"),
        F.when(degenerate, F.col("n_null") * F.col("_tn") != F.col("_tnull") * F.col("n_rows"))
        .otherwise(F.abs(z) >= z_threshold)
        .alias("drifted"),
    )
    return out.filter(F.col("drifted"))


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared + G-test (likelihood ratio) + Cramér's V for
    independence of two categorical columns — the hypothesis-test seat
    in the drift family (PSI/KL/KS/EMD measure magnitude; this one
    carries a statistic with a known null distribution and degrees of
    freedom, so a monitor can alarm at a chosen false-positive rate).

    chi2 sums (o-e)^2/e over the FULL r x c grid — zero-observed cells
    contribute e, so the grid is densified by crossing the two margins
    (bounded: category variety squared) and left-joining the observed
    contingency table. G = 2 * sum o*ln(o/e) over observed cells only
    (0*ln0 = 0). Cramér's V = sqrt(chi2 / (n * (min(r,c) - 1))).

    Scale shape: ONE groupBy(a, b) over the data (map-side combined,
    output bounded by variety); margins, the dense grid, and every
    statistic are arithmetic on that bounded table. Counts stay exact
    integers until the final float expressions; expected counts and the
    two statistics are IEEE doubles summed over the bounded grid in one
    aggregate. NULL categories are excluded (SQL GROUP BY would keep
    them; a drift test over "value present" pairs is the contract here,
    matching the drift operators above).
    """
    obs = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    ra = obs.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("cb"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        ra.crossJoin(F.broadcast(cb))
        .join(obs, ["a", "b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (F.col("ra").cast("double") * F.col("cb") / F.col("n")).alias("e"),
            "n",
        )
    )
    return (
        grid.agg(
            F.max("n").alias("n"),
            F.countDistinct("a").alias("r"),
            F.countDistinct("b").alias("c"),
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
                "_chi2"
            ),
            F.sum(
                F.when(
                    F.col("o") > 0,
                    2.0 * F.col("o") * F.log(F.col("o") / F.col("e")),
                ).otherwise(0.0)
            ).alias("_g2"),
        )
        .select(
            "n",
            "r",
            "c",
            ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
            F.round("_chi2", 6).alias("chi2"),
            F.round("_g2", 6).alias("g2"),
            F.round(
                F.sqrt(
                    F.col("_chi2")
                    / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


def contribution_analysis(
    df: DataFrame,
    dim: str,
    measure: str,
    period_col: str = "period",
    ref_label: str = "ref",
    cur_label: str = "cur",
) -> DataFrame:
    """Root-cause contribution analysis (Adtributor, Bhagwan et al.
    NSDI 2014, simplified to one dimension): when a monitored total
    moves between a reference and a current period, rank the dimension
    values by HOW MUCH of the move they explain — explanatory power
    (their share of the total delta) and surprise (per-value
    Jensen-Shannon divergence between the two share distributions,
    which catches a value whose share shifted even when the net total
    barely moved).

    Output per dim value: measure_ref/measure_cur, share_ref/share_cur
    (value's fraction of its period total), delta_share,
    explains_frac = (cur - ref) / (total_cur - total_ref) (NULL when
    the totals are equal), and js_surprise; rounded to 6 decimals.

    Scale shape: ONE groupBy(dim, period) over the data (map-side
    combined, variety-bounded output), reshaped to one row per value
    with conditional aggregation; period totals ride along via a window
    over the bounded table. Values absent from one period get measure 0
    there — births and deaths are the strongest root causes and must
    not drop out of the ranking.
    """
    g = (
        df.filter(F.col(period_col).isin(ref_label, cur_label))
        .groupBy(F.col(dim).alias("value"))
        .agg(
            F.sum(
                F.when(F.col(period_col) == ref_label, F.col(measure)).otherwise(0.0)
            ).alias("m_ref"),
            F.sum(
                F.when(F.col(period_col) == cur_label, F.col(measure)).otherwise(0.0)
            ).alias("m_cur"),
        )
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = g.withColumn("t_ref", F.sum("m_ref").over(w)).withColumn(
        "t_cur", F.sum("m_cur").over(w)
    )
    p = F.col("m_ref") / F.col("t_ref")
    q = F.col("m_cur") / F.col("t_cur")
    js = 0.5 * (
        F.when(p > 0, p * F.log(2.0 * p / (p + q))).otherwise(0.0)
        + F.when(q > 0, q * F.log(2.0 * q / (p + q))).otherwise(0.0)
    )
    return t.select(
        "value",
        F.round("m_ref", 6).alias("measure_ref"),
        F.round("m_cur", 6).alias("measure_cur"),
        F.round(p, 6).alias("share_ref"),
        F.round(q, 6).alias("share_cur"),
        F.round(q - p, 6).alias("delta_share"),
        F.round(
            F.when(
                F.col("t_cur") != F.col("t_ref"),
                (F.col("m_cur") - F.col("m_ref")) / (F.col("t_cur") - F.col("t_ref")),
            ),
            6,
        ).alias("explains_frac"),
        F.round(js, 6).alias("js_surprise"),
    )


def category_drift(
    cur: DataFrame,
    ref: DataFrame,
    col: str,
) -> DataFrame:
    """New/vanished category detector between two snapshots of a
    column — the drift monitor PSI/KL cannot express (they compare
    shares on a SHARED support; a category that did not exist last week
    is support change, the loudest and most actionable kind: a new
    upstream producer, a schema code leak, a language id regression).

    Output: (status 'new'|'gone', value, n, share) — 'new' categories
    with their current count/share, 'gone' with their reference
    count/share. Unchanged categories are not emitted (bounded output).
    Two variety-bounded groupBys + a full outer join on the category
    value; NULL categories are tracked like any other value (a column
    suddenly going NULL-bearing IS a birth).
    """
    c = cur.groupBy(F.col(col).alias("value")).agg(F.count(F.lit(1)).alias("n_cur"))
    r = ref.groupBy(F.col(col).alias("value")).agg(F.count(F.lit(1)).alias("n_ref"))
    wc = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j = (
        c.join(r, c["value"].eqNullSafe(r["value"]), "full_outer")
        .select(
            F.coalesce(c["value"], r["value"]).alias("value"),
            F.col("n_cur"),
            F.col("n_ref"),
        )
        .withColumn("t_cur", F.sum("n_cur").over(wc))
        .withColumn("t_ref", F.sum("n_ref").over(wc))
    )
    new = j.filter(F.col("n_ref").isNull()).select(
        F.lit("new").alias("status"),
        "value",
        F.col("n_cur").alias("n"),
        F.round(F.col("n_cur") / F.col("t_cur"), 6).alias("share"),
    )
    gone = j.filter(F.col("n_cur").isNull()).select(
        F.lit("gone").alias("status"),
        "value",
        F.col("n_ref").alias("n"),
        F.round(F.col("n_ref") / F.col("t_ref"), 6).alias("share"),
    )
    return new.unionByName(gone)


def seasonal_volume_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    z_cut: float = 3.0,
) -> DataFrame:
    """Weekday-seasonal volume monitor: each day's event count against
    the MEDIAN count of its own weekday, deviation scored in robust MAD
    units — the seasonality-aware sibling of the CUSUM monitor (X84):
    a Sunday that looks like a Sunday is fine even though it would be a
    3-sigma drop against the all-days baseline; a Tuesday at Sunday
    volume is the incident.

    Exactness: daily counts are exact integers from ONE groupBy(day)
    (map-side combined, output = |days| rows); the per-weekday median
    and MAD use exact interpolated percentiles on that bounded table
    (the X37 contract — identical halves interpolation in Spark
    ``percentile`` and DuckDB ``median``); the one float comparison is
    |n - med| >= z_cut * greatest(mad, 0.5), with the 0.5 floor making
    a zero-MAD weekday (4 identical weeks) flag any change rather than
    divide by zero.

    Output per day: (day, dow, n, baseline_med, mad, deviation,
    flagged) — the full curve, not just alarms, so the oracle checks
    the baseline math everywhere.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = events.select(day.alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    # dayofweek is 1=Sunday..7=Saturday in both Spark and DuckDB
    d = daily.withColumn("dow", F.dayofweek("day"))
    wd = Window.partitionBy("dow")
    med = F.expr("percentile(n, 0.5)").over(wd)
    staged = d.withColumn("baseline_med", med)
    mad = F.expr("percentile(abs(n - baseline_med), 0.5)").over(wd)
    out = staged.withColumn("mad", mad)
    dev = (F.col("n") - F.col("baseline_med")) / F.greatest(
        F.col("mad"), F.lit(0.5)
    )
    return out.select(
        "day",
        "dow",
        "n",
        F.round("baseline_med", 6).alias("baseline_med"),
        F.round("mad", 6).alias("mad"),
        F.round(dev, 6).alias("deviation"),
        (F.abs(dev) >= z_cut).alias("flagged"),
    )


def theil_sen_trend(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key Theil–Sen robust daily-volume trend: the MEDIAN of all
    pairwise slopes (n_j − n_i)/(x_j − x_i) over the densified day
    grid — the robust companion of ``volume_trend``'s least-squares
    slope (one corrupted day drags an LS slope arbitrarily far; the
    pairwise median has a 29% breakdown point, so a single broken
    ingest day cannot fake or mask a bleed).

    Exactness contract: daily counts and day indices are exact
    integers, so every pairwise slope is ONE IEEE division of exact
    integers — bit-identical cross-engine — and the median is the same
    interpolated ``percentile`` ↔ ``quantile_cont`` halves rule the
    rest of the robust family uses.

    Scale shape: the quadratic pair join runs on the DAILY COUNTS
    table (|days| rows per key, ~365/key/year), never on raw events:
    one full-data groupBy(day, key), then O(k·d²) arithmetic on a
    bounded grid — driver-free and shuffle-light. ~90-day windows keep
    d² ≈ 4k pairs/key; for multi-year spans, cap the window upstream.
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = df.select(day.alias("day"), F.col(key).alias("_k")).groupBy(
        "day", "_k"
    ).agg(F.count(F.lit(1)).alias("n"))
    mm = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        mm.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .crossJoin(daily.select("_k").distinct())
    )
    dense = (
        grid.join(daily, ["day", "_k"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn("x", F.datediff(F.col("day"), F.min("day").over(
            Window.partitionBy("_k")
        )).cast("long"))
        .select("_k", "x", "n")
    )
    a, b = dense.alias("a"), dense.alias("b")
    pairs = a.join(
        b,
        (F.col("a._k") == F.col("b._k")) & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a._k").alias("_k"),
        (
            (F.col("b.n") - F.col("a.n")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    return pairs.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("ts_slope_per_day"),
    ).select(F.col("_k").alias(key), "n_pairs", "ts_slope_per_day")


def mahalanobis_outliers(
    df: DataFrame,
    x: str,
    y: str,
    group: str,
    threshold: float = 13.8155,
) -> DataFrame:
    """Bivariate Mahalanobis outlier screen: per-row squared distance
    md² = [dx dy] Σ⁻¹ [dx dy]ᵀ against the GLOBAL mean/covariance of
    (x, y), reported per group — the joint-distribution companion of
    the univariate IQR fence (a lineitem whose price is 3× off for its
    quantity is invisible to both marginal screens; the covariance
    ellipse catches it). Default threshold 13.8155 = χ²₂ at 0.999.

    Determinism contract: the five moment parameters (means, variances,
    covariance) are rounded to 6 decimals BEFORE the per-row distance,
    so md² is a pure closed-form function of exact column values and
    identical-to-the-digit parameters in every engine (the round-6
    moments absorb sum-order ulp drift, the same discipline as the
    correlation matrix). Closed-form 2×2 inverse — no linalg library.

    Scale shape: pass 1 is one map-combined aggregate (6 running sums);
    pass 2 re-scans with the 5 broadcast scalars — no shuffle beyond
    the final tiny per-group rollup.
    """
    m = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(x), 6).alias("mx"),
        F.round(F.avg(y), 6).alias("my"),
        F.round(F.avg(F.col(x) * F.col(x)) - F.avg(x) * F.avg(x), 6).alias("vxx"),
        F.round(F.avg(F.col(y) * F.col(y)) - F.avg(y) * F.avg(y), 6).alias("vyy"),
        F.round(F.avg(F.col(x) * F.col(y)) - F.avg(x) * F.avg(y), 6).alias("vxy"),
    )
    j = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull()).crossJoin(
        F.broadcast(m)
    )
    dx = F.col(x) - F.col("mx")
    dy = F.col(y) - F.col("my")
    det = F.col("vxx") * F.col("vyy") - F.col("vxy") * F.col("vxy")
    # a singular covariance (perfectly correlated or constant cloud)
    # has no defined distance: md² is NULL, never a divide-by-zero
    md2 = F.when(
        det != 0.0,
        (
            dx * dx * F.col("vyy")
            - F.lit(2.0) * dx * dy * F.col("vxy")
            + dy * dy * F.col("vxx")
        )
        / det,
    )
    return (
        j.withColumn("md2", md2)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum((F.col("md2") > threshold).cast("long")), F.lit(0)
            ).alias("n_outliers"),
            F.round(F.max("md2"), 4).alias("max_md2"),
        )
    )


def volume_acf(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    lags: tuple = (1, 7),
) -> DataFrame:
    """Per-key lag-k autocorrelation of the densified daily-count
    series — the seasonality-STRENGTH number next to the weekday
    anomaly screen (X163 asks "is today off for a Tuesday?"; this asks
    "how weekly IS this stream?", the number that decides whether a
    weekday-conditional baseline is even warranted; lag-1 near 1 means
    momentum, near 0 means white noise).

    Exactness: the Pearson r of (y_t, y_{t+k}) pairs is computed from
    six exact BIGINT sums over the dense grid; the only float ops are
    one correctly-rounded IEEE sqrt and one division of
    integer-derived doubles — bit-identical cross-engine with no
    rounding tricks needed (round-6 applied for display only).

    Scale shape: one full-data groupBy(day, key); the lag join and the
    moment sums run on the bounded daily table (|days| rows per key).
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = df.select(day.alias("day"), F.col(key).alias("_k")).groupBy(
        "day", "_k"
    ).agg(F.count(F.lit(1)).alias("n"))
    mm = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        mm.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .crossJoin(daily.select("_k").distinct())
    )
    dense = (
        grid.join(daily, ["day", "_k"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn("x", F.datediff(F.col("day"), F.min("day").over(
            Window.partitionBy("_k")
        )).cast("long"))
        .select("_k", "x", "n")
    )
    lag_df = dense.sparkSession.createDataFrame(
        [(int(k),) for k in lags], "lag bigint"
    )
    a, b = dense.alias("a"), dense.alias("b")
    pairs = a.crossJoin(F.broadcast(lag_df)).join(
        b,
        (F.col("a._k") == F.col("b._k"))
        & (F.col("b.x") == F.col("a.x") + F.col("lag")),
    ).select(
        F.col("a._k").alias("_k"),
        "lag",
        F.col("a.n").alias("y0"),
        F.col("b.n").alias("y1"),
    )
    g = pairs.groupBy("_k", "lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("y0").alias("s0"),
        F.sum("y1").alias("s1"),
        F.sum(F.col("y0") * F.col("y0")).alias("s00"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11"),
        F.sum(F.col("y0") * F.col("y1")).alias("s01"),
    )
    var0 = g["m"] * F.col("s00") - F.col("s0") * F.col("s0")
    var1 = g["m"] * F.col("s11") - F.col("s1") * F.col("s1")
    cov = g["m"] * F.col("s01") - F.col("s0") * F.col("s1")
    r = F.when(
        (var0 > 0) & (var1 > 0),
        F.round(
            cov.cast("double")
            / F.sqrt(var0.cast("double") * var1.cast("double")),
            6,
        ),
    )
    return g.select(
        F.col("_k").alias(key),
        "lag",
        F.col("m").alias("n_pairs"),
        r.alias("acf"),
    )


def impute_group_median(
    df: DataFrame,
    value: str,
    group: str,
) -> DataFrame:
    """Median imputation audit per group: the per-group interpolated
    median of the non-null values, how many nulls it would fill, and
    the group mean before/after the fill — the REPAIR leg for
    missingness (clamp_outliers repairs out-of-range values; this
    repairs absent ones, with the same detection-and-repair-share-one-
    contract discipline: the median is the exact percentile ↔
    quantile_cont halves rule).

    Returns the AUDIT table (group, n, n_null, median_used,
    mean_before, mean_after), not the imputed rows — at 100 TB the
    imputation itself is a map-only broadcast-join rewrite the caller
    applies; the audit is what the oracle can value-match.
    """
    g = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value).isNull().cast("long")).alias("n_null"),
        F.expr(f"percentile({value}, 0.5)").alias("_med"),
        F.sum(value).alias("_sum"),
        F.count(value).alias("_cnt"),
    )
    mean_before = F.col("_sum") / F.col("_cnt")
    mean_after = (
        F.col("_sum") + F.col("n_null") * F.col("_med")
    ) / (F.col("_cnt") + F.col("n_null"))
    return g.select(
        group,
        "n_rows",
        "n_null",
        F.round("_med", 6).alias("median_used"),
        F.round(mean_before, 6).alias("mean_before"),
        F.round(mean_after, 6).alias("mean_after"),
    )


def ewma_control_chart(
    df: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 30,
) -> DataFrame:
    """Per-key EWMA control chart over the densified daily-count
    series with DYADIC weights w_i ∝ 2^{-i} (α = 1/2) — the smoothed
    baseline + one-step-ahead residual that catches slow level shifts
    CUSUM's reset logic and the weekday screen both miss.

    Exactness contract (the reason for dyadic α): the weighted sum
    Σ y_{t-i}·2^{L-i} over the trailing window (L = min(t, W)) is
    EXACT BIGINT arithmetic — shiftleft, no libm pow — normalized by
    the exact integer 2^{L+1}−1, so the smoothed value is ONE IEEE
    division of identical integers in every engine: bit-identical,
    like the regression/ACF family, with no per-term float sums at
    all. Daily counts up to ~2^25 with W=30 stay within int64.

    Scale shape: one full-data groupBy(day, key); the windowed join
    (each day pulls ≤ W+1 prior days) runs on the bounded daily table.
    Residual = y_t − ewma_{t−1} (the forecast miss, NULL on day 0).
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = df.select(day.alias("day"), F.col(key).alias("_k")).groupBy(
        "day", "_k"
    ).agg(F.count(F.lit(1)).alias("n"))
    mm = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        mm.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .crossJoin(daily.select("_k").distinct())
    )
    dense = (
        grid.join(daily, ["day", "_k"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn("x", F.datediff(F.col("day"), F.min("day").over(
            Window.partitionBy("_k")
        )).cast("long"))
        .select("_k", "day", "x", "n")
    )
    a, b = dense.alias("a"), dense.alias("b")
    w = F.lit(window_days)
    pairs = a.join(
        b,
        (F.col("a._k") == F.col("b._k"))
        & (F.col("b.x") <= F.col("a.x"))
        & (F.col("b.x") >= F.col("a.x") - w),
    )
    lcap = F.least(F.col("a.x"), w.cast("long"))
    staged = pairs.select(
        F.col("a._k").alias("_k"),
        F.col("a.day").alias("day"),
        F.col("a.x").alias("x"),
        F.col("a.n").alias("n"),
        lcap.alias("_l"),
        (lcap - (F.col("a.x") - F.col("b.x"))).cast("int").alias("_shift"),
        F.col("b.n").alias("_bn"),
    )
    term = F.expr("shiftleft(CAST(1 AS BIGINT), _shift)") * F.col("_bn")
    g = staged.groupBy("_k", "day", "x", "n", "_l").agg(F.sum(term).alias("_num"))
    denom = (
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_l + 1 AS INT))") - F.lit(1)
    ).cast("double")
    ewma = F.col("_num").cast("double") / denom
    out = g.select(
        F.col("_k").alias(key),
        "day",
        "n",
        F.round(ewma, 6).alias("ewma"),
    )
    wk = Window.partitionBy(key).orderBy("day")
    return out.withColumn(
        "residual", F.round(F.col("n") - F.lag("ewma").over(wk), 6)
    )


def gini_concentration(
    df: DataFrame,
    value_cents: str,
    group: str,
) -> DataFrame:
    """Per-group Gini coefficient of an exact-integer value column —
    the concentration audit ("does 1% of customers carry 60% of
    revenue?", "is one source 90% of the corpus?") that a mean/stddev
    profile cannot express. Formula on values sorted ascending with
    rank i = 1..n: G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i).

    Exactness contract: the caller supplies the value ALREADY in exact
    integer units (cents, bytes, counts — e.g. round(sum, 2)·100 cast
    to BIGINT), so every sum is exact integer arithmetic and ties in x
    cannot perturb Σ i·x_i (equal values commute under any tie order);
    ONE IEEE division at the end — bit-identical cross-engine.

    Scale shape: one sort-within-group window (rank) over the
    per-entity rollup (entities, not raw rows), then one groupBy.
    """
    wr = Window.partitionBy(group).orderBy(F.col(value_cents).asc())
    ranked = df.withColumn("_i", F.row_number().over(wr))
    g = ranked.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_cents).alias("_sx"),
        F.sum(F.col("_i") * F.col(value_cents)).alias("_six"),
    )
    gini = F.when(
        (F.col("_sx") > 0) & (F.col("n") > 1),
        F.round(
            (2 * F.col("_six") - (F.col("n") + 1) * F.col("_sx")).cast("double")
            / (F.col("n") * F.col("_sx")).cast("double"),
            6,
        ),
    )
    return g.select(group, "n", F.col("_sx").alias("total"), gini.alias("gini"))


def simpson_audit(
    df: DataFrame,
    x_cents: str,
    y_cents: str,
    group: str,
) -> DataFrame:
    """Simpson's-paradox audit: per-group Pearson correlation of two
    exact-integer columns next to the POOLED correlation, with a flag
    on every group whose association runs OPPOSITE the pooled sign —
    the confounded-metric trap ("discount helps revenue overall" while
    it hurts within every segment) that a single corr matrix
    (stats_correlation_lineitem) structurally cannot show, because the
    pooled number is the only one it has.

    Exactness contract (same as gini_concentration stats.py:2764): the
    caller supplies BOTH columns already in exact integer units, so all
    six moment sums (n, Sx, Sy, Sxx, Syy, Sxy) are exact BIGINT
    arithmetic; each r is then one sqrt + one division on those exact
    integers, rounded to 6dp — bit-identical cross-engine. Degenerate
    groups (zero variance in either column, n < 2) get NULL r, never an
    ANSI error.

    Scale shape (100 TB): ONE map-side-combined groupBy carrying the
    six sums per group; the pooled moments fold from the per-group
    partials (a second agg over the BOUNDED group table — the raw data
    is scanned once), broadcast back as a 1-row cross join. No window,
    no second scan, no Python.
    """
    # moment sums and the r numerator/variances run in DECIMAL(38,0) —
    # Σy² of a cents column overflows BIGINT at ~60k rows already, and
    # n·Σxy / (Σy)² grow ~n²; decimal(38,0) is exact to 10^38 (a billion
    # rows of 10^9-unit values), the same headroom DuckDB gets for free
    # from its HUGEINT sum — both engines stay exact to the final
    # cast-to-double, so the rounded r is bit-identical.
    x = F.col(x_cents).cast("decimal(18,0)")
    y = F.col(y_cents).cast("decimal(18,0)")
    base = df.filter(F.col(x_cents).isNotNull() & F.col(y_cents).isNotNull())
    per = base.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x.cast("decimal(19,0)") * x).alias("_sxx"),
        F.sum(y.cast("decimal(19,0)") * y).alias("_syy"),
    )

    def _r(n, sx, sy, sxx, syy, sxy):
        nd = n.cast("decimal(38,0)")
        vx = nd * sxx - sx.cast("decimal(38,0)") * sx
        vy = nd * syy - sy.cast("decimal(38,0)") * sy
        num = nd * sxy - sx.cast("decimal(38,0)") * sy
        return F.when(
            (n >= 2) & (vx > 0) & (vy > 0),
            F.round(
                num.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
                6,
            ),
        )

    pooled = per.agg(
        F.sum("n").alias("pn"),
        F.sum("_sx").alias("psx"),
        F.sum("_sy").alias("psy"),
        F.sum("_sxx").alias("psxx"),
        F.sum("_syy").alias("psyy"),
        F.sum("_sxy").alias("psxy"),
    ).select(
        _r(
            F.col("pn"), F.col("psx"), F.col("psy"),
            F.col("psxx"), F.col("psyy"), F.col("psxy"),
        ).alias("r_pooled")
    )
    rg = _r(
        F.col("n"), F.col("_sx"), F.col("_sy"),
        F.col("_sxx"), F.col("_syy"), F.col("_sxy"),
    )
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            group,
            "n",
            rg.alias("r_group"),
            "r_pooled",
            F.when(
                rg.isNotNull() & F.col("r_pooled").isNotNull(),
                (rg * F.col("r_pooled")) < 0,
            ).alias("sign_flip"),
        )
    )


def magnitude_profile(
    df: DataFrame,
    value: str,
    group: str,
    min_share: float = 0.2,
    min_gap: int = 3,
) -> DataFrame:
    """Unit-consistency audit via decimal-magnitude modes: per group,
    the two heaviest decades of |value| and a flag when BOTH carry >=
    ``min_share`` of the group's mass while sitting >= ``min_gap``
    decades apart — the signature of a units mixup (cents loaded into a
    dollars column, bytes into KB, ms into s) that mean/stddev/quantile
    profiles smear into "high variance" instead of naming.

    The decade is computed EXACTLY, never via float log10: for
    |v| >= 1 it is length(string(floor(|v|))) - 1 (digit count of the
    integer part); 0 < |v| < 1 folds to decade -1 ("sub-unit"); zeros
    and NULLs carry no magnitude and are excluded (their count is
    reported). Integer string length is deterministic on every engine;
    log10(10^k) on a double is not.

    Scale shape (100 TB): one map-side-combined groupBy on
    (group, decade) — at most ~20 decades per group survive the partial
    agg — then rank windows on that BOUNDED table. The raw column is
    scanned once; nothing global touches row-cardinality data.
    """
    v = F.abs(F.col(value))
    decade = F.when(
        v >= 1, F.length(F.floor(v).cast("bigint").cast("string")) - 1
    ).otherwise(F.lit(-1))
    counts = (
        df.filter(F.col(value).isNotNull() & (v > 0))
        .groupBy(F.col(group).alias("g"), decade.alias("decade"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wg = Window.partitionBy("g")
    wr = Window.partitionBy("g").orderBy(F.col("n").desc(), F.col("decade").asc())
    ranked = counts.select(
        "g",
        "decade",
        "n",
        F.sum("n").over(wg).alias("n_group"),
        F.row_number().over(wr).alias("_rk"),
    ).filter(F.col("_rk") <= 2)
    top = ranked.groupBy("g", "n_group").agg(
        F.max(F.when(F.col("_rk") == 1, F.col("decade"))).alias("top_decade"),
        F.max(F.when(F.col("_rk") == 1, F.col("n"))).alias("_top_n"),
        F.max(F.when(F.col("_rk") == 2, F.col("decade"))).alias("second_decade"),
        F.max(F.when(F.col("_rk") == 2, F.col("n"))).alias("_second_n"),
    )
    top_share = F.round(F.col("_top_n").cast("double") / F.col("n_group"), 6)
    second_share = F.when(
        F.col("_second_n").isNotNull(),
        F.round(F.col("_second_n").cast("double") / F.col("n_group"), 6),
    )
    flag = F.coalesce(
        (F.col("_second_n").cast("double") / F.col("n_group") >= F.lit(min_share))
        & (F.col("_top_n").cast("double") / F.col("n_group") >= F.lit(min_share))
        & (F.abs(F.col("top_decade") - F.col("second_decade")) >= F.lit(min_gap)),
        F.lit(False),
    )
    return top.select(
        F.col("g").alias(group),
        F.col("n_group").alias("n_values"),
        "top_decade",
        top_share.alias("top_share"),
        "second_decade",
        second_share.alias("second_share"),
        flag.alias("split_flag"),
    )


def mwu_drift_scores(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> DataFrame:
    """Binned two-sample Mann–Whitney U per group (group vs the REST of
    the table): the RANK-location drift test that completes the numeric
    drift family — KS sees the max CDF gap, EMD the transported mass,
    PSI/KL the density ratio; MWU answers the monitoring question those
    don't: "does this group's distribution sit systematically
    higher/lower than everything else, and is the shift bigger than
    chance?" with a significance scale (z) and an effect size
    (rank-biserial r) that are robust to outliers a mean-shift test
    chases.

    Exactness: U is computed from the binned counts with the standard
    midrank tie treatment — every element of the group beats all
    complement elements in LOWER bins and half the complement elements
    in ITS bin, so 2U = Σ_b b_b·(2·cumA_<b + a_b) is EXACT integer
    arithmetic (the ×2 absorbs the half-tie), accumulated in
    DECIMAL(38,0) (2U ≤ nA·nB ~ 10^24 at 10^12 rows — BIGINT dies at
    ~10^18, DuckDB's HUGEINT twin matches). The normal approximation
    uses the exact tie-corrected variance: Var U = nA·nB/12·[(n+1) −
    T/(n(n−1))], T = Σ(t³−t) over bins (t = the bin's TOTAL count —
    identical for every group, folded once from the global bin table).
    z and r are two trailing float expressions over those exact
    integers, rounded to 6dp.

    Scale shape: ONE groupBy(group, bin) scan (map-side combined,
    |groups|×n_bins rows), the global bin table folds from it and
    broadcasts back; windows run per group on the densified
    ≤n_bins-row frames. Same [lo, hi] fixed-grid contract as
    ks_drift_scores (edges from a prior stats pass; out-of-range
    clamps into the edge bins).
    """
    step = (hi - lo) / n_bins
    bucket = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / step).cast("long"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), bucket.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bins = df.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    grid = counts.select("grp").distinct().crossJoin(F.broadcast(bins))
    dense = grid.join(counts, ["grp", "bin"], "left").select(
        "grp", "bin", F.coalesce("n", F.lit(0)).alias("b")
    )
    gd = F.col("gn").cast("decimal(38,0)")
    glob = (
        dense.groupBy("bin")
        .agg(F.sum("b").alias("gn"))
        .select(
            "bin",
            "gn",
            (gd * F.col("gn") * F.col("gn") - gd).alias("_t3t"),
        )
    )
    j = dense.join(F.broadcast(glob), "bin").select(
        "grp", "bin", "b", (F.col("gn") - F.col("b")).alias("a")
    )
    w_before = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    terms = j.select(
        "grp",
        "b",
        "a",
        (
            F.col("b").cast("decimal(38,0)")
            * (
                2 * F.coalesce(F.sum("a").over(w_before), F.lit(0)) + F.col("a")
            ).cast("decimal(38,0)")
        ).alias("_2u"),
    )
    per = terms.groupBy("grp").agg(
        F.sum("b").alias("nb"),
        F.sum("a").alias("na"),
        F.sum("_2u").alias("two_u"),
    )
    tglob = glob.agg(F.sum("_t3t").alias("_T"))
    nA, nB = F.col("na").cast("double"), F.col("nb").cast("double")
    n = F.col("na") + F.col("nb")
    nd = n.cast("double")
    var_u = (
        nA
        * nB
        * ((nd + 1.0) - F.col("_T").cast("double") / (nd * (nd - 1.0)))
        / 12.0
    )
    num = F.col("two_u").cast("double") - nA * nB
    z = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0) & (var_u > 0),
        F.round(num / (2.0 * F.sqrt(var_u)), 6),
    )
    r = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        F.round(num / (nA * nB), 6),
    )
    return (
        per.crossJoin(F.broadcast(tglob))
        .select(
            F.col("grp").alias(group_col),
            F.col("nb").alias("n_group"),
            F.col("na").alias("n_rest"),
            "two_u",
            r.alias("r_rank_biserial"),
            z.alias("z"),
        )
    )


def median_ci(
    df: DataFrame,
    value: str,
    group: str,
    z: float = 1.96,
) -> DataFrame:
    """Exact order-statistic confidence band for the per-group median:
    the profile family reports "median = 212"; this answers "212 ± how
    much?" WITHOUT distributional assumptions — the binomial argument
    gives P(x_(l) <= true median <= x_(u)) ~ 95% for l/u set a
    z*sqrt(n)/2 ranks either side of n/2. Convention (documented, both
    engines identical): l = max(1, floor(n/2 - z*sqrt(n)/2)),
    u = min(n, ceil(n/2 + 1 + z*sqrt(n)/2)); bounds are the EXACT
    values at those ranks (order statistics, not interpolations), so
    every emitted number is a value that actually occurs in the data.
    The median itself uses the house interpolated-percentile contract.

    Scale shape: ONE sort-within-group window (row_number — the same
    cost any exact per-group percentile pays), ranks-of-interest join
    back from the bounded per-group (n, l, u) table; no global sort.
    Groups with n < 2 emit NULL bounds.
    """
    wr = Window.partitionBy(group).orderBy(F.col(value).asc())
    ranked = df.filter(F.col(value).isNotNull()).select(
        group, F.col(value).alias("_v"), F.row_number().over(wr).alias("_rn")
    )
    wg = Window.partitionBy(group)
    ranked = ranked.withColumn("_n", F.count(F.lit(1)).over(wg))
    nd = F.col("_n").cast("double")
    lo_rk = F.greatest(F.lit(1), F.floor(nd / 2 - z * F.sqrt(nd) / 2).cast("int"))
    hi_rk = F.least(F.col("_n"), F.ceil(nd / 2 + 1 + z * F.sqrt(nd) / 2).cast("int"))
    marked = ranked.select(
        group,
        "_v",
        "_rn",
        "_n",
        lo_rk.alias("_lo_rk"),
        hi_rk.alias("_hi_rk"),
    )
    agg = marked.groupBy(group).agg(
        F.max("_n").alias("n"),
        F.expr("percentile(_v, 0.5)").alias("_med"),
        F.max(F.when(F.col("_rn") == F.col("_lo_rk"), F.col("_v"))).alias("_lo"),
        F.max(F.when(F.col("_rn") == F.col("_hi_rk"), F.col("_v"))).alias("_hi"),
    )
    return agg.select(
        group,
        "n",
        F.round(F.col("_med").cast("double"), 6).alias("median"),
        F.when(F.col("n") >= 2, F.round(F.col("_lo").cast("double"), 6)).alias("ci_lo"),
        F.when(F.col("n") >= 2, F.round(F.col("_hi").cast("double"), 6)).alias("ci_hi"),
    )


def changepoint_day(
    df: DataFrame,
    ts_col: str = "ts",
    group: str = "event_type",
) -> DataFrame:
    """Single-changepoint estimate per group over the daily-count
    series: the split day k maximizing the between-segment sum-of-
    squares reduction (binary segmentation step 1) — CUSUM and the
    EWMA chart say WHETHER the level shifted; this names WHEN, the
    answer an incident review actually needs ("volume regime changed
    on the 14th" beats "drift detected"). For every candidate split
    the left/right SSEs are computed from prefix sums: SSE_total −
    (L²/n_l + R²/n_r − T²/n) collapses the argmax to exact BIGINT
    prefix arithmetic per day (counts and their squares), one IEEE
    division pair per candidate, rounded to 6dp before the argmax so
    the chosen day is deterministic cross-engine (ties → earliest
    day).

    Scale shape: events reduce to the bounded (group, day) table in one
    map-side-combined groupBy; prefix sums and the argmax are windows
    on that table. Groups with < 3 days emit NULL."""
    daily = (
        df.groupBy(F.col(group).alias("g"), F.to_date(ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wg = Window.partitionBy("g").orderBy("day")
    wall = Window.partitionBy("g")
    pre = daily.select(
        "g",
        "day",
        "n",
        F.sum("n").over(wg.rowsBetween(Window.unboundedPreceding, 0)).alias("cl"),
        F.row_number().over(wg).alias("i"),
        F.sum("n").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    nl = F.col("i").cast("double")
    nr = (F.col("m") - F.col("i")).cast("double")
    gain = F.round(
        (F.col("cl") * F.col("cl")).cast("double") / nl
        + ((F.col("tot") - F.col("cl")) * (F.col("tot") - F.col("cl"))).cast("double")
        / nr
        - (F.col("tot") * F.col("tot")).cast("double") / F.col("m"),
        6,
    )
    cand = pre.filter((F.col("i") < F.col("m")) & (F.col("m") >= 3)).select(
        "g", "day", gain.alias("gain")
    )
    wr = Window.partitionBy("g").orderBy(F.col("gain").desc(), F.col("day").asc())
    best = cand.withColumn("_rk", F.row_number().over(wr)).filter(F.col("_rk") == 1)
    return best.select(
        F.col("g").alias(group),
        F.col("day").alias("change_day"),
        F.col("gain").alias("sse_reduction"),
    )
